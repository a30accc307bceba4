"""Named-query registry backing the driver contract (__spark_entry__.py).

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered with an
optional DuckDB oracle SQL string. Conventions that make the driver's
order-insensitive value-hash comparison work (see /root/repo/TESTDATA.md):

- every computed column is aliased identically in Spark and SQL;
- floating-point outputs are rounded in-query (both sides) so parallel
  (Spark) vs sequential (DuckDB) summation order cannot flip the hash;
- any top-k / row_number ordering carries a unique tie-break key so the
  selected row *set* is deterministic;
- DuckDB integer sums are cast to BIGINT (DuckDB widens sum(int) to
  HUGEINT, which would break schema comparison).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` → driver does rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # A silent overwrite once shadowed a gated query with a stale
            # duplicate (round-5 append of ext_embedding_outliers); fail loud.
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
