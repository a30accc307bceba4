"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's named-query library (usedcars_bigdata_spark.plans):
- ``entry(spark)``  — flagship query smoke check on sf0.001.
- ``queries()``     — every implemented operator/query from SURVEY.md §2
                      plus the ext/ training-data-pipeline operators.
- ``oracle_sql()``  — matching DuckDB SQL for the hash-comparable subset;
                      hash-incomparable ops (engine-specific hashes, seeded
                      sampling) are rows-only by design and property-tested
                      in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from usedcars_bigdata_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary shape) on sf0.001."""
    return QUERIES["rel_tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
