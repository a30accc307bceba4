"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB on row multiset + columns; rows-only queries must
at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import assert_df_matches_oracle
from usedcars_bigdata_spark.plans import ORACLES, QUERIES

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(autouse=True)
def _drain_hubs(spark):
    """Per-entry cache hygiene for the longest-lived harness (r9): the
    two-pass window operators and plan-level hubs persist() frames the
    CacheManager holds for the life of the JVM — a 408-entry pytest
    session would accumulate them into the storage region (the r7
    heap-pressure failure mode). bench.py and driver_sim drain per
    entry; this fixture gives the full-registry sweep the same
    protocol."""
    yield
    from usedcars_bigdata_spark.operators.window import release_hubs

    release_hubs()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name} produced no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
