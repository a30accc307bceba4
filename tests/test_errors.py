"""Error-path behavior: failures must be loud, typed, and early (plan
time where possible) — silent empty results are how data bugs ship."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException

from usedcars_bigdata_spark.sources import load_table


def test_missing_sf_dir_fails_at_plan_time(spark):
    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf_nope", "orders").schema


def test_unknown_table_raises_keyerror(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nosuch")


def test_unknown_query_name_is_keyerror():
    from usedcars_bigdata_spark.plans import QUERIES

    with pytest.raises(KeyError):
        QUERIES["definitely_not_registered"]


def test_nonconvergent_components_raise(spark):
    # re-assert the loud-failure contract at the suite level: a long
    # chain with max_iters=1 must RAISE, never return split components
    from pyspark.sql import functions as F

    from usedcars_bigdata_spark.ext.dedup import connected_components

    ids = spark.range(6).select(F.col("id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ids, pairs, "id", max_iters=1).collect()


def test_scd2_unknown_column_fails_fast(spark):
    import datetime as dt

    from pyspark.errors import AnalysisException as AE

    from usedcars_bigdata_spark.operators.joins import scd2_merge

    dim = spark.createDataFrame(
        [(1, "a", dt.date(2020, 1, 1), None, True)],
        "k long, seg string, valid_from date, valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame([(1, "b", dt.date(2021, 1, 1))], "k long, seg string, eff date")
    with pytest.raises(AE):
        scd2_merge(dim, upd, ["k"], ["not_a_column"], "eff").collect()
