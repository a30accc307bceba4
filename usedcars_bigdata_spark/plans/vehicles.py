"""Driver-contract entries for the reference-domain pipelines, running on
the deterministic synthetic vehicles fixture (fixtures.py — generated
in-plan; the harness star schema has no vehicles table, and the fixture's
xxhash64 streams aren't reproducible in DuckDB, so these are rows-only;
semantics are covered by tests/test_reference_pipelines.py including
UDF-vs-native parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fixtures import vehicles_fixture_stringified
from ..pipelines import cleaning, recommend, understanding
from .registry import query

_N = 2000


def _vehicles(spark: SparkSession) -> DataFrame:
    return vehicles_fixture_stringified(spark, _N)


@query("veh_manufacturer_stats")
def veh_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q1 on the vehicles domain (data-understanding.py:75-81)."""
    return understanding.manufacturer_stats(_vehicles(spark))


@query("veh_state_median")
def veh_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q2 (data-understanding.py:202-214), exact-median variant."""
    return understanding.state_median_stats(_vehicles(spark))


@query("veh_salvage_pct")
def veh_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q3 (data-understanding.py:241-254), window form."""
    return understanding.salvage_pct_by_state(_vehicles(spark))


@query("veh_dealer_categories")
def veh_dealer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 as native expressions (data-understanding.py:131-150)."""
    return understanding.dealer_category_counts(_vehicles(spark))


@query("veh_clean_summary")
def veh_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cleaning chain → typed describe (data-viz&cleaning.py:69-386)."""
    return cleaning.price_distribution_stats(cleaning.clean_vehicles(_vehicles(spark)))


@query("veh_recommend")
def veh_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end recommendation (recomendation-system.py:142-183)."""
    veh = _vehicles(spark)
    qid = 7_200_000_000 + 4  # deterministic fixture id
    return recommend.recommend_similar(veh, qid, k=5)
