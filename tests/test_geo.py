"""Geospatial operators: haversine correctness, grid-prune completeness
(the candidate neighborhood must never lose a true within-radius point),
and density ranking determinism."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from usedcars_bigdata_spark.operators.geo import (
    grid_density,
    haversine_km,
    radius_join,
    synth_coords,
)


def _brute_haversine(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_haversine_known_distance(spark):
    # NYC (40.7128, -74.0060) to London (51.5074, -0.1278): ~5570 km
    df = spark.createDataFrame([(40.7128, -74.0060, 51.5074, -0.1278)],
                               ["a", "b", "c", "d"])
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert abs(km - 5570.2) < 5.0
    assert abs(km - _brute_haversine(40.7128, -74.0060, 51.5074, -0.1278)) < 1e-9


def test_radius_join_matches_bruteforce_including_cell_boundaries(spark):
    """Adversarial points sprinkled near cell boundaries and at high
    latitude (where longitude degrees shrink): the grid-pruned join
    must equal the O(n*q) brute force exactly."""
    rng = random.Random(11)
    qs = [(1, 59.9, 10.7), (2, 0.0, 0.0), (3, -45.0, 179.5)]
    pts = []
    for i in range(800):
        qid, qlat, qlon = qs[i % 3]
        # cluster around the query, out to ~2x the radius
        pts.append((i, qlat + rng.uniform(-9, 9), qlon + rng.uniform(-18, 18)))
    df = spark.createDataFrame(pts, ["id", "lat", "lon"])
    got = {
        r.query_id: (r.n_within, r.avg_km)
        for r in radius_join(df, qs, radius_km=500.0).collect()
    }
    want = {}
    for qid, qlat, qlon in qs:
        ds = [
            _brute_haversine(qlat, qlon, lat, lon)
            for _, lat, lon in pts
            if _brute_haversine(qlat, qlon, lat, lon) <= 500.0
        ]
        if ds:
            want[qid] = (len(ds), round(sum(ds) / len(ds), 4))
    assert set(got) == set(want)
    for qid in want:
        assert got[qid][0] == want[qid][0], qid
        assert abs(got[qid][1] - want[qid][1]) < 1e-3, qid


def test_radius_join_wraps_antimeridian(spark):
    """A query at lon +179.8 must count points on the far side expressed
    as NEGATIVE longitude (-179.9 is ~33 km away): the candidate column
    wraps modulo 360/deg, matching grid_cell's pmod encoding. Before the
    wrap fix these points were silently dropped (candidate cols ran past
    +180 while the point landed at col -180)."""
    pts = [
        (0, 0.0, -179.9),   # ~11 km west of the antimeridian
        (1, 0.0, 179.9),    # ~11 km east
        (2, 0.0, -179.0),   # ~111+89 km... within 500 km
        (3, 0.0, 170.0),    # ~1,090 km: outside
        (4, 0.0, -170.0),   # ~1,130 km: outside
    ]
    df = spark.createDataFrame(pts, ["id", "lat", "lon"])
    qs = [(1, 0.0, 179.8)]
    out = radius_join(df, qs, radius_km=500.0).collect()
    assert len(out) == 1
    want = [
        _brute_haversine(0.0, 179.8, lat, lon)
        for _, lat, lon in pts
        if _brute_haversine(0.0, 179.8, lat, lon) <= 500.0
    ]
    assert out[0].n_within == len(want) == 3
    assert abs(out[0].avg_km - round(sum(want) / len(want), 4)) < 1e-3


def test_haversine_antipodal_not_nan(spark):
    """Near-antipodal pairs: floating rounding can push the haversine `a`
    term above 1, where asin(sqrt(a)) is NaN; the clamp returns the
    ~half-circumference distance instead."""
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 180.0), (45.0, 10.0, -45.0, -170.0)],
        ["a", "b", "c", "d"],
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()
    for r in got:
        assert not math.isnan(r.km)
        assert abs(r.km - math.pi * 6371.0) < 1.0


def test_grid_density_rank_deterministic(spark, sf_dir):
    from usedcars_bigdata_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    out = grid_density(synth_coords(cust, "c_custkey"), top_k=20).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    ns = [r.n_points for r in out]
    assert ns == sorted(ns, reverse=True)
    # ties broken by cell ascending
    for a, b in zip(out, out[1:]):
        if a.n_points == b.n_points:
            assert a.cell < b.cell


def test_synth_coords_in_bounds_and_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    a = {r.k: (r.lat, r.lon) for r in synth_coords(df, "k").collect()}
    b = {r.k: (r.lat, r.lon) for r in synth_coords(df, "k").collect()}
    assert a == b
    for lat, lon in a.values():
        assert -60.0 <= lat < 60.0 and -180.0 <= lon < 180.0
