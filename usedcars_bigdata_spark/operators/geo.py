"""Geospatial operators: integer grid bucketing and grid-pruned radius
joins (beyond-reference extension — the reference's vehicles table carries
lat/long columns it never analyzes; SURVEY.md §1.2).

The scale pattern is the classic two-stage spatial join: bucket points
into an integer degree grid (one cheap projection), join candidates on
the grid cell against the BROADCAST neighborhood of the query side, and
refine with exact haversine only inside candidate cells — the same
prune-then-verify shape as the LSH/IVF tiers, so cost tracks candidate
density, never |points| x |queries|. A production deployment swaps the
1-degree grid for an H3/S2 index; the plan shape is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def _ncols(deg: float) -> int:
    """Number of longitude columns at ``deg`` resolution (360/deg)."""
    return int(round(360.0 / deg))


def grid_cell(lat: Column, lon: Column, deg: float = 1.0) -> Column:
    """Integer grid cell id for a (lat, lon) pair at ``deg`` resolution:
    cell = floor(lat/deg) * 721 + pmod(floor(lon/deg), 360/deg). The
    longitude column WRAPS modulo 360/deg so cells are antimeridian-
    consistent (a candidate neighborhood crossing lon ±180 lands on the
    same ids as the points there), and the wrapped col < 720 < 721
    keeps cells unique for deg >= 0.5. Pure arithmetic — stays in
    whole-stage codegen."""
    row = F.floor(lat / deg)
    col = F.pmod(F.floor(lon / deg).cast("long"), F.lit(_ncols(deg)))
    return (row.cast("long") * 721 + col).alias("cell")


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; identical IEEE expression
    replays in DuckDB for the oracle). ``a`` is clamped to 1.0: for
    near-antipodal pairs floating rounding can push it a hair above 1,
    where asin(sqrt(a)) would return NaN and silently fail any
    ``<= radius`` filter instead of returning ~half-circumference. The
    clamp only fires at ~20,015 km, far beyond any radius filter, so
    unclamped oracles stay value-identical on filtered outputs."""
    rl1 = F.radians(lat1)
    rl2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def synth_coords(df: DataFrame, key_col: str, lat_span=(-60.0, 60.0)) -> DataFrame:
    """Deterministic synthetic coordinates from a key column via the
    md5-uniform idiom (rel_dp_noisy_counts precedent): u in [0,1) from
    the first 8 md5 hex chars of a salted key, mapped into the lat/lon
    spans. Exactly replayable in DuckDB, which is the point — the geo
    entries certify the JOIN/REFINE machinery, not a data source."""

    def unif(salt: str) -> Column:
        h = F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        )
        return (F.conv(h, 16, 10).cast("long") + 0.5) / F.lit(4294967296.0)

    lo, hi = lat_span
    return df.withColumn("lat", lo + (hi - lo) * unif("geo-lat:")).withColumn(
        "lon", -180.0 + 360.0 * unif("geo-lon:")
    )


def grid_density(
    points: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
    deg: float = 1.0, top_k: int = 20,
) -> DataFrame:
    """Top-k densest grid cells: one map-side-combinable count per cell,
    ranked by (n DESC, cell ASC). The cell table is grid-cardinality-
    sized; nothing point-sized survives the first aggregate.

    Output: (rank, cell, n_points)."""
    from pyspark.sql import Window

    counts = points.select(
        grid_cell(F.col(lat_col), F.col(lon_col), deg)
    ).groupBy("cell").agg(F.count(F.lit(1)).alias("n_points"))
    w = Window.orderBy(F.col("n_points").desc(), F.col("cell").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "cell", "n_points")
    )


def radius_join(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    deg: float = 1.0,
    ndigits: int = 4,
) -> DataFrame:
    """Aggregate radius join: for each (query_id, lat, lon) reference
    point, count the points within ``radius_km`` and their mean
    distance. Stage 1 PRUNES by grid: the query side expands
    driver-side into its candidate cell neighborhood (a few hundred
    rows per query — radius/111km cells per axis, widened by 1/cos(lat)
    in longitude) and BROADCASTS; points join on their single cell.
    Stage 2 REFINES candidates with exact haversine. The big side never
    shuffles — one scan, one broadcast hash join, one combinable
    aggregate.

    Output: (query_id, n_within, avg_km)."""
    spark = points.sparkSession
    ncols = _ncols(deg)
    cell_set: set[tuple[int, float, float, int]] = set()
    for qid, qlat, qlon in queries:
        span = int(math.ceil(radius_km / 111.0 / deg))
        lon_stretch = max(
            1, int(math.ceil(span / max(0.1, math.cos(math.radians(qlat)))))
        )
        # Near the poles 1/cos(lat) explodes past the full circle; cap at
        # half the columns (the wrap below makes a wider sweep redundant).
        lon_stretch = min(lon_stretch, ncols // 2)
        for dr in range(-span - 1, span + 2):
            for dc in range(-lon_stretch - 1, lon_stretch + 2):
                row = math.floor(qlat / deg) + dr
                # Wrap modulo 360/deg so neighborhoods crossing lon ±180
                # land on the far side's cells; the set dedupes collisions
                # (a full-circle sweep, or wrap hitting the same cell twice)
                # so no candidate cell double-counts a point.
                col = (math.floor(qlon / deg) + dc) % ncols
                cell_set.add((qid, float(qlat), float(qlon), row * 721 + col))
    cand = spark.createDataFrame(
        sorted(cell_set), "query_id long, qlat double, qlon double, cell long"
    )
    pts = points.select(
        F.col(lat_col).alias("plat"),
        F.col(lon_col).alias("plon"),
        grid_cell(F.col(lat_col), F.col(lon_col), deg),
    )
    dist = haversine_km(F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon"))
    return (
        pts.join(F.broadcast(cand), "cell")
        .withColumn("__d", dist)
        .filter(F.col("__d") <= radius_km)
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.round(F.avg("__d"), ndigits).alias("avg_km"),
        )
    )
