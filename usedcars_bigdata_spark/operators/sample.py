"""Sampling / splitting operators (SURVEY.md §2.9, R1-R4)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """R1/R2: seeded Bernoulli sample (performance_py/2-cores-6-instances.py:87).
    Row count is binomial around fraction*n — tests assert bounds, not
    equality."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def random_split(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """R3: always-seeded split. The reference's unseeded 80/20 split
    (price-prediction.py:195) makes its own results unreproducible; our
    engine requires a seed."""
    return df.randomSplit(weights, seed=seed)


def estimate_size_mb(df: DataFrame, sample_rows: int = 10_000) -> float:
    """R4 scalable rewrite of the reference's full-materialization size probe
    (`df.rdd.map(len(str(row))).sum()`, performance_py/2-cores-6-instances.py:83
    — ships every row through Python). We probe ``sample_rows`` rows for an
    average serialized width and multiply by count(): two cheap jobs, O(sample)
    Python traffic."""
    n = df.count()
    if n == 0:
        return 0.0
    k = min(sample_rows, n)
    head = df.limit(k).collect()
    avg = sum(len(str(r)) for r in head) / k
    return n * avg / (1024 * 1024)


def estimate_size_mb_exact(df: DataFrame) -> float:
    """R4 parity form (full scan through Python; anti-pattern at scale)."""
    return df.rdd.map(lambda row: len(str(row))).sum() / (1024 * 1024)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): the training-mix
    primitive — e.g. keep 100% of rare high-quality strata and 5% of the
    dominant one. Map-side filter, no shuffle; strata absent from
    ``fractions`` are dropped (fraction 0.0). Always seeded: reruns and
    retried tasks must sample identically."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    total_n: int,
    ndigits: int = 6,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a total budget,
    each stratum gets n_h ∝ N_h·S_h (population size × within-stratum
    standard deviation) — the allocation minimizing the variance of the
    stratified mean estimator (Neyman 1934). The design step a sampling
    pipeline runs BEFORE drawing: proportional allocation oversamples
    homogeneous strata; this spends budget where the variance is.

    One map-side-combinable aggregate collapses the table to per-stratum
    integer moments (n, Σv, Σv²); S_h, weights, and the rounded
    allocation are arithmetic on the strata-cardinality table (population
    SD from exact moments — the only doubles are final divisions).

    NULL values are excluded from BOTH the count and the moments (the
    r8 form counted every row but summed only non-NULLs, deflating the
    variance of NULL-bearing strata); an all-constant input (every
    stratum zero-variance, total weight 0) emits NULL weights/allocs
    rather than an ANSI divide-by-zero (r9 review).

    Output: (stratum, n_stratum, std, weight, alloc)."""
    from pyspark.sql import functions as F

    m = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_stratum"),
            F.sum(F.col(value_col)).alias("__s"),
            F.sum(F.col(value_col) * F.col(value_col)).alias("__ss"),
        )
    )
    var = (F.col("__ss") - F.col("__s") * 1.0 * F.col("__s") / F.col("n_stratum")) / F.col(
        "n_stratum"
    )
    m = m.withColumn("__sd", F.sqrt(F.greatest(var, F.lit(0.0))))
    m = m.withColumn("__w", F.col("n_stratum") * F.col("__sd"))
    tot = m.agg(F.sum("__w").alias("__wt"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_stratum",
            F.round("__sd", ndigits).alias("std"),
            F.round(
                F.when(F.col("__wt") > 0, F.col("__w") / F.col("__wt")),
                ndigits,
            ).alias("weight"),
            F.round(
                F.when(
                    F.col("__wt") > 0,
                    F.lit(total_n) * F.col("__w") / F.col("__wt"),
                ),
                0,
            )
            .cast("long")
            .alias("alloc"),
        )
    )
