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
