"""Sort / limit / top-k operators (SURVEY.md §2.6, O1-O5).

``orderBy().limit(k)`` fuses into TakeOrderedAndProject (no full sort
materialization) — the scalable replacement for the reference's RDD
``sortBy().take(k)`` cosine top-k (recomendation-system.py:168-170).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered(df: DataFrame, cols: Sequence[Column | str], ascending: bool = True) -> DataFrame:
    """O1/O2: global sort (range-partitioned exchange)."""
    if ascending:
        return df.orderBy(*cols)
    return df.orderBy(*[F.col(c).desc() if isinstance(c, str) else c.desc() for c in cols])


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O3/O4: sort+limit → TakeOrderedAndProject. Include a unique tie-break
    column in ``order_by`` for a deterministic row set."""
    return df.orderBy(*order_by).limit(k)
