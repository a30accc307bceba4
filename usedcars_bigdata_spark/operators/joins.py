"""Join operators (SURVEY.md §2.3).

The reference has zero joins — it collects scalars to the driver instead
(data-understanding.py:229-232). Our engine makes joins first-class because
every scalable rewrite of those patterns (percent-of-total, similarity,
enrichment) is a join, and the harness star schema requires them.

Strategy guidance (100 TB): dimension tables (region/nation/part/supplier)
→ ``broadcast`` (no shuffle of the fact side); fact-fact joins → let AQE
pick sort-merge vs shuffled-hash and handle skew; repeated joins on one key
→ pre-``repartition`` or bucket both sides on that key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint — removes the
    shuffle of the (large) fact side entirely."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_facts(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Large-large join: shuffle on the key; AQE (enabled in session.py)
    coalesces partitions and splits skewed ones at runtime."""
    return left.join(right, on=on, how=how)


def semi(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS: rows of left with a match — right side never widens the row."""
    return left.join(right, on=on, how="left_semi")


def anti(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of left without a match."""
    return left.join(right, on=on, how="left_anti")
