"""Sort / limit / top-k operators (SURVEY.md §2.6, O1-O5).

``orderBy().limit(k)`` fuses into TakeOrderedAndProject (no full sort
materialization) — the scalable replacement for the reference's RDD
``sortBy().take(k)`` cosine top-k (recomendation-system.py:168-170).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    n_salts: int = 32,
    salt_on: str | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Skyline (Pareto frontier) over two criteria: keep every row not
    DOMINATED by another — q dominates p iff q.minimize <= p.minimize AND
    q.maximize >= p.maximize with at least one strict. The multi-objective
    top-k ("cheapest for its size class") that no single sort expresses.

    The naive form is an O(N²) NOT EXISTS self-join; a single-window form
    (running max over a global price ordering) is O(N log N) but funnels
    the whole table through ONE window partition. This is the two-phase
    split that survives a 100 TB input:

    1. LOCAL prune: the same dominance test windowed inside ``n_salts``
       hash-salt partitions. Dominance within a subset implies dominance
       in the full set, so pruning is safe — and on real distributions
       the local skylines are tiny (frontier size grows ~log N for
       independent dims), so survivors collapse by orders of magnitude.
    2. GLOBAL pass: the identical window over the pooled survivors — now
       frontier-sized, not data-sized.

    Within a partition the dominance test is two window functions over one
    sort: a row is dominated iff max(maximize) over strictly-smaller
    minimize values >= its maximize (strict-minimize dominance), or
    max(maximize) within its exact minimize value > its maximize
    (tie-on-minimize dominance). Duplicated (min, max) points are NOT
    dominated by each other (no strict coordinate) and all survive —
    matching the NOT EXISTS semantics an oracle replays.

    With ``group_cols`` the frontier is computed independently PER GROUP
    (dominance never crosses a group boundary) — "best price/size
    tradeoffs within each product type". The salt then subdivides each
    group, so a single mega-group still cannot pin the window to one
    task.

    Output: the input rows on the frontier, original schema."""
    g = list(group_cols)
    mn, mx = F.col(minimize_col), F.col(maximize_col)

    def survivors(d: DataFrame, part_cols: list[str]) -> DataFrame:
        part_cols = g + part_cols
        w = Window.partitionBy(*part_cols).orderBy(mn.asc()) if part_cols else (
            Window.orderBy(mn.asc())
        )
        strictly_cheaper = w.rangeBetween(Window.unboundedPreceding, -1)
        same_cost = (
            Window.partitionBy(*(part_cols + [minimize_col]))
            if part_cols
            else Window.partitionBy(minimize_col)
        )
        best_cheaper = F.max(mx).over(strictly_cheaper)
        best_tie = F.max(mx).over(
            same_cost.orderBy(mn.asc()).rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        dominated = (
            best_cheaper.isNotNull() & (best_cheaper >= mx)
        ) | (best_tie > mx)
        return d.withColumn("__dom", dominated).filter(~F.col("__dom")).drop("__dom")

    salt_src = F.col(salt_on) if salt_on else mn
    local = survivors(
        df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts))),
        ["__salt"],
    ).drop("__salt")
    return survivors(local, [])
