"""Rank-based statistics: Spearman rank correlation, the Mann-Whitney U
test, Kendall's tau-b, and a cluster-level permutation test (beyond-
reference extension; SURVEY.md §2.13 — the reference's stats surface stops
at Pearson/skewness, `notebook_to_py/data-viz&cleaning.py:141-196`-style moments).

Design rules shared by every operator here (the ts_bootstrap_ci /
ml_roc_auc precedents):

- All rank sums, tie counts, and pair counts ride EXACT integer
  arithmetic (doubled average ranks ``2·r = 2·rank() + ties − 1`` stay
  integral), so the only floating-point work is the final closed-form
  statistic — both engines evaluate the same scalar expression on
  bit-identical inputs, which is what makes the entries hash-oracle
  checkable rather than rows-only.
- Overflow discipline (ANSI mode THROWS on int64 overflow): products of
  two rank-scale bigints stay < 2^63 for any per-group n ≤ ~2^20; the
  n·S cross terms in the closed forms go DOUBLE before multiplying.
- Ranks need a per-group sort (one shuffle on the group key). The GLOBAL
  (ungrouped) ranks — mann_whitney_u, kruskal_wallis — run the two-pass
  distributed form (global_doubled_midrank_map: distinct-value rank map +
  equi-join, r8) instead of an unpartitioned window; per-group ranks keep
  the window (the group key already distributes them). Closed forms are
  unchanged either way since they only consume the moment table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column


def global_doubled_midrank_map(
    df: DataFrame, value_col: str, n_buckets: int = 32
) -> DataFrame:
    """Distributed GLOBAL doubled midrank as a per-value map — the
    two-pass upgrade this module's header names for the unpartitioned
    rank window (which funnels the whole frame through ONE partition at
    scale). The midrank of a value depends only on the value:

        2·midrank(v) = 2·cnt_less(v) + t(v) + 1

    so rank the DISTINCT-VALUE table instead of the rows: one
    map-side-combinable groupBy builds (v, t); a range exchange buckets
    the distinct values; the in-bucket prefix sums run under a window
    PARTITIONED by bucket; and only the n_buckets-row offset table
    crosses a SinglePartition exchange. Equal values can never split
    across buckets (the range partitioner is a pure function of the
    key), so tie groups stay whole and the emitted doubled midranks are
    bit-identical to the window form — callers join the map back on the
    value and keep their closed forms and oracles unchanged.

    The returned map is eagerly checkpointed: every caller both joins
    it back AND aggregates its tie moments, and without the cut each
    consumer would re-run the corpus groupBy + range exchange. It is
    distinct-value-bounded — never row-bounded — and unlike persist()
    the localCheckpoint blocks are GC-released once the caller drops
    the returned frame (ContextCleaner), so there is no registry to
    drain here (contrast window.release_hubs).

    NULL policy: NULL observations are DROPPED before ranking (r9).
    Rank statistics have no defined rank for a missing value, and the
    plain equi-join every consumer uses to attach the map would drop
    NULL rows anyway — while a NULL tie group would still have landed
    in the map (groupBy keeps a NULL key) and poisoned the Σ(t³−t)
    moment. Filtering here keeps n, rank sums, and tie corrections
    consistent on NULL-bearing inputs; callers that want a sentinel
    rank for NULLs must encode it as a value first.

    Output: one row per distinct non-NULL value — (value_col, t, r2)
    with t = tie count and r2 = 2·midrank."""
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("t"))
    )
    b = vc.repartitionByRange(n_buckets, F.col(value_col)).withColumn(
        "__b", F.spark_partition_id()
    )
    wb = Window.partitionBy("__b").orderBy(value_col)
    loc = b.withColumn("__less_in", F.sum("t").over(wb) - F.col("t"))
    offs = loc.groupBy("__b").agg(F.sum("t").alias("__bt"))
    wo = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = offs.withColumn(
        "__off", F.coalesce(F.sum("__bt").over(wo), F.lit(0))
    ).drop("__bt")
    return (
        loc.join(F.broadcast(offs), "__b")
        .select(
            value_col,
            "t",
            (
                2 * (F.col("__off") + F.col("__less_in")) + F.col("t") + 1
            ).cast("bigint").alias("r2"),
        )
        .localCheckpoint(eager=True)
    )


def _doubled_avg_rank(part_cols: list[str], order_col: str) -> Column:
    """2× the average (midrank) of ``order_col`` within ``part_cols``:
    ``2·rank() + count(ties) − 1`` — integral, so tie-averaged ranks stay
    in exact bigint arithmetic (avg rank itself is a *.5 fraction)."""
    wr = Window.partitionBy(*part_cols).orderBy(F.col(order_col).asc())
    wt = Window.partitionBy(*part_cols, order_col)
    return (
        2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - F.lit(1)
    ).cast("bigint")


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation with midrank tie handling:
    Pearson over the doubled average ranks (the factor 2 cancels in the
    correlation). Moments ``Σr, Σr², Σr_x·r_y`` are exact bigints
    (r ≤ 2n ⇒ the product sum is < 4n³ < 2^63 for n ≤ 10^6 per group);
    the closed form runs in doubles AFTER casting, so ``n·S_xy`` cannot
    overflow. Two rank windows + one moment aggregate — the group sort
    is the only data-sized shuffle.

    Output: (group, n, rho) with rho rounded."""
    g = "group"
    ranked = df.select(
        F.col(group_col).alias(g),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    ranked = ranked.select(
        g,
        _doubled_avg_rank([g], "x").alias("rx"),
        _doubled_avg_rank([g], "y").alias("ry"),
    )
    m = ranked.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den2 = (nd * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        nd * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # singleton or constant-rank group: rho undefined -> NULL, not an
    # ANSI divide-by-zero that fails every other group (r9 review; the
    # rolling_corr_hourly / ml.eval convention)
    rho = F.when(den2 > 0, num / F.sqrt(den2))
    return m.select(
        F.col(g).alias(group_col),
        "n",
        (F.round(rho, ndigits) + 0.0).alias("rho"),
    )


def mann_whitney_u(
    df: DataFrame,
    sample_col: str,
    value_col: str,
    sample_a: str,
    sample_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test comparing ``value_col``
    between two samples, with midranks and the full tie-corrected normal
    approximation:

        U_a = R_a − n_a(n_a+1)/2
        σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))
        z  = (U_a − n_a·n_b/2) / σ

    The doubled rank sum 2·R_a, the tie moment Σ(t³−t), and all counts
    are exact bigints; t³ goes double-safe because the per-value tie
    group t ≤ N ≤ 2^20 here (t³ < 2^60). Ranks come from the
    distributed per-value midrank map (global_doubled_midrank_map) +
    one equi-join — no unpartitioned window anywhere in the plan.

    Output: one row (n_a, n_b, u_a, z)."""
    both = df.filter(F.col(sample_col).isin([sample_a, sample_b])).select(
        (F.col(sample_col) == sample_a).cast("int").alias("is_a"),
        F.col(value_col).alias("v"),
    )
    # Distributed global midrank (r8): the per-value rank map replaces
    # the unpartitioned window that funneled the pooled sample through
    # one partition — identical r2/t values, so the closed form and the
    # oracle are untouched.
    rank_map = global_doubled_midrank_map(both, "v")
    ranked = both.join(rank_map.select("v", "r2"), "v")
    tie_m = rank_map.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3")
    )
    m = ranked.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
        F.sum(F.col("is_a") * F.col("r2")).alias("r2_a"),
    )
    j = m.crossJoin(F.broadcast(tie_m))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    # U_a from the doubled rank sum: U_a = R_a − n_a(n_a+1)/2 = (2R_a −
    # n_a(n_a+1)) / 2 — numerator even by construction, exact in doubles
    # (rank sums < n² ≤ 2^40 at harness scale).
    u_a = (F.col("r2_a").cast("double") - na * (na + 1)) / 2.0
    var = na * nb / 12.0 * ((n + 1) - F.col("tie3").cast("double") / (n * (n - 1)))
    # empty sample / N=1 / all-tied pool: z undefined -> NULL (nested
    # CASE keeps the inner var expression, which divides by n(n-1),
    # unevaluated when N<=1 — ANSI throws on 0 denominators; r9 review)
    z = F.when(
        (na > 0) & (nb > 0) & (n > 1),
        F.when(var > 0, (u_a - na * nb / 2.0) / F.sqrt(var)),
    )
    return j.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        (F.round(z, ndigits) + 0.0).alias("z"),
    )


def kendall_tau_b(
    series: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Per-key Kendall tau-b between two aligned series columns, by
    explicit pair enumeration:

        τ_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
        n0 = n(n−1)/2,  n1/n2 = Σ t(t−1)/2 over x/y tie groups.

    The self-join on the key with ``t1 < t2`` emits exactly the n0 pairs
    per key — Σ_k n_k² total work, the honest O(n²)-per-group cost of
    exact Kendall (the theil_sen_trend precedent). Intended for
    POST-AGGREGATION series (keys × buckets), where n_k is hundreds to
    thousands, never raw events; the O(n log n) merge-sort-inversion
    form is the named upgrade for long series. C, D, and tie counts are
    exact bigints; only τ's final quotient is floating.

    Output: (key, n, concordant, discordant, tau_b)."""
    s = series.select(
        F.col(key_col).alias("k"),
        F.col(t_col).alias("t"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.t") < F.col("b.t")))
    sx = F.signum((F.col("b.x") - F.col("a.x")).cast("double"))
    sy = F.signum((F.col("b.y") - F.col("a.y")).cast("double"))
    pm = pairs.groupBy(F.col("a.k").alias("key")).agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((sx * sy > 0).cast("bigint")).alias("c"),
        F.sum((sx * sy < 0).cast("bigint")).alias("d"),
        F.sum((sx == 0).cast("bigint")).alias("tx"),
        F.sum((sy == 0).cast("bigint")).alias("ty"),
    )
    nn = s.groupBy("k").agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("k", "key")
    out = pm.join(nn, "key")
    n0 = F.col("n0").cast("double")
    # all-tied x (or y) within a key: the tau-b normalizer is 0 -> NULL
    # for that key instead of an ANSI crash for the whole frame
    tau_den2 = (n0 - F.col("tx").cast("double")) * (
        n0 - F.col("ty").cast("double")
    )
    tau = F.when(
        tau_den2 > 0,
        (F.col("c") - F.col("d")).cast("double") / F.sqrt(tau_den2),
    )
    return out.select(
        "key",
        "n",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        (F.round(tau, ndigits) + 0.0).alias("tau_b"),
    )


def permutation_test_means(
    units: DataFrame,
    unit_col: str,
    value_col: str,
    variant_col: str,
    n_permutations: int = 200,
    scale: float = 1.0,
    ndigits: int = 6,
) -> DataFrame:
    """Cluster-level (unit-level) permutation test for a difference in
    mean ``value_col`` between variant 1 and variant 0, EXACTLY
    deterministic: permuted assignments come from md5-uniforms keyed by
    (permutation, unit) — the bootstrap_ci_cents idiom — so both engines
    replay the identical B reassignments. Input is the PER-UNIT
    aggregate table (one row per user/cluster), which is the
    statistically sound unit of reassignment under within-unit
    correlation AND what bounds the replicate axis at B × |units| rows,
    not B × |events|. The observed statistic and every replicate
    statistic derive from exact integer value sums; the two-sided
    p-value counts |T_b| ≥ |T_obs| on doubles computed by the same
    expression in both engines (bit-identical inputs ⇒ a safe
    comparison).

    Output: one row (n_units, t_obs, p_value)."""
    u = units.select(
        F.col(unit_col).cast("string").alias("unit"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(variant_col).cast("int").alias("g"),
    ).localCheckpoint(eager=True)

    def diff_of_means(df: DataFrame, group_cols: list[str]) -> DataFrame:
        agg = df.groupBy(*group_cols).agg(
            F.sum(F.col("g") * F.col("v")).cast("double").alias("s1"),
            F.sum(F.col("g")).cast("double").alias("n1"),
            F.sum((1 - F.col("g")) * F.col("v")).cast("double").alias("s0"),
            F.sum(1 - F.col("g")).cast("double").alias("n0"),
        )
        # a replicate (or the observed split) with every unit on one
        # side has no defined difference-of-means: t = NULL instead of
        # an ANSI 0.0-division that kills all B replicates (r9 review).
        # NULL replicates count as non-extreme in the p-value — at
        # B·2^(1-|units|) expected occurrences this is a conservative,
        # documented bias, not a crash.
        return agg.withColumn(
            "t",
            F.when(
                (F.col("n1") > 0) & (F.col("n0") > 0),
                F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0"),
            ),
        )

    obs = diff_of_means(u, []).select(
        F.col("t").alias("t_obs"),
        (F.col("n1") + F.col("n0")).cast("bigint").alias("n_units"),
    )
    b_axis = u.sparkSession.range(n_permutations).select(
        F.col("id").cast("int").alias("b")
    )
    # |units| × B expansion via broadcast of the B axis; the md5 uniform
    # reassigns each unit per replicate.
    h = F.substring(
        F.md5(F.concat_ws(":", F.lit("perm"), F.col("b"), F.col("unit"))), 1, 8
    )
    uni = (F.conv(h, 16, 10).cast("long") + 0.5) / F.lit(4294967296.0)
    reps = (
        u.crossJoin(F.broadcast(b_axis))
        .withColumn("g", (uni < 0.5).cast("int"))
        .transform(lambda d: diff_of_means(d, ["b"]))
    )
    cnt = reps.crossJoin(F.broadcast(obs)).agg(
        F.sum((F.abs(F.col("t")) >= F.abs(F.col("t_obs"))).cast("int")).alias(
            "n_extreme"
        )
    )
    return (
        obs.crossJoin(F.broadcast(cnt))
        .select(
            "n_units",
            (F.round(F.col("t_obs") / F.lit(scale), ndigits) + 0.0).alias("t_obs"),
            F.round(
                (F.col("n_extreme") + 1.0) / (n_permutations + 1.0), ndigits
            ).alias("p_value"),
        )
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H test across k groups with the midrank tie
    correction:

        H  = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)
        H' = H / (1 − Σ(t³−t)/(N³−N))

    plus the epsilon-squared effect size ε² = (H' − k + 1)/(N − k).
    The doubled per-group rank sums 2·R_j, the tie moment Σ(t³−t), and
    all counts are exact bigints (one global midrank over N values —
    computed via the distributed per-value midrank map, like
    ``mann_whitney_u``); R_j²/n_j runs in doubles. The r8 rewrite
    replaced the unpartitioned rank window with
    global_doubled_midrank_map + an equi-join — every data-sized
    exchange is now partitioned; the closed form is unchanged.

    Output: one row (n, k, h, h_tie_corrected, epsilon_sq)."""
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    # Distributed global midrank (r8): per-value rank map + equi-join
    # instead of the unpartitioned window — identical r2 values, closed
    # form and oracle untouched.
    rank_map = global_doubled_midrank_map(vals, "v")
    ranked = vals.join(rank_map.select("v", "r2"), "v")
    per_g = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_j"), F.sum("r2").alias("r2_j")
    )
    tie_m = rank_map.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3")
    )
    # R_j = r2_j / 2 exactly; R_j²/n_j in doubles (R_j < N² ≤ 2^53-safe
    # only as double after the /2 — the square is done in doubles).
    m = per_g.agg(
        F.sum("n_j").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            (F.col("r2_j").cast("double") / 2.0)
            * (F.col("r2_j").cast("double") / 2.0)
            / F.col("n_j").cast("double")
        ).alias("sum_rsq_over_n"),
    ).crossJoin(F.broadcast(tie_m))
    nd = F.col("n").cast("double")
    h = 12.0 / (nd * (nd + 1.0)) * F.col("sum_rsq_over_n") - 3.0 * (nd + 1.0)
    # N=1 (tie-moment denominator 0) and all-tied input (corr = 0) have
    # no defined tie-corrected H: NULL, not an ANSI crash (r9 review);
    # nested CASE keeps the inner divisions unevaluated when degenerate
    corr = F.when(nd > 1.0, 1.0 - F.col("tie3").cast("double") / (nd * nd * nd - nd))
    hc = F.when(corr > 0, h / corr)
    kd = F.col("k").cast("double")
    # every group a single row (n == k): epsilon-squared undefined
    eps2 = F.when(nd > kd, (hc - kd + 1.0) / (nd - kd))
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        (F.round(h, ndigits) + 0.0).alias("h"),
        (F.round(hc, ndigits) + 0.0).alias("h_tie_corrected"),
        (F.round(eps2, ndigits) + 0.0).alias("epsilon_sq"),
    )


def jarque_bera(
    df: DataFrame,
    group_col: str,
    int_value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Jarque-Bera normality test from EXACT integer raw
    moments: Σv, Σv², Σv³, Σv⁴ ride bigints (caller guarantees |v| small
    enough that v⁴·n < 2^63 — e.g. whole dollars ≤ ~5·10³ at any harness
    SF), then skewness g₁ = m₃/m₂^{3/2}, excess kurtosis g₂ = m₄/m₂² − 3
    and JB = n/6·(g₁² + g₂²/4) are evaluated in ONE fixed double
    expression shape from those exact inputs — both engines see
    bit-identical moment tables, so the statistic hash-matches without
    any tolerance. Single map-side-combinable aggregate; no window.

    Output: (group, n, skewness, kurtosis_excess, jb)."""
    v = F.col("v")
    m = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(int_value_col).cast("bigint").alias("v"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("s1"),
            F.sum(v * v).alias("s2"),
            F.sum(v * v * v).alias("s3"),
            F.sum(v * v * v * v).alias("s4"),
        )
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mean = s1 / nd
    m2 = s2 / nd - mean * mean
    m3 = s3 / nd - 3.0 * mean * (s2 / nd) + 2.0 * mean * mean * mean
    m4 = (
        s4 / nd
        - 4.0 * mean * (s3 / nd)
        + 6.0 * mean * mean * (s2 / nd)
        - 3.0 * mean * mean * mean * mean
    )
    # constant group: m2 = 0 -> skewness/kurtosis/JB undefined (NULL),
    # not a 0/0 NaN or ANSI crash taking the other groups down
    g1 = F.when(m2 > 0, m3 / F.sqrt(m2 * m2 * m2))
    g2 = F.when(m2 > 0, m4 / (m2 * m2) - 3.0)
    jb = nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        (F.round(g1, ndigits) + 0.0).alias("skewness"),
        (F.round(g2, ndigits) + 0.0).alias("kurtosis_excess"),
        (F.round(jb, ndigits) + 0.0).alias("jb"),
    )


def ljung_box(
    acf: DataFrame,
    key_col: str,
    term_scale: float = 1e12,
    ndigits: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness statistic from an ACF table
    (operators.timeseries.acf_lags output: key, lag, n, r):

        Q = n(n+2) · Σ_{l=1..h} r_l² / (n − l)

    Consumes the ROUNDED r (both engines see the identical grid value),
    and rounds each term to a bigint at ``term_scale`` before the Σ — so
    Q is deterministic whatever the partitioning. Q ~ χ²_h under the
    white-noise null; the caller compares to the critical value (no
    incomplete-gamma in the certified tier). Trivial post-ACF aggregate.

    Output: (key, h_lags, n, q)."""
    terms = acf.select(
        F.col(key_col).alias("key"),
        F.col("n"),
        F.round(
            F.col("r")
            * F.col("r")
            / (F.col("n") - F.col("lag")).cast("double")
            * F.lit(term_scale)
        )
        .cast("bigint")
        .alias("t"),
    )
    m = terms.groupBy("key", "n").agg(
        F.count(F.lit(1)).alias("h_lags"), F.sum("t").alias("s")
    )
    nd = F.col("n").cast("double")
    q = nd * (nd + 2.0) * (F.col("s").cast("double") / F.lit(term_scale))
    return m.select(
        F.col("key").alias(key_col),
        F.col("h_lags").cast("bigint").alias("h_lags"),
        F.col("n").cast("bigint").alias("n"),
        (F.round(q, ndigits) + 0.0).alias("q"),
    )


def runs_test(
    series: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness per key: dichotomize the
    ordered series at its exact median order statistic (above = x > m,
    below = x ≤ m), count sign runs, and compare with the exact null
    moments

        μ = 2·n₁·n₂/n + 1,   σ² = 2n₁n₂(2n₁n₂ − n) / (n²(n − 1))

    Runs are counted with one lag window (run starts where the sign
    changes); all counts are exact bigints and the z-score is one fixed
    double closed form — products 2n₁n₂ go double BEFORE multiplying
    (ANSI overflow discipline). Completes the nonparametric family on
    the randomness axis (Mann-Whitney = location, Kruskal-Wallis =
    k-sample, Ljung-Box = autocorrelation, this = run structure).

    Output: (key, n, n_above, n_below, n_runs, z)."""
    # s feeds the count, the median pick, and the sign pass (3 source
    # scans in the naive plan); the contract input is post-aggregation
    # (keys × buckets), so materialize once.
    s = series.select(
        F.col(key_col).alias("key"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(x_col).cast("bigint").alias("x"),
    ).localCheckpoint(eager=True)
    wv = Window.partitionBy("key").orderBy("x", "t")
    cnt = s.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    med = (
        s.withColumn("rv", F.row_number().over(wv))
        .join(cnt, "key")
        .filter(
            F.col("rv")
            == F.ceil(F.col("n").cast("double") / 2.0).cast("bigint")
        )
        .select("key", F.col("x").alias("med"))
    )
    signed = s.join(med, "key").select(
        "key", "t", (F.col("x") > F.col("med")).cast("int").alias("sgn")
    )
    wt = Window.partitionBy("key").orderBy("t")
    runs = signed.select(
        "key",
        "sgn",
        (
            F.lag("sgn").over(wt).isNull()
            | (F.lag("sgn").over(wt) != F.col("sgn"))
        ).cast("int").alias("is_start"),
    )
    m = runs.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sgn").alias("n_above"),
        F.sum(1 - F.col("sgn")).alias("n_below"),
        F.sum("is_start").alias("n_runs"),
    )
    nd = F.col("n").cast("double")
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    two_n1n2 = 2.0 * n1 * n2
    mu = two_n1n2 / nd + 1.0
    var = (
        two_n1n2 * (two_n1n2 - nd) / (nd * nd * (nd - 1.0))
    )
    # single-row key (var denominator 0) or constant series
    # (n_above = 0 -> var = 0): z undefined -> NULL for that key, not
    # an ANSI crash for every key (r9 review; nested CASE keeps var's
    # division unevaluated at n = 1)
    z = F.when(
        nd > 1.0,
        F.when(var > 0, (F.col("n_runs").cast("double") - mu) / F.sqrt(var)),
    )
    return m.select(
        F.col("key").alias(key_col),
        F.col("n").cast("bigint").alias("n"),
        F.col("n_above").cast("bigint").alias("n_above"),
        F.col("n_below").cast("bigint").alias("n_below"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
        (F.round(z, ndigits) + 0.0).alias("z"),
    )


def turning_points_test(
    series: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Turning-points randomness test per key: count strict local
    extrema (x_{t−1} < x_t > x_{t+1} or the reverse) in the ordered
    series; under the i.i.d. null E[T] = 2(n−2)/3 and
    Var[T] = (16n − 29)/90, z = (T − E)/σ. Flat triples (ties) are not
    turning points — the conservative convention, stated so both
    engines agree bit-for-bit. One lag/lead window, exact counts, one
    closed form.

    Output: (key, n, n_turning, z)."""
    s = series.select(
        F.col(key_col).alias("key"),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(x_col).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("key").orderBy("t")
    tp = s.select(
        "key",
        (
            (
                (F.lag("x").over(w) < F.col("x"))
                & (F.lead("x").over(w) < F.col("x"))
            )
            | (
                (F.lag("x").over(w) > F.col("x"))
                & (F.lead("x").over(w) > F.col("x"))
            )
        ).cast("int").alias("is_tp"),
    )
    m = tp.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("is_tp"), F.lit(0))).alias("n_turning"),
    )
    nd = F.col("n").cast("double")
    mu = 2.0 * (nd - 2.0) / 3.0
    var = (16.0 * nd - 29.0) / 90.0
    z = (F.col("n_turning").cast("double") - mu) / F.sqrt(var)
    return m.select(
        F.col("key").alias(key_col),
        F.col("n").cast("bigint").alias("n"),
        F.col("n_turning").cast("bigint").alias("n_turning"),
        (F.round(z, ndigits) + 0.0).alias("z"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    cents_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Difference-in-differences estimator over a 2×2 (group × period)
    panel: effect = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with
    the large-sample SE √(Σ s²_cell/n_cell) from exact integer-cent
    moments (Σv, Σv² bigint per cell; sample variance in one fixed
    double form). The causal-inference companion to ts_ab_cuped (which
    reduces variance; this removes group-level time trends). One
    map-side-combinable aggregate over the four cells.

    ``group_col`` must be 0/1 (1 = treated), ``period_col`` 0/1
    (1 = post). Output: one row (n, effect, se, z)."""
    cells = df.select(
        F.col(group_col).cast("int").alias("g"),
        F.col(period_col).cast("int").alias("p"),
        F.col(cents_col).cast("bigint").alias("v"),
    ).groupBy("g", "p").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    cell = lambda g, p, c: F.max(  # noqa: E731
        F.when((F.col("g") == g) & (F.col("p") == p), F.col(c))
    )
    m = cells.agg(
        *[
            cell(g, p, c).alias(f"{c}_{g}{p}")
            for g in (0, 1)
            for p in (0, 1)
            for c in ("n", "s1", "s2")
        ]
    )
    def mean(g, p):
        return F.col(f"s1_{g}{p}").cast("double") / F.col(
            f"n_{g}{p}"
        ).cast("double")

    def var_over_n(g, p):
        n = F.col(f"n_{g}{p}").cast("double")
        s1 = F.col(f"s1_{g}{p}").cast("double")
        s2 = F.col(f"s2_{g}{p}").cast("double")
        return (s2 / n - (s1 / n) * (s1 / n)) / (n - 1.0)

    effect = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        var_over_n(1, 1) + var_over_n(1, 0) + var_over_n(0, 1)
        + var_over_n(0, 0)
    )
    total = sum(
        [F.col(f"n_{g}{p}") for g in (0, 1) for p in (0, 1)],
        F.lit(0),
    )
    return m.select(
        total.cast("bigint").alias("n"),
        (F.round(effect / 100.0, ndigits) + 0.0).alias("effect_dollars"),
        (F.round(se / 100.0, ndigits) + 0.0).alias("se_dollars"),
        (F.round(effect / se, ndigits) + 0.0).alias("z"),
    )
