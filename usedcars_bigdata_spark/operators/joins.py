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

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same key group (DuckDB/pandas
    ``merge_asof`` semantics, ties matching).

    Spark has no native as-of join; the scalable idiom used here is the
    union-and-carry-forward trick: tag both sides, union them, and within
    each key group ordered by (ts, side) carry the last non-null right
    payload forward with ``last(..., ignorenulls)`` over a running frame.
    ONE shuffle on the keys, one window — no per-key Python
    (pd.merge_asof via applyInPandas is the fallback for exotic variants).

    Determinism: the right payload is carried as ONE struct (a single
    ``last(ignorenulls)``), so the attached columns always come from the
    same right row — per-column carries could mix rows when some value
    column is null. ``tiebreak`` names a right-side column (e.g. a unique
    event id) appended to the window ordering so that equal-``(key, ts)``
    right rows resolve identically on every run (the max tiebreak wins).
    """
    from pyspark.sql import types as T

    lpay = [c for c in left.columns]
    payload_type = T.StructType([right.schema[c] for c in value_cols])
    rtypes = dict(right.dtypes)
    l_side = left.select(
        *lpay,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r_payload"),
        (
            F.lit(None).cast(rtypes[tiebreak]) if tiebreak is not None else F.lit(0)
        ).alias("__tb"),
    )
    r_side = right.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lpay
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_payload"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(0)).alias("__tb"),
    )
    unioned = l_side.unionByName(r_side)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lpay,
        F.col("__side"),
        F.last("__r_payload", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lpay,
        *[F.col("__p").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def interval_join(
    left: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join: left rows matched to every interval with
    ``lo <= value <= hi`` (intervals may overlap — a row can match several).

    A naive non-equi join plans BroadcastNestedLoopJoin — O(rows ×
    intervals) compares, and a driver-sized build side at 100 TB. The
    scalable idiom used here is BANDING: explode each interval into the
    fixed-width buckets it covers, bucket the left side's value the same
    way, equi-join on the bucket id, then refine with the exact BETWEEN
    predicate. The join becomes a hash join on an integer key: left rows
    hash once, and the exploded interval side grows only by
    O(intervals × span/bucket_width) — choose ``bucket_width`` near the
    median interval span so most intervals cover a handful of buckets.
    (Same trick behind Spark's SQL range-join hints in Databricks runtime
    and interval joins in KDB/Flink.)

    Inner-join semantics only: an unmatched left row has no bucket match
    to preserve.
    """
    if bucket_width <= 0:
        # division by 0 yields NULL buckets and sequence(NULL, NULL)
        # drops every interval — an empty result indistinguishable from
        # 'no matches' instead of an error (r9 review)
        raise ValueError(f"bucket_width must be positive: got {bucket_width}")
    w = float(bucket_width)
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    bucketed = left.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    refined = (
        bucketed.join(exploded, "__bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
    return refined


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Batch CDC MERGE (upsert): rows of ``updates`` replace same-key rows
    of ``base``; update keys absent from ``base`` are inserted; all other
    base rows pass through. The Delta/Iceberg ``MERGE WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT`` shape as a pure DataFrame plan.

    Form: full-outer join on the keys + per-column "update row wins"
    resolution driven by a presence marker (NOT coalesce on the value
    columns — an update that legitimately sets a value to NULL must win,
    so precedence keys off row presence, not value nullness). One shuffle
    per side on the merge key; at scale, partition the target by a stable
    key so the rewrite touches only affected partitions (copy-on-write).
    ``updates`` must be key-unique (enforce upstream with dedup) — dup keys
    would fan out the join.
    """
    marked = updates.withColumn("__upd", F.lit(1))
    joined = base.alias("__b").join(marked.alias("__u"), list(keys), "full_outer")
    is_upd = F.col("__u.__upd").isNotNull()
    out_cols = []
    for c in base.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in updates.columns:
            out_cols.append(
                F.when(is_upd, F.col(f"__u.{c}")).otherwise(F.col(f"__b.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"__b.{c}").alias(c))
    return joined.select(*out_cols)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    eff_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply one batch of updates
    to a versioned dimension, KEEPING history — the warehouse complement
    of ``merge_upsert`` (which overwrites in place).

    Per update row (key, attrs, effective ts):
    - attrs CHANGED vs the key's current row → close the current row
      (valid_to = eff, is_current = false) and append a new current
      version (valid_from = eff, open-ended);
    - attrs identical → no-op (no spurious versions);
    - key unseen → insert as a new current row.
    Historical (non-current) rows pass through untouched; updates must be
    key-unique per batch (dedupe upstream — duplicate keys would fan out).

    One full-outer join on the key and ONE pass over it: each joined row
    emits its 0/1/2 output versions through a when()-array + explode, so
    the change detection isn't re-joined per branch. Attribute comparison
    is null-safe (``eqNullSafe``) — NULL→value and value→NULL both count
    as changes. At 100 TB the dimension is tiny next to facts; if not,
    partition both sides by the key so the merge is co-located, same as
    merge_upsert."""
    key_list = list(keys)
    attrs = list(attr_cols)
    cur = dim.filter(F.col(flag_col))
    hist = dim.filter(~F.col(flag_col))
    # literal presence markers on BOTH sides (the snapshot_diff rule this
    # file documents): probing a data column (the r8 form used
    # __u.eff_col) misclassifies presence when that column is
    # legitimately NULL — an update row with NULL effective ts was
    # silently ignored for existing keys (r9 review)
    joined = (
        cur.withColumn("__c_present", F.lit(1))
        .alias("__c")
        .join(
            updates.withColumn("__u_present", F.lit(1)).alias("__u"),
            key_list,
            "full_outer",
        )
    )

    cur_present = F.col("__c.__c_present").isNotNull()
    upd_present = F.col("__u.__u_present").isNotNull()
    differs = None
    for a in attrs:
        d = ~F.col(f"__c.{a}").eqNullSafe(F.col(f"__u.{a}"))
        differs = d if differs is None else (differs | d)

    def ver(attr_side: str, vfrom, vto, current) -> Column:
        fields = [F.col(k).alias(k) for k in key_list]
        fields += [F.col(f"{attr_side}.{a}").alias(a) for a in attrs]
        fields += [
            vfrom.alias(from_col),
            vto.alias(to_col),
            current.alias(flag_col),
        ]
        return F.struct(*fields)

    closed = ver(
        "__c", F.col(f"__c.{from_col}"), F.col(f"__u.{eff_col}"), F.lit(False)
    )
    # the open-ended valid_to takes the DIMENSION's own validity type
    # (date, timestamp, epoch int, ...) — hardcoding a date cast would
    # silently widen/clash with non-date dimensions
    to_type = dim.schema[to_col].dataType
    fresh = ver(
        "__u", F.col(f"__u.{eff_col}"), F.lit(None).cast(to_type), F.lit(True)
    )
    keep = ver(
        "__c", F.col(f"__c.{from_col}"), F.col(f"__c.{to_col}"), F.lit(True)
    )
    emit = (
        F.when(cur_present & upd_present & differs, F.array(closed, fresh))
        .when(cur_present, F.array(keep))
        .otherwise(F.array(fresh))
    )
    out_cols = key_list + attrs + [from_col, to_col, flag_col]
    merged = (
        joined.select(F.explode(emit).alias("__v"))
        .select(*[F.col(f"__v.{c}").alias(c) for c in out_cols])
    )
    return hist.select(*out_cols).unionByName(merged)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Changeset between two snapshots of the same table — the CDC
    extraction primitive for incremental pipelines: feed ``merge_upsert``
    or ``scd2_merge`` with ONLY what changed instead of reprocessing the
    full snapshot.

    Full-outer join on the key; rows classify as ``inserted`` (absent
    from old), ``deleted`` (absent from new), ``updated`` (present in
    both, any non-key column differs — null-safe, so NULL→value and
    value→NULL both count), else unchanged (excluded by default).
    Reported values come from the NEW side except for deletions (which
    only exist in old). One shuffle per side on the key; at scale,
    snapshots partitioned the same way diff with co-located joins.

    Output: (keys..., change_type, <non-key columns>)."""
    key_list = list(keys)
    val_cols = [c for c in old.columns if c not in key_list]
    assert set(old.columns) == set(new.columns), "snapshot schemas differ"
    # presence markers are literal-true columns — data columns could be
    # legitimately NULL and misclassify presence
    old_m = old.withColumn("__op", F.lit(True))
    new_m = new.withColumn("__np", F.lit(True))
    joined = old_m.alias("__o").join(new_m.alias("__n"), key_list, "full_outer")
    in_old = F.col("__o.__op").isNotNull()
    in_new = F.col("__n.__np").isNotNull()
    differs = None
    for c in val_cols:
        d = ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(differs if differs is not None else F.lit(False), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out_vals = [
        F.when(in_new, F.col(f"__n.{c}")).otherwise(F.col(f"__o.{c}")).alias(c)
        for c in val_cols
    ]
    out = joined.select(*key_list, change.alias("change_type"), *out_vals)
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def semi(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS: rows of left with a match — right side never widens the row."""
    return left.join(right, on=on, how="left_semi")


def anti(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of left without a match."""
    return left.join(right, on=on, how="left_anti")


def effective_dated_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (valid-time) join of facts against an SCD2-versioned
    dimension: each fact row picks the dimension version whose
    [valid_from, valid_to) interval contains the fact timestamp — the
    as-it-was lookup that makes historical reports reproducible, where
    joining the CURRENT version silently rewrites history (and a feature
    store would leak the future into training rows).

    Versioning guarantees at most one matching interval per key, so this
    is an equi-join on the key with the interval predicate as a join-time
    filter — Catalyst plans the hash join on the key and applies the
    range condition on matches; never a nested loop. Open-ended current
    rows (valid_to NULL) match everything from valid_from on. At 100 TB
    the dimension broadcasts (SCD2 dims are key-cardinality-sized ×
    version count); a huge dimension co-partitions on the key like
    merge_upsert."""
    key_list = list(keys)
    cond = None
    for k in key_list:
        c = facts[k] == dim[k]
        cond = c if cond is None else cond & c
    cond = cond & (dim[from_col] <= facts[ts_col]) & (
        dim[to_col].isNull() | (facts[ts_col] < dim[to_col])
    )
    return facts.join(dim, cond, how)


def fifo_match(
    buys: DataFrame,
    sells: DataFrame,
    key_col: str,
    qty_col: str,
    order_cols: list[str],
) -> DataFrame:
    """FIFO lot matching via CUMULATIVE-INTERVAL overlap join — the
    inventory/cost-basis primitive (match each outflow against the
    oldest unconsumed inflows). The procedural formulation is a
    per-key sequential walk; the declarative insight is that FIFO is
    pure arithmetic on cumulative quantities: buy lot i occupies the
    interval [cum_i - qty_i, cum_i) on its key's inflow axis, sell j
    occupies [scum_j - sqty_j, scum_j) on the same axis, and FIFO
    matches exactly their overlap — matched(i,j) = max(0,
    min(ends) - max(starts)). Two window cumsums (one exchange per
    side, same key) + one per-key interval join whose fanout is
    bounded by lots-per-key; integer quantities make every matched
    amount exact.

    Inputs must carry integer-valued ``qty_col``; ``order_cols`` fixes
    the FIFO arrival order deterministically. Output: one row per
    (key, buy lot, sell lot) overlap with matched_qty > 0 and both
    sides' ordering positions: (key, buy_pos, sell_pos, matched_qty,
    buy row payload columns prefixed b_, sell payload s_)."""
    from pyspark.sql import Window

    kb = F.col(key_col)

    def cumulate(df: DataFrame, side: str) -> DataFrame:
        w = Window.partitionBy(key_col).orderBy(*order_cols)
        qty = F.col(qty_col).cast("bigint")
        return df.select(
            kb.alias("__k"),
            F.row_number().over(w).alias(f"{side}_pos"),
            qty.alias(f"{side}_qty"),
            F.sum(qty).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
                f"{side}_end"
            ),
            *[F.col(c).alias(f"{side}_{c}") for c in df.columns
              if c not in (key_col, qty_col, *order_cols)],
        ).withColumn(f"{side}_start", F.col(f"{side}_end") - F.col(f"{side}_qty"))

    b = cumulate(buys, "b")
    s = cumulate(sells, "s").withColumnRenamed("__k", "__sk")
    matched = F.least(F.col("b_end"), F.col("s_end")) - F.greatest(
        F.col("b_start"), F.col("s_start")
    )
    return (
        b.join(
            s,
            (F.col("__k") == F.col("__sk"))
            & (F.col("b_start") < F.col("s_end"))
            & (F.col("s_start") < F.col("b_end")),
        )
        .withColumn("matched_qty", matched)
        .filter(F.col("matched_qty") > 0)
        .drop("__sk")
        .withColumnRenamed("__k", key_col)
    )


def nearest_asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_near",
    tiebreak: str | None = None,
) -> DataFrame:
    """NEAREST as-of join: for each left row, the right row minimizing
    |right_ts − left_ts| within the key group — ties between the
    backward and forward candidate go BACKWARD (the merge_asof
    'nearest' direction semantics). Same union-and-carry idiom as
    asof_join, but BOTH directions come out of the one shuffle and one
    sort: the backward candidate is last(payload, ignorenulls) over the
    preceding frame, the forward candidate first(...) over the
    following frame, and a single projection picks the nearer. A right
    row at exactly left_ts sorts before the left row (side ordering),
    lands in the backward frame, and wins any tie — equality matches,
    like asof_join.

    Output: left columns + value_cols suffixed + (__matched_ts as
    ``right_ts + suffix``, direction 'backward'|'forward'|NULL)."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    lpay = list(left.columns)
    rtypes = dict(right.dtypes)
    pay_fields = [right.schema[c] for c in value_cols] + [
        T.StructField("__rts", right.schema[right_ts].dataType)
    ]
    payload_type = T.StructType(pay_fields)
    l_side = left.select(
        *lpay,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__r_pay"),
        (
            F.lit(None).cast(rtypes[tiebreak]) if tiebreak is not None else F.lit(0)
        ).alias("__tb"),
    )
    r_side = right.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lpay
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in value_cols], F.col(right_ts).alias("__rts")
        ).alias("__r_pay"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(0)).alias("__tb"),
    )
    u = l_side.unionByName(r_side)
    order = [F.col("__ts"), F.col("__side"), F.col("__tb")]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.select(
        *lpay,
        "__side",
        "__ts",
        F.last("__r_pay", ignorenulls=True).over(wb).alias("__bk"),
        F.first("__r_pay", ignorenulls=True).over(wf).alias("__fw"),
    ).filter(F.col("__side") == 1)
    bdelta = F.col("__ts").cast("double") - F.col("__bk.__rts").cast("double")
    fdelta = F.col("__fw.__rts").cast("double") - F.col("__ts").cast("double")
    pick_back = F.col("__fw").isNull() | (
        F.col("__bk").isNotNull() & (bdelta <= fdelta)
    )
    chosen = F.when(pick_back, F.col("__bk")).otherwise(F.col("__fw"))
    direction = F.when(
        F.col("__bk").isNull() & F.col("__fw").isNull(), F.lit(None).cast("string")
    ).when(pick_back, F.lit("backward")).otherwise(F.lit("forward"))
    return carried.select(
        *lpay,
        *[chosen[c].alias(f"{c}{suffix}") for c in value_cols],
        chosen["__rts"].alias(f"{right_ts}{suffix}"),
        direction.alias("direction"),
    )


def bloom_filter_audit(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter join pruning with an exact false-positive audit —
    the runtime-filter technique a 100 TB join actually uses (build a
    compact membership sketch on the small side, broadcast it, and prune
    probe-side rows before the shuffle). The filter here is fully
    declarative and engine-portable: position ``i`` of key ``x`` is
    ``md5('bloom:' || i || ':' || x)[:8] as bigint mod m_bits``, the
    "bit set" is the DISTINCT position table of the build keys (≤ m_bits
    rows — always broadcastable), and a probe key passes iff ALL of its
    distinct positions hit the set. Everything is integer/count
    arithmetic, so the audit hash-certifies.

    Returns one row: (m_bits, k_hashes, n_build_keys, n_probe_keys,
    n_pass, n_false_pos, fp_rate) — n_false_pos = passes that are not
    true members (true members always pass, by construction), fp_rate
    over the non-member probes."""
    hash_axis = F.array(*[F.lit(i) for i in range(k_hashes)])

    def positions(df: DataFrame) -> DataFrame:
        d = df.select(F.col(key_col).cast("string").alias("k")).distinct()
        d = d.select("k", F.explode(hash_axis).alias("i"))
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("bloom"), F.col("i"), F.col("k"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return d.select("k", (h % m_bits).cast("long").alias("pos")).distinct()

    bits = positions(build).select("pos").distinct()
    # materialized: the membership flag join AND the build-count
    # aggregate both read this (distinct-key-sized) table — lazy, each
    # consumer re-scanned the build side (scan-budget test)
    build_keys = (
        build.select(F.col(key_col).cast("string").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ppos = positions(probe)
    hits = ppos.join(
        F.broadcast(bits.withColumn("__hit", F.lit(1))), "pos", "left"
    )
    per_key = hits.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
    )
    flagged = per_key.join(
        F.broadcast(build_keys.withColumn("__member", F.lit(1))), "k", "left"
    ).select(
        (F.col("n_pos") == F.col("n_hit")).cast("int").alias("passes"),
        F.coalesce(F.col("__member"), F.lit(0)).alias("member"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        # probe∩build — the fp-rate denominator's member count; NOT the
        # build-set size (the r8 form reported this AS n_build_keys,
        # which reads 0 on a disjoint probe; r9 review)
        F.sum("member").alias("__n_member"),
        F.sum("passes").alias("n_pass"),
        F.sum(
            (F.col("passes") == 1).cast("int") * (1 - F.col("member"))
        ).alias("n_false_pos"),
    )
    bcnt = build_keys.agg(F.count(F.lit(1)).alias("n_build_keys"))
    return agg.crossJoin(F.broadcast(bcnt)).select(
        F.lit(m_bits).cast("bigint").alias("m_bits"),
        F.lit(k_hashes).cast("bigint").alias("k_hashes"),
        F.col("n_build_keys").cast("bigint").alias("n_build_keys"),
        F.col("n_probe_keys").cast("bigint").alias("n_probe_keys"),
        F.col("n_pass").cast("bigint").alias("n_pass"),
        F.col("n_false_pos").cast("bigint").alias("n_false_pos"),
        F.round(
            F.col("n_false_pos").cast("double")
            / F.greatest(
                (F.col("n_probe_keys") - F.col("__n_member")).cast("double"),
                F.lit(1.0),
            ),
            6,
        ).alias("fp_rate"),
    )


def bitemporal_latest(
    versions: DataFrame,
    key_col: str,
    valid_col: str,
    system_col: str,
    as_of_valid,
    as_of_system,
    extra_partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Bitemporal point-in-time resolution: of all versions of ``key``
    with valid_from ≤ as_of_valid AND system_from ≤ as_of_system, keep
    the one that was the CURRENT belief at that system time — max
    system_from, tie-broken by max valid_from (the two-axis extension of
    scd2_pointlookup: valid time answers "what was true", system time
    answers "what did we believe then" — the reproducibility axis an
    auditable warehouse needs). One filtered window per key.

    ``as_of_*`` take ints or Columns (pass Columns to resolve several
    audit timestamps in one pass — crossJoin the broadcast audit axis and
    name it in ``extra_partition_cols``).

    Output: the surviving version rows, original columns preserved."""
    w = Window.partitionBy(key_col, *extra_partition_cols).orderBy(
        F.col(system_col).desc(), F.col(valid_col).desc()
    )
    return (
        versions.filter(
            (F.col(valid_col) <= as_of_valid)
            & (F.col(system_col) <= as_of_system)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    ndigits: int = 6,
) -> DataFrame:
    """Join-size estimation audit — the cardinality model every
    cost-based optimizer runs, made checkable: the EXACT join row count
    is Σ_k n_L(k)·n_R(k) over the two per-key count tables (no join of
    the fact rows needed — two aggregates and a count-table equi-join),
    compared against the textbook independence estimate
    |L|·|R| / max(d_L, d_R). The ratio says how wrong uniform-key
    assumptions are on this data — the number you need before trusting
    a planner's join ordering at 100 TB. All exact integers; one double
    division.

    Output: (n_left, n_right, d_left, d_right, exact_join_rows,
    independence_est, est_over_exact)."""
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    j = lc.join(rc, "k").agg(
        # disjoint key sets: SUM over the empty join is NULL — the
        # documented 'exact integer' is 0 (r9 review)
        F.coalesce(
            F.sum(F.col("nl") * F.col("nr")), F.lit(0)
        ).alias("exact_join_rows")
    )
    lm = lc.agg(
        F.sum("nl").alias("n_left"), F.count(F.lit(1)).alias("d_left")
    )
    rm = rc.agg(
        F.sum("nr").alias("n_right"), F.count(F.lit(1)).alias("d_right")
    )
    m = lm.crossJoin(F.broadcast(rm)).crossJoin(F.broadcast(j))
    est = F.col("n_left").cast("double") * F.col("n_right").cast(
        "double"
    ) / F.greatest(F.col("d_left"), F.col("d_right")).cast("double")
    return m.select(
        F.col("n_left").cast("bigint").alias("n_left"),
        F.col("n_right").cast("bigint").alias("n_right"),
        F.col("d_left").cast("bigint").alias("d_left"),
        F.col("d_right").cast("bigint").alias("d_right"),
        F.col("exact_join_rows").cast("bigint").alias("exact_join_rows"),
        F.round(est, 2).alias("independence_est"),
        # exact = 0 (no overlapping keys): the ratio is undefined —
        # NULL, not an ANSI divide-by-zero (r9 review)
        F.round(
            F.when(
                F.col("exact_join_rows") > 0,
                est / F.col("exact_join_rows").cast("double"),
            ),
            ndigits,
        ).alias("est_over_exact"),
    )
