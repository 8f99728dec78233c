"""Window operators — SURVEY.md §2.5 (W1-W8).

All pure built-in window expressions (JVM, whole-stage codegen). The one
structural scale rule: NEVER ``Window.orderBy`` without ``partitionBy`` on
big data (single-partition sort) — the global-rank helpers here pre-prune
with a per-partition top-k so the single-partition stage sees only
candidates (see also joins.rank_join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def modal_value(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """W1/W2 — per-key argmax ("modal value"): the value with the largest
    weight per key (`wbgps/analysis.py:164-182` picks the geom with max
    n_days per user; `:378-388` the daily dominant location).

    Deterministic: ties broken by ``value_col`` ascending (then
    ``tiebreak_col``). One shuffle on the key; row_number beats the
    reference's max-over-window + equality filter (which keeps ALL tied
    rows and needs a second dedup).
    """
    order = [F.col(weight_col).desc(), F.col(value_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_prev(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cols: Sequence[str],
    prefix: str = "prev_",
) -> DataFrame:
    """W3 — previous-row values per key (`wbgps/analysis.py:392-397`
    migration: previous geom/date per user ordered by date)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    out = df
    for c in cols:
        out = out.withColumn(f"{prefix}{c}", F.lag(c, 1).over(w))
    return out


def global_topk(
    df: DataFrame, order_by: Sequence[str], k: int, ascending: bool = False,
    rank_col: str | None = None,
) -> DataFrame:
    """W4/O2 — global top-k with optional dense global rank attached.

    The reference's `F.row_number().over(Window.orderBy(desc))` over 100M
    rows (`sample_tweets...py:65`) funnels everything through ONE task.
    Engine form: Spark's ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — per-partition top-k heaps, then a k-sized
    merge on the driver — so the full sort never happens. Ranks (if
    requested) are then assigned over only k rows.
    """
    cols = [F.col(c) for c in order_by]
    ordering = [c.asc() for c in cols] if ascending else [c.desc() for c in cols]
    top = df.orderBy(*ordering).limit(k)
    if rank_col:
        w = Window.orderBy(*ordering)  # only k rows by now — safe
        top = top.withColumn(rank_col, F.row_number().over(w))
    return top


def partition_local_rank(
    df: DataFrame,
    ordering: Sequence[Column],
    rank_col: str = "__lr",
    pid_col: str | None = None,
) -> DataFrame:
    """Row number by ``ordering`` within each PHYSICAL partition —
    completely shuffle-free (the building block for scalable ranking).

    ``Window.partitionBy(spark_partition_id())`` looks narrow but plans a
    full ``hashpartitioning`` Exchange of the whole table (verified via
    ``explain``). Instead: ``sortWithinPartitions`` (narrow), then
    ``monotonically_increasing_id`` — Spark defines it as
    ``(partition_id << 33) + row_index_within_partition`` assigned in row
    order — so the low 33 bits ARE the 0-based local rank and the high
    bits the partition id. Valid while a partition holds < 2^33 rows
    (Spark's own guarantee for the id layout).
    """
    mid = F.monotonically_increasing_id()
    out = df.sortWithinPartitions(*ordering).withColumn("__mid", mid)
    out = out.withColumn(
        rank_col, (F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1).cast("long")
    )
    if pid_col:
        out = out.withColumn(pid_col, F.expr("shiftright(__mid, 33)").cast("int"))
    return out.drop("__mid")


def global_rank(
    df: DataFrame,
    order_by: Sequence[str],
    ascending: bool = False,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    pin_layout: bool = True,
) -> DataFrame:
    """W4 scalable variant — EXACT global row_number over the FULL table
    with one range shuffle and no single-partition big stage.
    ``global_topk`` covers the top-k case; this covers rank-every-row
    consumers (AUROC ranks, percentile assignment, log-spaced sampling
    over unbounded rank lists).

    1. ``repartitionByRange`` on the ordering — partition *i* holds
       strictly earlier ranks than partition *i+1*; rows with equal keys
       land in ONE partition, so with a unique tiebreaker in ``order_by``
       the result is deterministic. AQE coalescing merges only ADJACENT
       range partitions, which preserves both invariants.
    2. Narrow in-partition rank (``partition_local_rank`` — no second
       shuffle, unlike a window over ``spark_partition_id()``).
    3. Per-partition row counts, derived from the RANKED branch itself:
       ``max(local_rank)`` per ``__pid`` IS the partition's row count (the
       local rank is 1-based and dense). A #partitions-row aggregate
       (map-side partial max, one row per partition shuffled), turned into
       exclusive cumulative offsets with a window over that tiny frame.
       Deriving counts from the same branch — rather than a sibling
       ``spark_partition_id()`` scan of the range exchange — means
       correctness never depends on ReuseExchange firing: even if the
       exchange is planned twice (exchange.reuse off, AQE replanning,
       canonicalization drift), offsets still attach to the partitions
       they were counted from.
    4. Broadcast the offsets back: ``rank = local_rank + offset``.

    Null ordering follows Spark defaults (asc → NULLS FIRST); pass
    non-null order keys when oracle-comparing against engines that
    default to NULLS LAST.
    """
    cols = [F.col(c) for c in order_by]
    ordering = [c.asc() for c in cols] if ascending else [c.desc() for c in cols]
    rp = (
        df.repartitionByRange(num_partitions, *ordering)
        if num_partitions
        else df.repartitionByRange(*ordering)
    )
    ranked = partition_local_rank(rp, ordering, rank_col="__lr", pid_col="__pid")
    # SINGLE materialization, load-bearing: `ranked` feeds BOTH the
    # counts branch (via the offsets broadcast job) and the output join.
    # Without pinning, the two consumers can materialize the range
    # exchange independently — and the sampled range boundaries / AQE
    # coalescing of the two runs need not agree, so offsets counted
    # against layout A get joined onto local ranks from layout B.
    # Invisible at test scale (everything coalesces into one partition
    # either way); at the 100x fixture it made the rank frame an
    # inconsistent non-permutation NONDETERMINISTICALLY (caught by the
    # sum(rank) != n(n+1)/2 invariant in tools/oracle_at_scale runs).
    # The pin is a REGISTERED LAZY CACHE (scoped_cache), not a
    # localCheckpoint: under AQE, Dataset.localCheckpoint(eager=False)
    # is eager in practice — toRdd finalizes the adaptive plan, which
    # EXECUTES every query stage at CONSTRUCTION time (measured: 193 s
    # of hidden jobs building pack_plan's frame at the 100x fixture
    # before any action, and the checkpoint's Scan ExistingRDD hid the
    # subtree from every plan audit). The cache pins identically: the
    # first consumer materializes the blocks (one MEMORY_AND_DISK copy,
    # the honest price of exact global ranks), later consumers read
    # them, and an evicted block recomputes per-partition from the SAME
    # finalized plan over the SAME shuffle files — boundaries cannot
    # drift. ``pin_layout=False`` exists ONLY so plan-gate tests can
    # inspect the unpinned plan (the pinned form shows an
    # InMemoryTableScan).
    if pin_layout:
        from ..cachescope import scoped_cache

        ranked = scoped_cache(ranked)
    counts = ranked.groupBy("__pid").agg(F.max("__lr").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    out = ranked.join(F.broadcast(offsets), "__pid")
    return out.withColumn(rank_col, F.col("__lr") + F.col("__off")).drop(
        "__pid", "__lr", "__off"
    )


def rolling_days(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    days: int,
    aggs: dict[str, Column],
    min_periods: int | None = None,
) -> DataFrame:
    """W5 — rolling time window per key, trailing ``days`` days inclusive
    (pandas ``rolling('49D')`` inside the reference's grouped-map,
    `labeling.py:47-63`). Implemented as ``rangeBetween`` on epoch
    seconds — native window, no Python, no per-user pandas frame.

    ``min_periods`` reproduces pandas' null-below-threshold semantics via
    a windowed count guard.
    """
    t = F.col(time_col).cast("timestamp").cast("long")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(t)
        .rangeBetween(-(days * 86400 - 1), 0)
    )
    out = df
    for name, expr in aggs.items():
        col = expr.over(w)
        if min_periods:
            col = F.when(F.count(F.lit(1)).over(w) >= min_periods, col)
        out = out.withColumn(name, col)
    return out


def cumulative_share(
    df: DataFrame, order_col: str, value_col: str,
    by: Sequence[str] = (), out_name: str = "cum_share",
) -> DataFrame:
    """W6 — running share of a total (wealth-percentile binning,
    `wbgps/analysis.py:75-81`): cumsum(value)/sum(value) ordered by
    ``order_col``."""
    w_cum = (
        Window.partitionBy(*by)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*by)
    return df.withColumn(
        out_name, F.sum(value_col).over(w_cum) / F.sum(value_col).over(w_all)
    )


def centered_ma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    before: int,
    after: int,
    out_name: str = "ma",
) -> DataFrame:
    """W7 — centered moving average (`wbgps/analysis.py:283-285` pandas
    ``rolling(28, center=True, min_periods=1)`` ⇒ rowsBetween(-14, 13))."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-before, after)
    )
    return df.withColumn(out_name, F.avg(value_col).over(w))


def date_spine(
    df: DataFrame, key_cols: Sequence[str], date_col: str,
) -> DataFrame:
    """W8 (part 1) — per-key daily calendar spanning each key's [min,max]
    date (pandas ``reindex(base_dates)``, `labeling.py:132-142`), built
    with ``sequence`` + ``explode`` — distributed, one row group per key,
    no driver-side calendar."""
    spans = df.groupBy(*key_cols).agg(
        F.min(F.to_date(date_col)).alias("__d0"), F.max(F.to_date(date_col)).alias("__d1")
    )
    return spans.select(
        *key_cols,
        F.explode(F.sequence("__d0", "__d1", F.expr("interval 1 day"))).alias(date_col),
    )


def ffill(
    df: DataFrame, key_cols: Sequence[str], order_col: str, cols: Sequence[str]
) -> DataFrame:
    """W8 (part 2) — forward fill: last non-null over the ordered partition
    (`F.last(ignorenulls=True)`)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame, key_cols: Sequence[str], order_col: str, cols: Sequence[str]
) -> DataFrame:
    """W8 (part 3) — backward fill: first non-null over the forward frame."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-key LINEAR interpolation of nulls in ``value_col`` against the
    numeric ``order_col`` (pandas ``interpolate(method='values')``) — the
    numeric sibling of :func:`gap_fill`'s categorical ffill/bfill:
    interior null runs take the line between the nearest non-null
    neighbors, leading/trailing runs clamp to the nearest observation.

    One keyed window shuffle serving four frame aggregates over the same
    ordering (last/first non-null value + its order position, both
    directions); the interpolation itself is row-local arithmetic.
    ``order_col`` must be numeric (epoch seconds, day index) and unique
    per key for a well-defined line.
    """
    out_col = out_col or value_col
    v, t = F.col(value_col), F.col(order_col)
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(t.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(t.asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_obs = F.when(v.isNotNull(), t)
    v0 = F.last(v, ignorenulls=True).over(wb)
    t0 = F.last(t_obs, ignorenulls=True).over(wb)
    v1 = F.first(v, ignorenulls=True).over(wf)
    t1 = F.first(t_obs, ignorenulls=True).over(wf)
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(v0.isNull(), v1.cast("double"))
        .when(v1.isNull(), v0.cast("double"))
        .otherwise(
            v0 + (v1 - v0) * (t - t0).cast("double") / (t1 - t0).cast("double")
        )
    )
    return df.withColumn(out_col, interp)


def interpolate_nearest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-key NEAREST-neighbor fill of nulls in ``value_col`` against the
    numeric ``order_col`` — the categorical interpolation the reference's
    labeling calendar uses (`labeling.py:132-142`
    ``interpolate('nearest')``): each null takes the non-null value whose
    order position is closest, by actual prev/next DISTANCE comparison
    (not numeric lerp — the value may be a cluster id or label). Exact
    ties go to the PREVIOUS observation; leading/trailing runs clamp.

    Same physical shape as :func:`interpolate_linear`: one keyed window
    shuffle serving the four neighbor lookups, then row-local selection.
    Works for any value type (no arithmetic touches the value column).
    """
    out_col = out_col or value_col
    v, t = F.col(value_col), F.col(order_col)
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(t.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(t.asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_obs = F.when(v.isNotNull(), t)
    v0 = F.last(v, ignorenulls=True).over(wb)
    t0 = F.last(t_obs, ignorenulls=True).over(wb)
    v1 = F.first(v, ignorenulls=True).over(wf)
    t1 = F.first(t_obs, ignorenulls=True).over(wf)
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(v0.isNull(), v1)
        .when(v1.isNull(), v0)
        .when((t - t0) <= (t1 - t), v0)  # tie -> previous
        .otherwise(v1)
    )
    return df.withColumn(out_col, filled)


def gap_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_cols: Sequence[str],
    method: str = "ffill_bfill",
) -> DataFrame:
    """W8 — full gap-fill: daily spine per key, left-join observations,
    then fill per ``method``:

    - ``"ffill_bfill"`` (default): forward- then backward-fill — the
      run-boundary behavior of the reference's
      reindex→interpolate('nearest')→ffill→bfill chain
      (`labeling.py:132-142`) on interior runs, exact on the edges;
    - ``"nearest"``: true nearest-OBSERVATION fill via
      :func:`interpolate_nearest` on the day index (prev/next distance
      comparison; exact ties → previous) — the faithful form of the
      reference's categorical 'nearest' step, which ffill-then-bfill
      only approximates when an interior gap is closer to the NEXT
      observation."""
    spine = date_spine(df, key_cols, date_col)
    obs = df.select(*key_cols, F.to_date(date_col).alias(date_col), *value_cols)
    joined = spine.join(obs, [*key_cols, date_col], "left")
    if method == "nearest":
        out = joined.withColumn(
            "__day", F.datediff(F.col(date_col), F.lit("1970-01-01"))
        )
        for c in value_cols:
            out = interpolate_nearest(out, key_cols, "__day", c)
        return out.drop("__day")
    return bfill(ffill(joined, key_cols, date_col, value_cols), key_cols, date_col, value_cols)


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    value_col: str | Sequence[str],
    cum_col: str | Sequence[str] = "cum_sum",
    broadcast_offsets: bool = True,
    pin_layout: bool = True,
) -> DataFrame:
    """EXACT running sum of ``value_col`` per group under a total order —
    without ever putting a whole group in one partition.

    ``value_col``/``cum_col`` accept lists to carry SEVERAL running sums
    in ONE pass (one range shuffle, one Arrow stage, one offset join) —
    the two-sided KS statistic uses this to get both ECDFs for the price
    of one.

    ``Window.partitionBy(group).orderBy(...)`` is the textbook form, but
    a skewed group (one language = 80% of a training corpus) becomes a
    single sort partition — the same scale-killer ``global_rank`` avoids
    for ranks. Same cure, extended to value sums:

    1. ``repartitionByRange`` on (group, order) — each group occupies a
       contiguous run of partitions;
    2. narrow in-partition cumsum per group (Arrow-batched ``mapInPandas``
       carrying a (key, running) pair across batches — vectorized
       ``groupby().cumsum()`` per batch, no per-row Python);
    3. per-(partition, group) totals → exclusive offsets per group via a
       window over that TINY frame (rows ≈ #partitions + #groups);
    4. join offsets back (broadcast by default; set
       ``broadcast_offsets=False`` for very-high-cardinality groups) and
       add.

    Ordering must be total (include a unique tiebreaker) for the result
    to be deterministic.
    """
    gcols = list(group_cols)
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ccols = [cum_col] if isinstance(cum_col, str) else list(cum_col)
    if len(vcols) != len(ccols):
        raise ValueError("value_col and cum_col must have the same length")
    ordering = [F.col(c).asc() for c in gcols] + list(order_cols)
    rp = df.repartitionByRange(*ordering)
    rp = rp.withColumn("__pid", F.spark_partition_id())

    # In-partition running sums per group, pure JVM (r10: this stage was
    # an Arrow mapInPandas carrying a (key, running) pair across batches —
    # a full JVM->Python->JVM round trip of every row in the middle of
    # the AUC/roc/spearman/packing/sampling family; guide §4 says
    # eliminate the boundary when built-ins exist). A window partitioned
    # by (__pid, group) IS that narrow per-chunk cumsum: the hash
    # exchange it plans shuffles a frame this operator's callers have
    # already collapsed (distinct values / documents), and the window's
    # own sort replaces the explicit sortWithinPartitions the Python scan
    # needed. Addition order per row is unchanged (sequential in the
    # total order), so results are bit-identical.
    w_run = (
        Window.partitionBy("__pid", *gcols)
        .orderBy(*list(order_cols))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rp.select(
        "*",
        *[
            F.sum(F.col(v).cast("double")).over(w_run).alias(c)
            for v, c in zip(vcols, ccols)
        ],
    )
    # Same single-materialization pin as global_rank (see the comment
    # there): a registered lazy cache, NOT localCheckpoint — under AQE
    # the latter executes the whole subtree at construction time.
    # `local` feeds both the offsets branch and the output join; two
    # independent materializations of the range exchange can disagree
    # on boundaries/coalescing, attaching group offsets to the wrong
    # partitions. ``pin_layout=False`` is for plan-gate tests only.
    if pin_layout:
        from ..cachescope import scoped_cache

        local = scoped_cache(local)

    totals = local.groupBy("__pid", *gcols).agg(
        *[F.max(c).alias(f"__tot_{i}") for i, c in enumerate(ccols)]
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__pid",
        *gcols,
        *[
            F.coalesce(F.sum(f"__tot_{i}").over(w_off), F.lit(0.0)).alias(
                f"__off_{i}"
            )
            for i in range(len(ccols))
        ],
    )
    # NULL-safe join: a plain equi-join on the group columns silently
    # DROPS every NULL-keyed group (SQL `=` never matches NULL); <=> keeps
    # them. Aliased sides + select("l.*") avoid the self-lineage
    # ambiguity both frames share (offsets derives from local).
    lhs = local.alias("__gps_l")
    rhs = offsets.alias("__gps_r")
    cond = F.col("__gps_l.__pid") == F.col("__gps_r.__pid")
    for g in gcols:
        cond = cond & F.col(f"__gps_l.{g}").eqNullSafe(F.col(f"__gps_r.{g}"))
    joined = lhs.join(F.broadcast(rhs) if broadcast_offsets else rhs, cond).select(
        "__gps_l.*",
        *[F.col(f"__gps_r.__off_{i}").alias(f"__off_{i}") for i in range(len(ccols))],
    )
    for i, c in enumerate(ccols):
        joined = joined.withColumn(c, F.col(c) + F.col(f"__off_{i}"))
    return joined.drop("__pid", *[f"__off_{i}" for i in range(len(ccols))])


def cumulative_share_scalable(
    df: DataFrame,
    order_cols: Sequence[Column],
    value_col: str,
    by: Sequence[str] = (),
    out_name: str = "cum_share",
) -> DataFrame:
    """W6 at fact-table scale: running share of the (per-group) total
    WITHOUT the single-partition sort the plain window form plans when
    ``by`` is empty (that form is fine for its documented dimension-sized
    inputs; this one rides :func:`grouped_prefix_sum` — range shuffle +
    narrow cumsum — and broadcast-joins the totals back).

    Float caveat vs the window form: partial sums accumulate per
    partition then add offsets, so last-bit placement can differ from
    strict sequential accumulation — equal at any sane rounding.
    """
    gcols = list(by)
    tmp_grp = "__cs_grp"
    work = df if gcols else df.withColumn(tmp_grp, F.lit(1))
    keys = gcols or [tmp_grp]
    summed = grouped_prefix_sum(work, keys, list(order_cols), value_col, cum_col=out_name)
    totals = work.groupBy(*keys).agg(F.sum(value_col).cast("double").alias("__tot"))
    lhs = summed.alias("__cs_l")
    rhs = totals.alias("__cs_r")
    cond = None
    for g in keys:
        c = F.col(f"__cs_l.{g}").eqNullSafe(F.col(f"__cs_r.{g}"))
        cond = c if cond is None else cond & c
    out = (
        lhs.join(F.broadcast(rhs), cond)
        .select("__cs_l.*", F.col("__cs_r.__tot").alias("__tot"))
        .withColumn(out_name, F.col(out_name) / F.col("__tot"))
    )
    out = out.drop("__tot")
    return out.drop(tmp_grp) if not gcols else out


def seasonal_decompose(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    period: int,
    half_window: int,
) -> DataFrame:
    """Classical additive seasonal decomposition of a keyed regular
    series: ``value = trend + seasonal + resid``.

    - ``trend``: centered moving average over ``2*half_window+1`` rows
      (edge rows average whatever is in frame — min_periods=1
      semantics, matching `centered_ma`);
    - ``seasonal``: per-(key, phase) mean of the detrended series,
      re-centered so the ``period`` seasonal offsets sum to zero per
      key (phase = 0-based row position mod ``period``);
    - ``resid``: the remainder.

    Plan: ONE keyed window shuffle serves row-number + trend; the
    seasonal table is a (keys × period)-sized aggregate — broadcast
    back onto the series (dimension-sized by construction). Total: one
    wide shuffle of the series + one tiny agg, independent of series
    length per key. The reference smooths with the same centered-MA
    trend (`wbgps/analysis.py:283-285`); the seasonal split is the
    standard classical-decomposition extension.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    staged = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "trend",
            F.avg(value_col).over(w.rowsBetween(-half_window, half_window)),
        )
        .withColumn("__phase", (F.col("__rn") - 1) % period)
    )
    seas = (
        staged.groupBy(*key_cols, "__phase")
        .agg(F.avg(F.col(value_col) - F.col("trend")).alias("__sraw"))
    )
    wk = Window.partitionBy(*key_cols)
    seas = seas.withColumn(
        "seasonal", F.col("__sraw") - F.avg("__sraw").over(wk)
    ).drop("__sraw")
    out = staged.join(F.broadcast(seas), [*key_cols, "__phase"])
    return out.withColumn(
        "resid", F.col(value_col) - F.col("trend") - F.col("seasonal")
    ).drop("__rn", "__phase")
