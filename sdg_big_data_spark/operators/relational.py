"""Relational core — SURVEY.md §2.2 (P*), §2.4 (A*) operator contract.

Thin, tested wrappers over the DataFrame API. Everything here stays inside
whole-stage codegen (no Python in the hot path); Catalyst handles pushdown,
pruning, join reordering. The wrappers exist to (a) pin the declared
semantics, (b) carry the scale guidance in one place.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weighted_mean(col: str | Column, weight: str | Column) -> Column:
    """A6 — weighted mean as a composite aggregate expression
    (`wbgps/analysis.py:219,260`). Map-side partial aggregation applies to
    both the numerator and denominator sums, so this is one shuffle of two
    doubles per group regardless of input size.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = F.col(weight) if isinstance(weight, str) else weight
    return F.sum(c * w) / F.sum(w)


def sem(col: str | Column) -> Column:
    """A7 — standard error of the mean: stddev / sqrt(n)
    (`wbgps/analysis.py:220-224`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.stddev(c) / F.sqrt(F.count(c))


def count_ratio(predicate: Column) -> Column:
    """A8 — selectivity of a predicate as ONE aggregate
    (`compute_share_top_tweets_containing_ngram.py:103-104` does two
    ``count()`` actions = two full scans; the engine form is a single
    conditional aggregate = one scan)."""
    return F.sum(F.when(predicate, F.lit(1)).otherwise(F.lit(0))) / F.count(F.lit(1))


def winsorized(col: str | Column, lower: float = 0.01, upper: float = 0.99) -> "WinsorSpec":
    """A9 — winsorization spec; see :func:`winsorize` below."""
    return WinsorSpec(F.col(col) if isinstance(col, str) else col, lower, upper)


class WinsorSpec:
    def __init__(self, col: Column, lower: float, upper: float):
        self.col, self.lower, self.upper = col, lower, upper


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    by: Sequence[str] = (),
    exact: bool = True,
) -> DataFrame:
    """A9 — clip a column at its [p_lower, p_upper] quantiles, optionally
    per group (`indicators/code/1_import.py:122-127` uses scipy winsorize).

    ``exact=True`` uses ``F.percentile`` (exact, sort-based — fine up to
    ~1e9 rows per group); ``exact=False`` uses ``percentile_approx``
    (constant-memory sketch, the 100 TB path). Implemented as a window (or
    scalar subquery via crossJoin for the global case) + least/greatest
    clip — no second scan of the data.
    """
    pct = F.percentile if exact else F.percentile_approx
    c = F.col(col)
    if by:
        w = Window.partitionBy(*by)
        lo = pct(c, F.lit(lower)).over(w)
        hi = pct(c, F.lit(upper)).over(w)
        return df.withColumn(col, F.least(F.greatest(c, lo), hi))
    bounds = df.agg(
        pct(c, F.lit(lower)).alias("__lo"), pct(c, F.lit(upper)).alias("__hi")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(col, F.least(F.greatest(c, F.col("__lo")), F.col("__hi")))
        .drop("__lo", "__hi")
    )


def threshold_indicator(
    scores: DataFrame,
    score_col: str,
    cutoff: float,
    group_cols: Sequence[str],
    id_col: str,
    out_name: str = "n_ids",
    approx: bool = False,
) -> DataFrame:
    """A11 — the flagship query (`compiled-bookdown/13-indicator_time_series
    .Rmd:12-13`): filter score >= cutoff, group, count distinct ids.

    Scale: the filter is pushed to the scan (cutoffs select 1e-5 of rows at
    reference base rates), so the shuffle carries only survivors.
    ``approx=True`` swaps in HLL ``approx_count_distinct`` — at 100 TB the
    exact distinct count is a giant shuffle of ids; the sketch is
    mergeable and constant-size per group.
    """
    agg = (
        F.approx_count_distinct(id_col) if approx else F.countDistinct(id_col)
    ).alias(out_name)
    return scores.where(F.col(score_col) >= cutoff).groupBy(*group_cols).agg(agg)


def zscore_by_group(
    df: DataFrame, col: str, by: Sequence[str], out_name: str | None = None
) -> DataFrame:
    """A15 — per-group z-score (`news-analytics/README.md:39`), as a window
    so the input is scanned once (group stats broadcast back by the window
    exchange rather than a self-join)."""
    w = Window.partitionBy(*by)
    c = F.col(col)
    return df.withColumn(out_name or f"{col}_z", (c - F.avg(c).over(w)) / F.stddev(c).over(w))


def pivot_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str] | None,
    agg: Column,
) -> DataFrame:
    """A5 — wide reshape (`labeling.py:210-211`). ALWAYS pass ``values``
    when known: without it Spark runs an extra distinct-collect job over
    the full input just to discover the column set."""
    return df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg)


def collapse(
    df: DataFrame, by: Sequence[str], means: Sequence[str] = (), sums: Sequence[str] = ()
) -> DataFrame:
    """A14 — Stata-style panel collapse (`1_sentiment_country.do:22`):
    grouped means + sums in one pass."""
    aggs = [F.avg(c).alias(f"{c}_mean") for c in means] + [
        F.sum(c).alias(f"{c}_sum") for c in sums
    ]
    return df.groupBy(*by).agg(*aggs)


def hll_distinct_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    rollup_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup via Apache DataSketches HLL
    (`hll_sketch_agg` / `hll_union_agg` — Spark built-ins, JVM-side).

    The 100 TB pattern `countDistinct` cannot express: build ONE sketch
    per fine grain (e.g. per day), persist those ~1.5 KB sketches, and
    answer every coarser rollup (week / month / all-time / any ad-hoc
    group subset) by sketch UNION — the base data is never rescanned and
    the union is associative + commutative, so incremental appends just
    union yesterday's sketch in. Exact `countDistinct` re-shuffles every
    raw value for every new grain; sketches shuffle bytes per group.

    Accuracy: DataSketches HLL is EXACT while a group's cardinality fits
    the sparse coupon list (~0.75·2^lg_k); beyond that the estimate's
    relative standard error is ~1.04/√2^lg_k (±1.6% at lg_k=12).
    Returns ``rollup_cols + approx_distinct`` (estimate as long).
    """
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("__sketch")
    )
    merged = fine.groupBy(*rollup_cols).agg(
        F.hll_union_agg(F.col("__sketch")).alias("__sketch")
    )
    return merged.select(
        *rollup_cols, F.hll_sketch_estimate("__sketch").alias("approx_distinct")
    )


def equi_width_histogram(
    df: DataFrame, value_col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-width histogram over a numeric column: bucket i covers
    [min + i·w, min + (i+1)·w) with w = (max−min)/n, the max value
    clamped into the last bucket. Returns (bucket, lo, hi, n) for
    OCCUPIED buckets (empty buckets are not emitted — at 100 TB a
    spine join to materialize empties is the caller's one-liner).

    Two passes by necessity (bounds, then counts) but each is a
    map-side-combined aggregation — the bounds row is a broadcast
    crossJoin, so no shuffle carries raw values twice.
    """
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    with_b = df.select(v.alias("__v")).crossJoin(F.broadcast(bounds))
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("__v") - F.col("__lo")) / w).cast("int"),
        )
    )
    return (
        with_b.select(
            bucket.alias("bucket"),
            (F.col("__lo") + bucket * w).alias("lo"),
            (F.col("__lo") + (bucket + 1) * w).alias("hi"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def theta_set_overlap(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-set overlap between two slices via DataSketches Theta
    sketches — the set-EXPRESSION sketch HLL cannot provide: one pass
    builds a sketch per slice, then ``theta_intersection`` /
    ``theta_union`` / ``theta_difference`` answer |A∩B|, |A∪B|, |A∖B|
    without ever materializing either side's distinct set.

    The 100 TB decontamination/audience question — "how many of the
    training corpus's fingerprints / users appear in the benchmark /
    other cohort" — at sketch cost: slices are sketched in the SAME
    aggregation (conditional inputs, nulls ignored), so the base data is
    read once, and the ~k·8-byte sketches compose associatively across
    partitions, days, or corpora. Exact while each slice's cardinality
    stays under the sketch's nominal entries (2^lg_k retained hashes);
    beyond that, relative error ~1/√2^lg_k.

    Returns one row: (n_a, n_b, n_intersection, n_union, n_only_a) as
    long estimates.
    """
    v = F.col(value_col)
    s = F.col(side_col)
    sk_a = F.expr(
        f"theta_sketch_agg(__va, {lg_k})"
    )
    sk_b = F.expr(
        f"theta_sketch_agg(__vb, {lg_k})"
    )
    staged = df.select(
        F.when(s == side_a, v).alias("__va"),
        F.when(s == side_b, v).alias("__vb"),
    )
    sketches = staged.agg(sk_a.alias("__sa"), sk_b.alias("__sb"))
    return sketches.select(
        F.expr("theta_sketch_estimate(__sa)").alias("n_a"),
        F.expr("theta_sketch_estimate(__sb)").alias("n_b"),
        F.expr("theta_sketch_estimate(theta_intersection(__sa, __sb))").alias(
            "n_intersection"
        ),
        F.expr("theta_sketch_estimate(theta_union(__sa, __sb))").alias("n_union"),
        F.expr("theta_sketch_estimate(theta_difference(__sa, __sb))").alias(
            "n_only_a"
        ),
    )


def kll_quantile_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    rollup_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = 200,
) -> DataFrame:
    """Mergeable quantile rollup via DataSketches KLL (double): one
    sketch per fine grain, merged up to ``rollup_cols``, quantiles read
    off the merged sketch.

    The same persist-once / roll-up-forever economics as
    :func:`hll_distinct_rollup`, for ORDER statistics: exact grouped
    percentiles re-sort raw values for every new grain, while KLL
    sketches merge associatively with a proven rank-error bound
    (~1.65% at k=200, single-sided), so daily sketches answer weekly /
    monthly / all-time p50/p99 without touching raw data again.
    Returns ``rollup_cols + n + q_<pct>...`` columns.

    Spark exposes only the pairwise ``kll_sketch_merge_double``, so the
    rollup folds it over the collected fine-grain sketch list — sound
    because the fine grains per rollup group are dimension-counted (days
    per month, not rows) and each sketch is ~k doubles. Merge order
    follows collect_list's task order, so ESTIMATES (not the rank
    guarantee) can differ across runs — inherent to every distributed
    mergeable-quantile design.
    """
    fine = df.groupBy(*fine_cols).agg(
        F.expr(f"kll_sketch_agg_double({value_col}, {k})").alias("__sk")
    )
    merged = fine.groupBy(*rollup_cols).agg(
        F.collect_list("__sk").alias("__sks")
    ).select(
        *rollup_cols,
        F.expr(
            "aggregate(slice(__sks, 2, greatest(size(__sks) - 1, 0)), "
            "__sks[0], (acc, s) -> kll_sketch_merge_double(acc, s))"
        ).alias("__sk"),
    )
    cols = [
        F.expr("kll_sketch_get_n_double(__sk)").alias("n"),
        *[
            F.expr(f"kll_sketch_get_quantile_double(__sk, CAST({q} AS DOUBLE))").alias(
                f"q_{str(q).replace('.', '_')}"
            )
            for q in quantiles
        ],
    ]
    return merged.select(*rollup_cols, *cols)


def grouped_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str | Column,
    y_col: str | Column,
) -> DataFrame:
    """Per-group OLS trend of ``y`` on ``x`` — slope, intercept, r², n —
    the panel-regression primitive behind the reference's indicator
    trend analysis (its Stata post-processing fits time trends per
    country panel; `news-analytics/code/3_sentiment_global.do` models
    the same panels parametrically).

    Built-in ``regr_slope/regr_intercept/regr_r2/regr_count`` — JVM-side
    single-pass moment aggregates (map-side combined, one shuffle of
    5 doubles per group), the same scale shape as `a_corr_covar`.
    Rows where either side is NULL are excluded pairwise (SQL REGR_*
    semantics in both engines).
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    xd, yd = x.cast("double"), y.cast("double")
    return df.groupBy(*group_cols).agg(
        F.regr_count(yd, xd).cast("long").alias("n"),
        F.regr_slope(yd, xd).alias("slope"),
        F.regr_intercept(yd, xd).alias("intercept"),
        F.regr_r2(yd, xd).alias("r2"),
    )


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch build (Cormode & Muthukrishnan 2005): the
    mergeable FREQUENCY sketch completing the sketch family (HLL =
    distinct, Theta = set ops, KLL = quantiles, CM = per-item counts).

    Each row increments one cell per hash row: ``(i, h_i(key) mod w)``
    for i in [0, depth). The build is one explode (depth cells per row)
    + one map-side-combined groupBy to at most ``depth·width`` cells —
    at 100 TB the shuffle carries the CELL table, not the keys. Sketches
    over different partitions/days MERGE by summing cells (same shape as
    the HLL/Theta/KLL rollups), so a persisted daily sketch absorbs a
    new batch without rescanning history.

    Each key is hashed ONCE (``portable_hash60('cm:' || key)``) and the
    depth row-hashes are disjoint bit slices of that 60-bit value —
    ``bucket_i = (h >> (i·log2 w)) & (w−1)`` — so the per-row hash cost
    is constant in depth (measured 2.5 s → sub-second at sf0.1 for
    d=4 against four independent md5s). Requires ``width`` a power of
    two and ``depth·log2(width) ≤ 60``. Engine-portable: the oracle
    replays every cell with the same shift/mask arithmetic.

    Build order matters at scale: rows are FIRST collapsed by the
    combined ``depth·log2(w)`` low hash bits (one map-side-combined
    groupBy to at most distinct-keys rows — every cell coordinate is a
    bit slice of this value, so nothing is lost), and only then the
    already-aggregated frame explodes into depth cells. Exploding before
    aggregating would multiply the pre-combine row volume by depth.

    Returns ``(i, bucket, cnt)``.
    """
    from .dedup import portable_hash60

    bits = _cm_check(depth, width)
    h = portable_hash60(F.concat(F.lit("cm:"), F.col(key_col).cast("string")))
    pre = df.groupBy((h % F.lit(1 << (depth * bits))).alias("__hlo")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (F.shiftright(F.col("__hlo"), i * bits) % F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        pre.select(F.explode(cells).alias("c"), "__n")
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__n").alias("cnt"))
    )


def _cm_check(depth: int, width: int) -> int:
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    bits = (width - 1).bit_length()
    if depth * bits > 60:
        raise ValueError(f"depth*log2(width)={depth * bits} exceeds the 60 hash bits")
    return bits


def _cm_cells(key: Column, depth: int, width: int) -> Column:
    """The depth (i, bucket) probes for one key — shared by build and
    estimate so they can never disagree on the hash."""
    from .dedup import portable_hash60

    bits = _cm_check(depth, width)
    h = portable_hash60(F.concat(F.lit("cm:"), key.cast("string")))
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (F.shiftright(h, i * bits) % F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min point estimates for a query key set: ``est(key) =
    min_i sketch[i][h_i(key)]`` — an upper bound on the true count
    (collisions only ever ADD), within ``2N/width`` of it with
    probability ``1 - 2^-depth``.

    The query set is dimension-sized by contract; each key expands to
    ``depth`` probes that broadcast-join the cell table. Missing cells
    count 0.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(_cm_cells(F.col(key_col), depth, width)).alias("p"),
    ).select(key_col, F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["i", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cm_est"))


def hll_sliding_distinct(
    df: DataFrame,
    time_col: str,
    value_col: str,
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Trailing ``window_days``-day sliding DISTINCT count via mergeable
    HLL sketches — the rolling-uniques dashboard query (weekly active
    users) that exact ``countDistinct`` cannot serve at scale: a raw
    exact form re-shuffles every (day-window, value) pair — each row
    replicated ``window_days`` times THROUGH the shuffle — while here
    the corpus is touched once to build one ~KB sketch per day, and
    only sketches replicate into the per-day window unions.

    Shape: one map-side-combined daily sketch aggregate; each day's
    sketch fans out to the ``window_days`` windows it belongs to
    (narrow explode of a date sequence — KB × w, not rows × w); one
    union-merge groupBy over day-sized frames; windows truncated at the
    data's edge are only emitted for days that exist in the input.

    Same exactness contract as :func:`hll_distinct_rollup`: the
    DataSketches estimate IS exact while a window's cardinality sits in
    the sparse regime (<~0.75·2^lg_k) — size ``lg_k`` to the expected
    window uniques when exactness matters, or accept ~1.04/√2^lg_k
    relative error beyond.
    """
    day = F.date_trunc("day", F.col(time_col)).cast("date")
    daily = df.groupBy(day.alias("__day")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("__sketch")
    )
    fanned = daily.select(
        F.explode(
            F.sequence(
                F.col("__day"), F.date_add(F.col("__day"), window_days - 1)
            )
        ).alias("day"),
        "__sketch",
    )
    present = daily.select(F.col("__day").alias("day"))
    merged = (
        fanned.join(present, "day", "left_semi")
        .groupBy("day")
        .agg(F.hll_union_agg(F.col("__sketch")).alias("__sketch"))
    )
    return merged.select(
        "day", F.hll_sketch_estimate("__sketch").alias("approx_distinct")
    )
