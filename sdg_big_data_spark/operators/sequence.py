"""Event-sequence analytics — ordered-funnel conversion and Markov
transition counts over per-entity event streams.

Why they're here: the engine's event table (and any clickstream /
interaction log feeding a training pipeline) is consumed as SEQUENCES —
"who reached step k", "what follows what" — and both questions have
shuffle-minimal DataFrame forms that need no per-user Python:

- :func:`funnel` — one groupBy(user) collapses each user's history to a
  sorted (ts, type) array, then the sequential step times are pure array
  expressions (filter + array_min per step). ONE corpus shuffle total,
  assuming the standard bounded-per-entity-history contract (the same
  assumption every per-user grouped-map in the mobility pipeline makes,
  operators/grouped.py).
- :func:`transitions` — one keyed window (lead over (user, ts)) + one
  dimension-sized groupBy(from, to) aggregate. The transition matrix is
  |event-type|² rows — broadcastable downstream.

Both are deterministic under a total per-user order (ts with a unique
tiebreaker column) and exactly SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_seconds


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: for each user, the earliest time of
    ``steps[0]``, then the earliest ``steps[1]`` STRICTLY AFTER it, and
    so on. Returns one row per step: (step, step_name, n_users) with
    n_users = users whose sequential chain reaches that step.

    The per-user scan is expression-only and ORDER-FREE: step k's time
    is ``min(ts of step-k events strictly after t_{k-1})`` — a pure
    min over a set, so no per-user history ordering is ever needed.
    One groupBy(user) collapses each user to step 0's plain conditional
    ``min`` (map-side combined) plus one timestamp array PER LATER STEP
    (``collect_list(when(type = step_k, ts))`` — nulls skipped, so only
    that step's events are collected, no struct packing, no array_sort:
    the r10 form sorted a (ts, type) struct history that nothing
    consumed in order; r11 drops the sort and shuffles one timestamp
    column per step instead of the whole typed history). Step k > 0 is
    then ``array_min(filter(ts_k, t > t_{k-1}))``. Strictly-after
    semantics make simultaneous events NOT satisfy the next step (the
    conservative funnel definition, replayed identically by the
    oracle's join chain).
    """
    first = steps[0]
    aggs = [F.min(F.when(F.col("__t") == first, F.col("__ts"))).alias("__m0")]
    aggs += [
        F.collect_list(F.when(F.col("__t") == s, F.col("__ts"))).alias(f"__a{i}")
        for i, s in enumerate(steps[1:], start=1)
    ]
    evts = (
        df.select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__t"),
        )
        .where(F.col("__t").isin(list(steps)))
        .groupBy("__u")
        .agg(*aggs)
    )
    step_times: list[Column] = [F.col("__m0")]
    prev: Column = step_times[0]
    for i in range(1, len(steps)):
        t = F.array_min(
            F.filter(F.col(f"__a{i}"), (lambda p: lambda x: x > p)(prev))
        )
        step_times.append(t)
        prev = t
    per_user = evts.select(
        *[t.alias(f"__s{i}") for i, t in enumerate(step_times)]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"__s{i}")).cast("long").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    # one row per step via a single explode — a k-way union of selects
    # over `counts` would re-run the whole per-user aggregation per
    # branch (no subtree reuse across union arms; observed k x the
    # corpus shuffle in the physical plan)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("__r")).select("__r.*")


def transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition counts + row-normalized
    probabilities over per-user event streams: (from_type, to_type,
    n, p) where p = n / Σ_to n.

    One keyed window shuffle (lead over (user, order)) + one
    #types²-row aggregate; the probability normalization is a window
    over that dimension-sized frame. ``order_cols`` must totally order
    each user's events (include a unique tiebreaker) for determinism.
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c).asc() for c in order_cols])
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    cnt = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(wt)).alias("p"),
    )


def conversion_latency(
    df: DataFrame,
    from_type: str,
    to_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    quantiles: tuple[float, ...] = (0.5, 0.9),
    round_dp: int = 4,
) -> DataFrame:
    """Time-to-convert distribution — the latency companion to
    :func:`funnel` (which counts WHO converts, not HOW LONG it takes):
    per user, the whole-second delta between the earliest ``from_type``
    event and the earliest ``to_type`` event STRICTLY after it. Returns
    ONE row: (n_converted, mean_s, q50_s, q90_s, ...).

    Quantiles are EXACT type-1 (discrete) order statistics — the value
    at sorted position ceil(q·n), ranked by the scalable range-shuffle
    :func:`~.windows.global_rank` (never a single-partition sort, never
    percentile_approx — an approx quantile cannot hash-match an
    oracle). Deltas are exact integer seconds (floor-epoch on both
    ends, the g_sessionize discipline), so mean = Σ/n is exact long
    arithmetic until the final rounding.

    Shape: two user-keyed min-aggregates + one users-sized rank +
    a quantile-count-sized aggregate. Nothing corpus-sized moves
    after the two event scans; the two scans prune to the two event
    types at the source (pushed IN filter).
    """
    import math

    from .windows import global_rank

    sec = epoch_seconds  # already floor-to-seconds BIGINT (DuckDB epoch())
    firsts = (
        df.where(F.col(type_col) == from_type)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__t0"))
    )
    conv = (
        df.where(F.col(type_col) == to_type)
        .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__t1"))
        .join(firsts, "__u")
        .where(F.col("__t1") > F.col("__t0"))
        .groupBy("__u", "__t0")
        .agg(F.min("__t1").alias("__t1"))
        .select(
            "__u",
            (sec(F.col("__t1")) - sec(F.col("__t0"))).alias("__d"),
        )
    )
    ranked = global_rank(conv, ["__d", "__u"], ascending=True, rank_col="__r")
    from ..cachescope import scoped_cache

    ranked = scoped_cache(ranked)
    n = ranked.count()
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.sum("__d").cast("double") / F.count(F.lit(1)), round_dp)
        .alias("mean_s"),
    ]
    for q in quantiles:
        pos = max(1, math.ceil(q * n))
        aggs.append(
            F.min(F.when(F.col("__r") == pos, F.col("__d"))).alias(
                f"q{int(q * 100)}_s"
            )
        )
    return ranked.agg(*aggs)
