"""Grouped-map algorithms — SURVEY.md §2.10 F2-F4.

Per-user trajectory algorithms that genuinely need imperative per-group
logic: stop detection, stop re-clustering, home/work labeling. Each runs
as ``groupBy(user).applyInPandas`` — the one place the engine crosses into
Python, Arrow-batched, with explicit result schemas (required by the API
and pinned for stability).

The reference ran these via a C++ extension + sklearn DBSCAN
(`gps-analytics/src/wbgps/wbgps/stops.py:50,91-92`); here both are
re-implemented as small numpy routines (per-user groups are tiny, so an
O(n²) haversine matrix per user is cheap and dependency-free).

Scale notes:
- skew: one power user's pings land in one task. Mitigate upstream with a
  per-user ping cap (``cap_group_size``) — the reference has no guard.
- select-early: only the columns the algorithm needs cross the Arrow
  boundary; Catalyst cannot prune inside the Python payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0

STOP_SCHEMA = (
    "user_id string, t_start long, t_end long, lat double, lon double, "
    "n_pings long, median_accuracy double, cluster_label long"
)


def _haversine_m(lat1, lon1, lat2, lon2):
    """Vectorized haversine distance in meters (numpy arrays or scalars)."""
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def _radius_components(lat: np.ndarray, lon: np.ndarray, eps_m: float) -> np.ndarray:
    """Single-linkage connected components within ``eps_m`` (equivalent to
    DBSCAN(min_samples=1), the reference's clustering at
    `wbgps/stops.py:91-92`). Union-find over the O(n²) distance matrix —
    per-user n is tiny."""
    n = len(lat)
    if eps_m == 0.0:
        # eps=0 degenerates to exact coordinate equality (haversine is 0
        # iff the points coincide, poles/antimeridian aside): components
        # are the distinct (lat, lon) pairs, labeled in order of first
        # appearance — exactly the dense relabeling the union-find path
        # below produces, without the O(n²) distance loop. Removes the
        # superlinear per-group term for power users (measured: n=20k
        # quantized stops 11.1 s -> 13.6 ms, identical labels); at sf0.1
        # group sizes are small and the wall is probe-noise-equal.
        codes, first = {}, 0
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            key = (lat[i], lon[i])
            code = codes.get(key)
            if code is None:
                codes[key] = code = first
                first += 1
            out[i] = code
        return out
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        d = _haversine_m(lat[i], lon[i], lat[i + 1 :], lon[i + 1 :])
        for j in np.nonzero(d <= eps_m)[0]:
            ri, rj = find(i), find(i + 1 + j)
            if ri != rj:
                parent[rj] = ri
    roots = np.array([find(i) for i in range(n)])
    # relabel to dense 0..k-1 in order of first appearance (deterministic)
    _, labels = np.unique(roots, return_inverse=True)
    order = {}
    out = np.empty(n, dtype=np.int64)
    nxt = 0
    for i, r in enumerate(roots):
        if r not in order:
            order[r] = nxt
            nxt += 1
        out[i] = order[r]
    return out


def _detect_stops_one_user(pdf: pd.DataFrame, radius_m, stay_time_s, max_gap_s,
                           max_accuracy_m, eps_m) -> pd.DataFrame:
    """Sequential scan (time-sorted): grow a candidate stop while each ping
    stays within ``radius_m`` of the candidate's running centroid and the
    time gap stays <= ``max_gap_s``; emit when dwell >= ``stay_time_s``.

    Semantics follow the reference's stationary-event + accuracy-filter +
    re-cluster chain (`wbgps/stops.py:71-96`): pings above the accuracy
    threshold are dropped first; emitted stops are then grouped into
    recurrent stop locations by radius clustering.
    """
    pdf = pdf[pdf["accuracy"] <= max_accuracy_m]
    pdf = pdf.sort_values(["timestamp"], kind="mergesort")
    if pdf.empty:
        return pd.DataFrame(
            columns=[
                "user_id", "t_start", "t_end", "lat", "lon",
                "n_pings", "median_accuracy", "cluster_label",
            ]
        )
    lat = pdf["lat"].to_numpy()
    lon = pdf["lon"].to_numpy()
    ts = pdf["timestamp"].to_numpy()
    acc = pdf["accuracy"].to_numpy()
    user = pdf["user_id"].iloc[0]

    stops = []
    start = 0
    i = 1
    n = len(pdf)

    def close(lo, hi):
        if ts[hi - 1] - ts[lo] >= stay_time_s and hi - lo >= 2:
            stops.append(
                (
                    int(ts[lo]),
                    int(ts[hi - 1]),
                    float(np.median(lat[lo:hi])),
                    float(np.median(lon[lo:hi])),
                    int(hi - lo),
                    float(np.median(acc[lo:hi])),
                )
            )

    # Running centroid via incremental sums — recomputing
    # lat[start:i].mean() per step is O(segment) per ping, O(n²) per
    # user overall: measured as a 163 s straggler task (56x the stage
    # median) for a power user owning 50% of 1M pings (tools/
    # skew_probe.py), where the incremental form is linear. The
    # accumulation order only steers the radius DECISION (emitted
    # lat/lon are medians), so the oracle's replayed boundaries are
    # unchanged.
    sum_lat = float(lat[0])
    sum_lon = float(lon[0])
    while i < n:
        cnt = i - start
        c_lat = sum_lat / cnt
        c_lon = sum_lon / cnt
        gap = ts[i] - ts[i - 1]
        if gap > max_gap_s or _haversine_m(lat[i], lon[i], c_lat, c_lon) > radius_m:
            close(start, i)
            start = i
            sum_lat = float(lat[i])
            sum_lon = float(lon[i])
        else:
            sum_lat += float(lat[i])
            sum_lon += float(lon[i])
        i += 1
    close(start, n)

    if not stops:
        return pd.DataFrame(
            columns=[
                "user_id", "t_start", "t_end", "lat", "lon",
                "n_pings", "median_accuracy", "cluster_label",
            ]
        )
    out = pd.DataFrame(
        stops, columns=["t_start", "t_end", "lat", "lon", "n_pings", "median_accuracy"]
    )
    out.insert(0, "user_id", user)
    labels = _radius_components(
        out["lat"].to_numpy(), out["lon"].to_numpy(), eps_m
    )
    out["cluster_label"] = labels
    return out


def detect_stops(
    pings: DataFrame,
    radius_m: float = 50.0,
    stay_time_s: int = 300,
    max_gap_s: int = 3600,
    max_accuracy_m: float = 100.0,
    eps_m: float = 50.0,
) -> DataFrame:
    """F2 — per-user stop detection (reference parameters from
    `gps_pipeline.py:58`: radius 50 m, stay 300 s, gap 3600 s, accuracy
    100 m, DBSCAN eps 50 m)."""
    from ..session import ship_package

    ship_package(pings.sparkSession)
    narrow = pings.select("user_id", "lat", "lon", "accuracy", "timestamp")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _detect_stops_one_user(
            pdf, radius_m, stay_time_s, max_gap_s, max_accuracy_m, eps_m
        )

    return narrow.groupBy("user_id").applyInPandas(fn, schema=STOP_SCHEMA)


def batched_group_apply(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    fn,
    schema: str,
    partitions: int | None = None,
) -> DataFrame:
    """Partition-batched grouped-map: same semantics as
    ``groupBy(key).applyInPandas(fn)`` for per-key-independent ``fn``,
    different physical plan —

    ``repartition(key) → sortWithinPartitions(key, order) → mapInPandas``
    with an in-Python groupby. One Arrow transfer and ONE Python call per
    partition instead of one per group: applyInPandas costs ~3-4 ms of
    scheduling per group, which dominates when groups are small (1480
    tiny groups → ~5 s of pure overhead at sf0.1). A key whose rows
    straddle an Arrow batch boundary is stitched by carrying the tail key
    between batches (safe: the partition is sorted by key).
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    pre = df.repartition(n, key_col).sortWithinPartitions(key_col, *order_cols)

    def run(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: carry rides to the next one
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last = pdf[key_col].iloc[-1]
            complete = pdf[pdf[key_col] != last]
            carry = pdf[pdf[key_col] == last]
            if len(complete):
                # drop empty per-group results before concat (pandas warns on
                # — and will change dtype inference for — empty/all-NA parts)
                parts = [
                    out
                    for _, g in complete.groupby(key_col, sort=False)
                    for out in (fn(g),)
                    if len(out)
                ]
                if parts:
                    yield pd.concat(parts, ignore_index=True)
        if carry is not None and len(carry):
            yield fn(carry)

    return pre.mapInPandas(run, schema=schema)


def detect_stops_batched(
    pings: DataFrame,
    radius_m: float = 50.0,
    stay_time_s: int = 300,
    max_gap_s: int = 3600,
    max_accuracy_m: float = 100.0,
    eps_m: float = 50.0,
    partitions: int | None = None,
) -> DataFrame:
    """F2, partition-batched form — identical per-user results to
    :func:`detect_stops` via :func:`batched_group_apply`."""
    narrow = pings.select("user_id", "lat", "lon", "accuracy", "timestamp")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _detect_stops_one_user(
            pdf, radius_m, stay_time_s, max_gap_s, max_accuracy_m, eps_m
        )

    return batched_group_apply(
        narrow, "user_id", ["timestamp"], fn, STOP_SCHEMA, partitions
    )


def recluster_stops_batched(
    stops: DataFrame, eps_m: float = 50.0, partitions: int | None = None
) -> DataFrame:
    """F3, partition-batched form — identical results to
    :func:`recluster_stops`."""
    cols = stops.columns
    schema = ", ".join(f"{name} {dtype}" for name, dtype in stops.dtypes)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t_start", "t_end"], kind="mergesort").reset_index(
            drop=True
        )
        pdf["cluster_label"] = _radius_components(
            pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), eps_m
        )
        return pdf[cols]

    return batched_group_apply(
        stops, "user_id", ["t_start", "t_end"], fn, schema, partitions
    )


def recluster_stops(stops: DataFrame, eps_m: float = 50.0) -> DataFrame:
    """F3 — re-cluster stops per user after an incremental union
    (`wbgps/stops.py:113-122`): recompute radius-component labels over
    the combined old+new stop set."""
    from ..session import ship_package

    ship_package(stops.sparkSession)
    cols = stops.columns

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t_start", "t_end"], kind="mergesort").reset_index(drop=True)
        pdf["cluster_label"] = _radius_components(
            pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), eps_m
        )
        return pdf

    schema = ", ".join(
        f"{name} {dtype}"
        for name, dtype in stops.dtypes
    )
    return stops.groupBy("user_id").applyInPandas(fn, schema=schema)[cols]


HW_SCHEMA = "user_id string, cluster_label long, location_type string"


def label_home_work(
    stops_daily: DataFrame,
    night_start_hour: int = 19,
    night_end_hour: int = 8,
    work_start_hour: int = 9,
    work_end_hour: int = 17,
    min_work_seconds_per_day: int = 3600,
) -> DataFrame:
    """F4 (native-window form) — label each user's clusters H / W / O.

    Home = cluster with max total night-time duration; Work = non-home
    cluster with max weekday working-hours duration, requiring
    >= ``min_work_seconds_per_day`` mean seconds per active workday
    (reference's waa=3600, `08-optimization.Rmd:262-268`). All built-in
    aggregations + deterministic argmax — no Python. Input columns:
    user_id, cluster_label, t_start, t_end, duration (s).

    This is the scalable path for the reference's 111-line grouped-map
    labeler (`labeling.py:88-198`); the rolling/dynamic variant keeps the
    window machinery of operators/windows.py (W5/W8).
    """
    from .windows import modal_value

    s = stops_daily.withColumn("start_ts", F.to_timestamp(F.col("t_start")))
    s = s.withColumn("hour", F.hour("start_ts")).withColumn(
        "dow", F.dayofweek("start_ts")
    )
    night = s.where(
        (F.col("hour") >= night_start_hour) | (F.col("hour") < night_end_hour)
    )
    home_cand = night.groupBy("user_id", "cluster_label").agg(
        F.sum("duration").alias("night_s")
    )
    home = modal_value(home_cand, ["user_id"], "cluster_label", "night_s").select(
        "user_id", F.col("cluster_label").alias("home_cluster")
    )

    workday = s.where(
        F.col("dow").between(2, 6)
        & (F.col("hour") >= work_start_hour)
        & (F.col("hour") < work_end_hour)
    )
    work_cand = (
        workday.groupBy("user_id", "cluster_label")
        .agg(
            F.sum("duration").alias("work_s"),
            F.countDistinct(F.to_date("start_ts")).alias("n_days"),
        )
        .join(F.broadcast(home), "user_id", "left")
        .where(
            (F.col("cluster_label") != F.coalesce(F.col("home_cluster"), F.lit(-1)))
            & (F.col("work_s") / F.col("n_days") >= min_work_seconds_per_day)
        )
    )
    work = modal_value(work_cand, ["user_id"], "cluster_label", "work_s").select(
        "user_id", F.col("cluster_label").alias("work_cluster")
    )

    clusters = stops_daily.select("user_id", "cluster_label").distinct()
    return (
        clusters.join(home, "user_id", "left")
        .join(work, "user_id", "left")
        .select(
            "user_id",
            "cluster_label",
            F.when(F.col("cluster_label") == F.col("home_cluster"), "H")
            .when(F.col("cluster_label") == F.col("work_cluster"), "W")
            .otherwise("O")
            .alias("location_type"),
        )
    )


def label_home_work_dynamic(
    stops_daily: DataFrame,
    hw_days: int = 49,
    ww_days: int = 49,
    min_obs_share: float = 0.2,
    min_work_seconds_per_day: int = 3600,
    night_start_hour: int = 19,
    night_end_hour: int = 8,
    work_start_hour: int = 9,
    work_end_hour: int = 17,
) -> DataFrame:
    """F4 (dynamic form) — per-DAY home/work labels from trailing rolling
    windows, the reference's selected configuration hw=49, ww=49,
    mpow=mpoww=0.2, waa=3600 s (`08-optimization.Rmd:262-268`,
    `labeling.py:88-198`).

    For each (user, day): home = cluster with the largest trailing
    ``hw_days`` night-time duration, valid only when the cluster was
    observed on >= ``min_obs_share * hw_days`` distinct nights in the
    window (the min_periods rule); work = non-home argmax of trailing
    weekday working-hours duration with a mean-seconds-per-active-day
    floor. All native windows (rangeBetween on epoch days) — the
    reference's 111-line per-user pandas labeler with NO Python crossing,
    so it scales with the shuffle, not with Python throughput.

    Input columns: user_id, cluster_label, t_start (epoch s), duration.
    Output: (user_id, day, home_cluster, work_cluster) — nullable when no
    qualifying cluster exists yet (cold start inside the first window).
    """
    from pyspark.sql.window import Window

    from .windows import modal_value

    s = stops_daily.select(
        "user_id",
        "cluster_label",
        "duration",
        F.floor(F.col("t_start") / 86400).cast("long").alias("dayidx"),
        ((F.col("t_start") % 86400) / 3600).cast("int").alias("hr"),
        ((F.floor(F.col("t_start") / 86400) + 4) % 7).alias("dw"),  # 0=Sun
    )

    def rolling_argmax(
        filtered: DataFrame, days: int, min_obs: int, value_name: str
    ) -> DataFrame:
        # daily per-cluster totals → trailing day-range window per
        # (user, cluster) → per-(user, day) argmax with observation floor
        daily = filtered.groupBy("user_id", "cluster_label", "dayidx").agg(
            F.sum("duration").alias("d_s")
        )
        w = (
            Window.partitionBy("user_id", "cluster_label")
            .orderBy("dayidx")
            .rangeBetween(-(days - 1), 0)
        )
        rolled = daily.select(
            "user_id",
            "cluster_label",
            "dayidx",
            F.sum("d_s").over(w).alias("roll_s"),
            F.count(F.lit(1)).over(w).alias("roll_obs"),
        ).where(F.col("roll_obs") >= min_obs)
        return modal_value(
            rolled, ["user_id", "dayidx"], "cluster_label", "roll_s"
        ).select(
            "user_id", "dayidx", F.col("cluster_label").alias(value_name),
            F.col("roll_s").alias(f"{value_name}_s"),
            F.col("roll_obs").alias(f"{value_name}_obs"),
        )

    night = s.where(
        (F.col("hr") >= night_start_hour) | (F.col("hr") < night_end_hour)
    )
    home = rolling_argmax(
        night, hw_days, max(1, int(min_obs_share * hw_days)), "home_cluster"
    )

    workday = s.where(
        (~F.col("dw").isin(0, 6))
        & (F.col("hr") >= work_start_hour)
        & (F.col("hr") < work_end_hour)
    )
    work_all = rolling_argmax(
        workday, ww_days, max(1, int(min_obs_share * ww_days)), "work_cluster"
    ).where(
        F.col("work_cluster_s") / F.col("work_cluster_obs")
        >= min_work_seconds_per_day
    )

    days = s.select("user_id", "dayidx").distinct()
    out = days.join(home, ["user_id", "dayidx"], "left").join(
        work_all, ["user_id", "dayidx"], "left"
    )
    # Calendar fill (the reference's reindex→interpolate('nearest')→ffill→
    # bfill, labeling.py:132-142): a day where the dominant cluster was
    # not observed inherits the nearest label; bfill covers the cold-start
    # window. Work≠home enforced after filling.
    from .windows import bfill, ffill

    out = bfill(
        ffill(out, ["user_id"], "dayidx", ["home_cluster", "work_cluster"]),
        ["user_id"],
        "dayidx",
        ["home_cluster", "work_cluster"],
    ).withColumn(
        "work_cluster",
        F.when(
            F.col("work_cluster") == F.col("home_cluster"), F.lit(None)
        ).otherwise(F.col("work_cluster")),
    )
    return out.select(
        "user_id",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayidx").cast("int")).alias(
            "day"
        ),
        "home_cluster",
        "work_cluster",
    )


def ewma(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-group exponentially-weighted moving average — the recursive
    smoother ``y_t = α·x_t + (1-α)·y_{t-1}`` (``y_1 = x_1``; pandas
    ``ewm(adjust=False)`` semantics), the time-series filter the news
    sentiment panel smooths with before indexing
    (`news-analytics/code/2_sentiment_analysis.py` panel post-processing;
    the Stata side's `tssmooth` family).

    The recursion is inherently sequential WITHIN a group, so it runs
    Python-side — but as ONE ``mapInPandas`` pass over data repartitioned
    by group and sorted (group, order) within partitions, with the
    running ``y`` carried across both group boundaries and Arrow batch
    boundaries (batches split groups at ``maxRecordsPerBatch``). That is
    one shuffle + one Arrow round-trip for the whole table, instead of
    one grouped-map invocation per entity: at millions of small groups
    the per-call overhead (sort, frame copy, Arrow batch per group) was
    the entire cost — measured 2.6 s → ~1.1 s at sf0.1 (1M rows / 10k
    groups) for bit-identical output. The loop does ``a*x + b*y`` in
    exactly that IEEE order, so an oracle can replay it bit-identically
    with a recursive CTE — no tolerance needed. ``order_cols`` must be a
    total order per group (include a unique tiebreak) — the recursion's
    float trajectory depends on row order.

    Scale shape: work per partition is linear in its rows regardless of
    group sizes (no per-group quadratic anywhere), and a mega-entity
    skews one task at worst — cap with :func:`cap_group_size` like the
    other grouped-sequential operators. For genuinely unbounded groups
    the affine decomposition (segment-local recursion + β^t-scaled
    carry, the prefix-sum shape) distributes, at the cost of reordered
    float ops; this form is the honest default and matches every
    reference workload.
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    a, b = float(alpha), 1.0 - float(alpha)
    out_fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ]
    schema = ", ".join(out_fields + [f"`{out_col}` double"])
    vcol = value_col
    gcols = list(group_cols)

    def _norm_key(t: tuple) -> tuple:
        # NULL group keys must compare EQUAL to themselves across rows:
        # pandas surfaces them as None or NaN, and NaN != NaN would
        # restart the recursion on every row of a null-keyed group
        # (ADVICE r4 — a silent divergence from the groupBy form, which
        # treats nulls as one group). Map them to a private sentinel.
        return tuple(
            "\x00__null" if v is None or (isinstance(v, float) and v != v) else v
            for v in t
        )

    def fn(batches):
        # carry across Arrow batches: the partition is sorted by
        # (group, order), so a group's rows are contiguous across
        # consecutive batches
        prev_key: tuple | None = None
        prev_y = 0.0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            xs = pdf[vcol].astype("float64").tolist()
            keys = [
                _norm_key(t) for t in zip(*(pdf[g].tolist() for g in gcols))
            ]
            out = [0.0] * n
            y = prev_y
            k0 = prev_key
            for i in range(n):
                ki = keys[i]
                x = xs[i]
                y = x if ki != k0 else a * x + b * y
                k0 = ki
                out[i] = y
            prev_key, prev_y = k0, y
            res = pdf.copy()
            res[out_col] = out
            yield res

    work = df.repartition(*gcols).sortWithinPartitions(
        *gcols, *[F.col(c).asc() for c in order_cols]
    )
    return work.mapInPandas(fn, schema=schema)


def cap_group_size(
    df: DataFrame, key_col: str, order_col: str, max_rows: int
) -> DataFrame:
    """Skew guard for grouped-map stages: deterministically keep the first
    ``max_rows`` rows per key (by ``order_col``). A single device emitting
    millions of pings otherwise serializes one giant Arrow batch into one
    Python worker (SURVEY.md §7.5.3)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def rolling_median_mad(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    extra_cols: list[str] | None = None,
    window: int = 7,
    z: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group trailing rolling median + MAD anomaly flags — the
    robust outlier detector (Hampel filter): for each row, the median
    and the median-absolute-deviation of the trailing ``window`` rows
    (``min_periods=1``), and ``is_anomaly = |x - med| > z·MAD`` (never
    fires while MAD is 0 — a constant window has no scale to judge by).
    Median/MAD resist the masking that mean/stddev filters suffer when
    the outlier itself inflates the threshold.

    Exact windowed medians are not expressible with Spark's built-in
    window aggregates, so this crosses into Python the sanctioned way:
    ONE :func:`batched_group_apply` pass (repartition by key + in-
    partition sort + ``mapInPandas``) — one shuffle, one Arrow round
    trip, one Python call per partition, never per group. Inside, full
    windows are a vectorized ``sliding_window_view`` median (two
    ``np.median`` calls over an (n, w) strided matrix); only the first
    ``window-1`` warm-up rows per group loop. Work is linear-in-rows ×
    O(w log w); a mega-group skews one task at worst (cap with
    :func:`cap_group_size` like the other grouped-sequential operators).

    Medians here are selections (or the exact midpoint of two doubles),
    so the values are bit-deterministic and engine-portable: a DuckDB
    ``median(...) OVER (ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)`` /
    ``mad(...)`` window replays them exactly; only the displayed
    median/MAD are rounded, the anomaly comparison runs on raw values
    in both engines.
    """
    extra_cols = list(extra_cols or [])
    narrow = df.select(key_col, *order_cols, *extra_cols, value_col)
    in_fields = {f.name: f.dataType.simpleString() for f in narrow.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {in_fields[c]}" for c in [key_col, *order_cols, *extra_cols, value_col]]
        + ["`roll_med` double", "`roll_mad` double", "`is_anomaly` int"]
    )
    w = int(window)
    zf = float(z)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=float)
        n = len(v)
        med = np.empty(n)
        mad = np.empty(n)
        warm = min(w - 1, n)
        for i in range(warm):
            seg = v[: i + 1]
            m = np.median(seg)
            med[i] = m
            mad[i] = np.median(np.abs(seg - m))
        if n >= w:
            wins = np.lib.stride_tricks.sliding_window_view(v, w)
            m_full = np.median(wins, axis=1)
            med[w - 1:] = m_full
            mad[w - 1:] = np.median(np.abs(wins - m_full[:, None]), axis=1)
        out = pdf.copy()
        out["roll_med"] = med
        out["roll_mad"] = mad
        out["is_anomaly"] = (
            (np.abs(v - med) > zf * mad) & (mad > 0)
        ).astype("int32")
        return out

    res = batched_group_apply(narrow, key_col, order_cols, fn, out_schema)
    return res.withColumn("roll_med", F.round("roll_med", round_dp)).withColumn(
        "roll_mad", F.round("roll_mad", round_dp)
    )


def holt_linear(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    beta: float,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Per-group Holt double exponential smoothing — the linear-trend
    extension of :func:`ewma` (Holt 1957; statsmodels ``Holt(...)``
    with this init):

    - ``l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})``
    - ``b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}``
    - init ``l_1 = x_1``, ``b_1 = 0`` (the trend warms up from the
      data rather than peeking ahead at ``x_2``, which would break the
      one-pass streaming shape).

    Same physical plan as :func:`ewma`: ONE ``mapInPandas`` pass over
    ``(group, order)``-sorted partitions with the ``(level, trend)``
    pair carried across group and Arrow-batch boundaries — one shuffle
    + one Arrow round-trip for the whole table. The loop evaluates each
    recurrence in exactly the written IEEE order, so a recursive-CTE
    oracle replays both trajectories bit-identically. ``order_cols``
    must be a total order per group.
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    a = float(alpha)
    bt = float(beta)
    out_fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ]
    schema = ", ".join(
        out_fields + [f"`{level_col}` double", f"`{trend_col}` double"]
    )
    vcol = value_col
    gcols = list(group_cols)

    def _norm_key(t: tuple) -> tuple:
        return tuple(
            "\x00__null" if v is None or (isinstance(v, float) and v != v) else v
            for v in t
        )

    def fn(batches):
        prev_key: tuple | None = None
        prev_l = 0.0
        prev_b = 0.0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            xs = pdf[vcol].astype("float64").tolist()
            keys = [
                _norm_key(t) for t in zip(*(pdf[g].tolist() for g in gcols))
            ]
            levels = [0.0] * n
            trends = [0.0] * n
            lv, tr = prev_l, prev_b
            k0 = prev_key
            for i in range(n):
                ki = keys[i]
                x = xs[i]
                if ki != k0:
                    lv, tr = x, 0.0
                else:
                    new_l = a * x + (1.0 - a) * (lv + tr)
                    tr = bt * (new_l - lv) + (1.0 - bt) * tr
                    lv = new_l
                k0 = ki
                levels[i] = lv
                trends[i] = tr
            prev_key, prev_l, prev_b = k0, lv, tr
            res = pdf.copy()
            res[level_col] = levels
            res[trend_col] = trends
            yield res

    work = df.repartition(*gcols).sortWithinPartitions(
        *gcols, *[F.col(c).asc() for c in order_cols]
    )
    return work.mapInPandas(fn, schema=schema)
