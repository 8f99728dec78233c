"""Mobility pipeline — the gps-analytics workload end to end.

Reference chain (`airflow_home/dags/gps_pipeline.py:79`):
``geocodePings >> tzOffset >> stopLocations >> geocodeStops >> HWlabeling``
then the analysis layer (`wbgps/analysis.py`). Here each stage is a pure
DataFrame → DataFrame function; orchestration (Airflow there) is just
function composition, with optional parquet checkpoints between
pandas-UDF-heavy stages to bound lineage (`SURVEY.md` §4).

Scale design: the only Python crossings are stop detection (per-user
Arrow batches, skew-capped) and the WKT refine (candidate pairs only);
everything else is codegen'd relational work. Admin polygons are
dimension-sized and broadcast — at 100 TB of pings no stage shuffles the
ping table more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import grouped, spatial
from ..operators.panel import baseline_change, modal_value
from ..operators.relational import pivot_agg


def apply_tz_offset(
    pings: DataFrame,
    tz_lookup: DataFrame,
    cell_deg: float = 1.0,
    default_offset_s: int = 0,
) -> DataFrame:
    """The reference's tzOffset stage (`tz_offset.scala:25-28`): grid-index
    every ping (H3 res 6 there; lat/lon quantization here), broadcast-join
    a (cell → utc_offset_s) lookup, add the local-time epoch column.

    ``tz_lookup`` needs (cell string, utc_offset_s long); build it once
    from a tz-boundary dataset at the same cell resolution. Pings in
    cells absent from the lookup fall back to ``default_offset_s``."""
    cell = spatial.grid_cell(F.col("lat"), F.col("lon"), cell_deg)
    joined = pings.withColumn("cell", cell).join(
        F.broadcast(tz_lookup), "cell", "left"
    )
    return (
        joined.withColumn(
            "utc_offset_s",
            F.coalesce(F.col("utc_offset_s"), F.lit(default_offset_s)),
        )
        .withColumn("local_timestamp", F.col("timestamp") + F.col("utc_offset_s"))
        .drop("cell")
    )


def clean_pings(
    pings: DataFrame,
    max_accuracy_m: float = 200.0,
) -> DataFrame:
    """Boundary/accuracy filter (`stop_locations.py:60-70`: accuracy
    BETWEEN 0 AND 200, lat/lon in range) — pushed to the scan."""
    return pings.where(
        F.col("accuracy").between(0, max_accuracy_m)
        & F.col("lat").between(-90.0, 90.0)
        & F.col("lon").between(-180.0, 180.0)
    )


def detect_stops(
    pings: DataFrame,
    max_pings_per_user: int | None = 500_000,
    **params,
) -> DataFrame:
    """Stop detection (F2) with the grouped-map skew guard: a device
    emitting millions of pings is capped before the Arrow boundary
    (SURVEY.md §7.5.3)."""
    p = pings
    if max_pings_per_user:
        p = grouped.cap_group_size(p, "user_id", "timestamp", max_pings_per_user)
    return grouped.detect_stops_batched(p, **params)


def day_split_stops(stops: DataFrame) -> DataFrame:
    """F1 — split stops spanning midnight into per-day segments, native
    sequence+explode+clamp (replaces `stop_locations.py:39-57`'s UDF).
    Adds (day, seg_start, seg_end, duration)."""
    days = stops.withColumn(
        "dayidx",
        F.explode(
            F.sequence(
                F.floor(F.col("t_start") / 86400), F.floor(F.col("t_end") / 86400)
            )
        ),
    )
    return (
        days.withColumn(
            "seg_start", F.greatest("t_start", F.col("dayidx") * 86400)
        )
        .withColumn("seg_end", F.least("t_end", (F.col("dayidx") + 1) * 86400))
        .withColumn("duration", F.col("seg_end") - F.col("seg_start"))
        .withColumn(
            "day",
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayidx").cast("int")),
        )
        .drop("dayidx")
    )


def geocode_stops(stops: DataFrame, admin: DataFrame, cell_deg: float = 0.01) -> DataFrame:
    """J6 — attach geom_id via the two-phase grid join + exact WKT refine
    (`geocode_stop_locations.scala:46-88`). ``admin`` needs (geom_id,
    geometry WKT)."""
    return spatial.spatial_join_wkt(stops, admin, cell_deg=cell_deg)


def label_stops(stops_daily: DataFrame, **params) -> DataFrame:
    """F4 — H/W/O labels per (user, cluster), native windows
    (`wbgps/labeling.py:88-198` semantics)."""
    labels = grouped.label_home_work(stops_daily, **params)
    return stops_daily.join(labels, ["user_id", "cluster_label"], "left")


def durations_panel(labeled_daily: DataFrame) -> DataFrame:
    """The durations_window table (`labeling.py:201-220`): per (day,
    user, day/night) hours at H / W / O — pivot with explicit values (no
    discovery job)."""
    hr = (F.col("seg_start") % 86400 / 3600).cast("int")
    base = labeled_daily.withColumn(
        "day_night", F.when((hr >= 8) & (hr < 20), "day").otherwise("night")
    )
    return pivot_agg(
        base,
        ["day", "user_id", "day_night"],
        "location_type",
        ["H", "W", "O"],
        F.sum("duration"),
    ).na.fill(0, ["H", "W", "O"])


def daily_dominant_location(labeled_daily: DataFrame) -> DataFrame:
    """W2 — each user's dominant geom per day (`wbgps/analysis.py:378-388`),
    input must carry geom_id (post-geocode)."""
    per_geom = labeled_daily.groupBy("user_id", "day", "geom_id").agg(
        F.sum("duration").alias("total_s")
    )
    return modal_value(per_geom, ["user_id", "day"], "geom_id", "total_s")


def stay_at_home_index(
    durations: DataFrame, baseline_end: str, min_home_s: int = 6 * 3600
) -> DataFrame:
    """Stay-at-home share per day vs day-of-week-matched baseline
    (`src/analysis/stay_at_home.py` + google_change_metric
    `wbgps/analysis.py:30-38`)."""
    day_rows = durations.where(F.col("day_night") == "day")
    per_day = day_rows.groupBy("day").agg(
        (
            F.count(F.when(F.col("H") >= min_home_s, 1))
            / F.countDistinct("user_id")
            * 100.0
        ).alias("pct_at_home")
    )
    return baseline_change(per_day, [], "day", "pct_at_home", baseline_end)


def migration_flows(dominant_daily: DataFrame, min_gap_days: int = 0) -> DataFrame:
    """W3 — daily dominant-location transitions per user
    (`wbgps/analysis.py:392-415`): lag window, emit (prev_geom → geom)
    flows with day gaps."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("day")
    moves = (
        dominant_daily.withColumn("prev_geom", F.lag("geom_id").over(w))
        .withColumn("prev_day", F.lag("day").over(w))
        .where(
            F.col("prev_geom").isNotNull()
            & (F.col("geom_id") != F.col("prev_geom"))
            & (F.datediff("day", "prev_day") > min_gap_days)
        )
    )
    return moves.groupBy("prev_geom", "geom_id").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.countDistinct("user_id").alias("n_users"),
    )


def run(
    pings: DataFrame,
    admin: DataFrame | None = None,
    baseline_end: str = "2020-03-01",
    checkpoint_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline: returns the named intermediate + indicator frames.

    ``checkpoint_dir`` materializes parquet between pandas-UDF stages
    (the reference writes Delta between every stage — same purpose:
    bounded lineage, resumability)."""
    spark = pings.sparkSession

    def ckpt(df: DataFrame, name: str) -> DataFrame:
        if not checkpoint_dir:
            return df
        path = f"{checkpoint_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    stops = ckpt(detect_stops(clean_pings(pings)), "stops")
    daily = day_split_stops(stops)
    if admin is not None:
        daily = ckpt(geocode_stops(daily, admin), "stops_geocoded")
    labeled = label_stops(daily)
    durations = durations_panel(labeled)
    out = {
        "stops": stops,
        "stops_daily": daily,
        "labeled": labeled,
        "durations": durations,
        "stay_at_home": stay_at_home_index(durations, baseline_end),
    }
    if admin is not None:
        dom = daily_dominant_location(labeled)
        out["dominant_daily"] = dom
        out["migration"] = migration_flows(dom)
    return out
