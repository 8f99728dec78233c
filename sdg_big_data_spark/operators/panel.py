"""Panel / indicator operators — SURVEY.md §2.4 A9-A15 composites and the
reference's analysis-layer metrics.

These compose the relational/window primitives into the indicator shapes
the reference publishes: baseline-change metrics (Google-mobility style),
active-user filters, and monthly indicator assembly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import modal_value  # noqa: F401  (re-exported panel primitive)


def baseline_change(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    baseline_end: str,
    out_name: str = "pct_change",
) -> DataFrame:
    """Percent change vs a day-of-week-matched baseline (the reference's
    google_change_metric, `wbgps/analysis.py:30-38`, computed driver-side
    in pandas there; distributed here).

    Baseline = median of ``value_col`` per (key, weekday) over dates <
    ``baseline_end``; output adds the baseline and the % change. The
    baseline aggregate is small (keys × 7) and broadcast back.
    """
    wd = F.dayofweek(F.col(date_col)).alias("__wd")
    base = (
        df.where(F.col(date_col) < baseline_end)
        .groupBy(*key_cols, wd)
        .agg(F.percentile(F.col(value_col), F.lit(0.5)).alias("__baseline"))
    )
    out = df.withColumn("__wd", F.dayofweek(F.col(date_col))).join(
        F.broadcast(base), [*key_cols, "__wd"], "left"
    )
    return out.withColumn(
        out_name,
        F.when(
            F.col("__baseline").isNotNull() & (F.col("__baseline") != 0),
            100.0 * (F.col(value_col) - F.col("__baseline")) / F.col("__baseline"),
        ),
    ).drop("__wd")


def active_users(
    df: DataFrame,
    user_col: str,
    date_col: str,
    min_active_days: int,
) -> DataFrame:
    """Active-user selection (`wbgps/analysis.py:89-130`): users with at
    least ``min_active_days`` distinct active days. Returns the user-key
    frame for a left_semi join against the panel."""
    return (
        df.groupBy(user_col)
        .agg(F.countDistinct(F.to_date(date_col)).alias("n_days"))
        .where(F.col("n_days") >= min_active_days)
        .select(user_col)
    )


def monthly_indicator(
    scores: DataFrame,
    score_col: str,
    cutoff: float,
    date_col: str,
    group_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """The full indicator assembly (`1_import.py:104-213` +
    `13-indicator_time_series.Rmd:12`): threshold → per-(year, month,
    groups) distinct users + share of all users that month."""
    base = scores.withColumn("year", F.year(date_col)).withColumn(
        "month", F.month(date_col)
    )
    totals = base.groupBy("year", "month").agg(
        F.countDistinct(id_col).alias("n_users_total")
    )
    hits = (
        base.where(F.col(score_col) >= cutoff)
        .groupBy("year", "month", *group_cols)
        .agg(F.countDistinct(id_col).alias("n_users"))
    )
    return hits.join(F.broadcast(totals), ["year", "month"]).withColumn(
        "pct_users", 100.0 * F.col("n_users") / F.col("n_users_total")
    )
