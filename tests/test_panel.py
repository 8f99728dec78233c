"""Panel operators: baseline change, active users, monthly indicator."""

from __future__ import annotations

from datetime import date

import pytest

from pyspark.sql import functions as F


def test_baseline_change(spark):
    from sdg_big_data_spark.operators.panel import baseline_change

    rows = []
    # 4 baseline weeks: Mondays have value 100; then a post Monday at 50
    for d in (1, 8, 15, 22):  # Jan 2024 Mondays
        rows.append(("g1", date(2024, 1, d), 100.0))
    rows.append(("g1", date(2024, 2, 5), 50.0))  # Monday after baseline_end
    df = spark.createDataFrame(rows, "geo string, d date, v double")
    out = baseline_change(df, ["geo"], "d", "v", baseline_end="2024-02-01")
    post = out.where(F.col("d") == "2024-02-05").first()
    assert post.pct_change == -50.0
    base_day = out.where(F.col("d") == "2024-01-08").first()
    assert base_day.pct_change == 0.0


def test_active_users(spark):
    from sdg_big_data_spark.operators.panel import active_users

    rows = [("u1", date(2024, 1, d)) for d in range(1, 6)] + [
        ("u2", date(2024, 1, 1)),
        ("u2", date(2024, 1, 1)),  # same day twice still one active day
    ]
    df = spark.createDataFrame(rows, "user_id string, d date")
    act = active_users(df, "user_id", "d", 3)
    assert [r.user_id for r in act.collect()] == ["u1"]


def test_monthly_indicator(spark):
    from sdg_big_data_spark.operators.panel import monthly_indicator

    rows = [
        ("u1", date(2024, 1, 5), 0.9),
        ("u2", date(2024, 1, 9), 0.2),
        ("u3", date(2024, 1, 11), 0.95),
        ("u1", date(2024, 2, 2), 0.1),
    ]
    df = spark.createDataFrame(rows, "user_id string, d date, score double")
    out = monthly_indicator(df, "score", 0.5, "d", [], "user_id").collect()
    jan = [r for r in out if r.month == 1][0]
    assert jan.n_users == 2 and jan.n_users_total == 3
    assert abs(jan.pct_users - 200 / 3) < 1e-9
    assert all(r.month != 2 for r in out)  # no hits in Feb
