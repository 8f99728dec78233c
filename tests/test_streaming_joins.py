"""Stream-stream interval join: batch/stream parity, state bounding, and
outer-join null emission."""

from __future__ import annotations

import datetime as dt

import pytest

from sdg_big_data_spark.streaming import joins as sjoins


@pytest.fixture(scope="module")
def clicks_and_buys(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    clicks = spark.createDataFrame(
        [
            ("u1", t0, "ad1"),
            ("u1", t0 + dt.timedelta(hours=2), "ad2"),
            ("u2", t0 + dt.timedelta(minutes=5), "ad3"),
            ("u3", t0 + dt.timedelta(minutes=10), "ad4"),  # never buys
        ],
        "user_id string, click_ts timestamp, ad_id string",
    )
    buys = spark.createDataFrame(
        [
            ("u1", t0 + dt.timedelta(minutes=10), 5.0),   # pairs with ad1
            ("u2", t0 + dt.timedelta(minutes=50), 3.0),   # outside 30m
            ("u1", t0 + dt.timedelta(hours=2, minutes=29), 7.0),  # ad2
        ],
        "user_id string, buy_ts timestamp, amount double",
    )
    return clicks, buys


def _pairs(rows):
    return sorted((r["ad_id"], r["amount"]) for r in rows)


def test_batch_semantics(clicks_and_buys):
    clicks, buys = clicks_and_buys
    out = sjoins.interval_pair_join(
        clicks, buys, "user_id", "click_ts", "buy_ts", max_delay="30 minutes"
    ).collect()
    assert _pairs(out) == [("ad1", 5.0), ("ad2", 7.0)]


def test_stream_stream_matches_batch(spark, clicks_and_buys, tmp_path):
    clicks, buys = clicks_and_buys
    csrc, bsrc = str(tmp_path / "c"), str(tmp_path / "b")
    dst, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    clicks.write.parquet(csrc)
    buys.write.parquet(bsrc)

    cs = spark.readStream.schema(clicks.schema).parquet(csrc)
    bs = spark.readStream.schema(buys.schema).parquet(bsrc)
    joined = sjoins.interval_pair_join(
        cs, bs, "user_id", "click_ts", "buy_ts", max_delay="30 minutes"
    )
    sjoins.run_stream_to_parquet(joined, dst, ckpt)

    got = spark.read.parquet(dst).collect()
    assert _pairs(got) == [("ad1", 5.0), ("ad2", 7.0)]


def test_stream_plan_is_stateful_with_watermarks(spark, clicks_and_buys, tmp_path):
    clicks, buys = clicks_and_buys
    csrc, bsrc = str(tmp_path / "c2"), str(tmp_path / "b2")
    clicks.write.parquet(csrc)
    buys.write.parquet(bsrc)
    cs = spark.readStream.schema(clicks.schema).parquet(csrc)
    bs = spark.readStream.schema(buys.schema).parquet(bsrc)
    joined = sjoins.interval_pair_join(
        cs, bs, "user_id", "click_ts", "buy_ts", max_delay="30 minutes"
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    # both sides watermarked -> bounded state (the scale contract)
    assert plan.count("EventTimeWatermark") == 2


def test_left_outer_emits_unmatched(spark, clicks_and_buys, tmp_path):
    clicks, buys = clicks_and_buys
    csrc, bsrc = str(tmp_path / "c3"), str(tmp_path / "b3")
    dst, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    clicks.write.parquet(csrc)
    buys.write.parquet(bsrc)
    cs = spark.readStream.schema(clicks.schema).parquet(csrc)
    bs = spark.readStream.schema(buys.schema).parquet(bsrc)
    # tight right watermark: the final (max) buy event drives the right
    # watermark to 02:28, past click+30m for ad3/ad4 — making their
    # no-match provable so the outer nulls actually emit in the
    # availableNow run (a 2h delay would leave them gated forever)
    joined = sjoins.interval_pair_join(
        cs, bs, "user_id", "click_ts", "buy_ts",
        max_delay="30 minutes", how="leftOuter",
        left_watermark="1 minute", right_watermark="1 minute",
    )
    sjoins.run_stream_to_parquet(joined, dst, ckpt)
    got = spark.read.parquet(dst).collect()
    matched = {r["ad_id"]: r["amount"] for r in got if r["amount"] is not None}
    unmatched = {r["ad_id"] for r in got if r["amount"] is None}
    assert matched == {"ad1": 5.0, "ad2": 7.0}
    # u2's buy was outside the window; u3 never bought -> both clicks
    # surface with nulls once the watermark passes
    assert {"ad3", "ad4"} <= unmatched
