"""Incremental-append protocol (§2.11) + availableNow streaming wrapper."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_id long, date string, value double")


def test_incremental_append_overlap_dedup(spark, tmp_path):
    from sdg_big_data_spark.streaming.incremental import (
        incremental_append,
        last_processed_date,
    )

    target = str(tmp_path / "tbl")

    # batch 1: days 1-5
    b1 = _batch(
        spark,
        [(i, f"2024-01-0{d}", float(i)) for i, d in enumerate([1, 2, 3, 4, 5], start=1)],
    )
    incremental_append(spark, b1, target, "date", ["event_id"], ["date"])
    assert last_processed_date(spark, target) == "2024-01-05"
    assert spark.read.parquet(target).count() == 5

    # batch 2: re-delivers day 4-5 (late duplicates, same keys) + days 6-7
    b2 = _batch(
        spark,
        [
            (4, "2024-01-04", 99.0),   # duplicate key in overlap window
            (5, "2024-01-05", 99.0),   # duplicate key in overlap window
            (6, "2024-01-06", 6.0),
            (7, "2024-01-07", 7.0),
        ],
    )
    incremental_append(spark, b2, target, "date", ["event_id"], ["date", "value"])
    out = spark.read.parquet(target)
    assert out.count() == 7  # no duplicate event_ids
    assert last_processed_date(spark, target) == "2024-01-07"
    # dedup kept the first by (date, value): original 4.0/5.0, not 99.0
    vals = {r.event_id: r.value for r in out.collect()}
    assert vals[4] == 4.0 and vals[5] == 5.0
    # early partitions untouched by dynamic overwrite
    assert vals[1] == 1.0


def test_incremental_append_only_new_partitions_rewritten(spark, tmp_path):
    from sdg_big_data_spark.streaming.incremental import incremental_append

    target = str(tmp_path / "tbl2")
    b1 = _batch(spark, [(1, "2024-02-01", 1.0), (2, "2024-02-10", 2.0)])
    incremental_append(spark, b1, target, "date", ["event_id"], ["date"])
    mtime_before = os.path.getmtime(os.path.join(target, "date=2024-02-01"))

    b2 = _batch(spark, [(3, "2024-02-12", 3.0)])
    incremental_append(spark, b2, target, "date", ["event_id"], ["date"], overlap_days=2)
    # 02-01 partition is OUTSIDE the overlap window [02-08, ...] → its
    # directory must not be rewritten by the dynamic-partition overwrite
    assert os.path.getmtime(os.path.join(target, "date=2024-02-01")) == mtime_before
    assert spark.read.parquet(target).count() == 3


def test_available_now_stream(spark, tmp_path):
    from sdg_big_data_spark.streaming.incremental import available_now_stream

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    chk = str(tmp_path / "chk")
    df = _batch(spark, [(1, "2024-03-01", 10.0), (2, "2024-03-01", 20.0)])
    df.write.parquet(src)

    available_now_stream(
        spark,
        src,
        lambda s: s.where(F.col("value") > 15.0),
        dst,
        chk,
        schema=df.schema,
    )
    out = spark.read.parquet(dst)
    assert out.count() == 1 and out.first().event_id == 2

    # second invocation: no new files → exactly-once, nothing appended
    available_now_stream(
        spark, src, lambda s: s.where(F.col("value") > 15.0), dst, chk, schema=df.schema
    )
    assert spark.read.parquet(dst).count() == 1


class TestMergeableAggState:
    """agg_state / merge_agg_states / finalize_agg — incremental rollup
    maintenance without history rescans."""

    def test_merged_splits_equal_direct(self, spark):
        from pyspark.sql import functions as F

        from sdg_big_data_spark.streaming import incremental as inc

        df = spark.range(1000).select(
            (F.col("id") % 4).alias("k"),
            (F.col("id") * 0.37 - 100).alias("v"),
        )
        parts = [df.where(F.col("v") < -50), df.where(F.col("v") >= -50)]
        states = [inc.agg_state(p, ["k"], "v") for p in parts]
        merged = inc.finalize_agg(
            inc.merge_agg_states(*states, keys=["k"]), ["k"]
        )
        direct = inc.finalize_agg(inc.agg_state(df, ["k"], "v"), ["k"])
        m = {r["k"]: r for r in merged.collect()}
        d = {r["k"]: r for r in direct.collect()}
        assert set(m) == set(d)
        for k in d:
            assert m[k]["n"] == d[k]["n"]
            assert m[k]["vmin"] == d[k]["vmin"]
            assert m[k]["vmax"] == d[k]["vmax"]
            assert abs(m[k]["total"] - d[k]["total"]) < 1e-6
            assert abs(m[k]["stddev"] - d[k]["stddev"]) < 1e-9

    def test_merge_is_associative_and_handles_new_keys(self, spark):
        from pyspark.sql import functions as F

        from sdg_big_data_spark.streaming import incremental as inc

        a = spark.createDataFrame([(1, 2.0), (1, 4.0)], "k long, v double")
        b = spark.createDataFrame([(2, 10.0)], "k long, v double")  # new key
        c = spark.createDataFrame([(1, 6.0), (2, 20.0)], "k long, v double")
        sa, sb, sc = (inc.agg_state(x, ["k"], "v") for x in (a, b, c))
        left = inc.merge_agg_states(
            inc.merge_agg_states(sa, sb, keys=["k"]), sc, keys=["k"]
        )
        right = inc.merge_agg_states(
            sa, inc.merge_agg_states(sb, sc, keys=["k"]), keys=["k"]
        )
        fl = {r["k"]: r for r in inc.finalize_agg(left, ["k"]).collect()}
        fr = {r["k"]: r for r in inc.finalize_agg(right, ["k"]).collect()}
        assert fl.keys() == fr.keys() == {1, 2}
        assert fl[1]["n"] == 3 and fl[1]["mean"] == 4.0
        assert fl[2]["n"] == 2 and fl[2]["total"] == 30.0
        for k in fl:
            assert fl[k]["stddev"] == fr[k]["stddev"]

    def test_single_value_group_has_null_stddev(self, spark):
        from sdg_big_data_spark.streaming import incremental as inc

        df = spark.createDataFrame([(1, 5.0)], "k long, v double")
        out = inc.finalize_agg(inc.agg_state(df, ["k"], "v"), ["k"]).collect()
        assert out[0]["stddev"] is None  # n-1 guard, not a NaN/div0
