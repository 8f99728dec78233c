"""applyInPandasWithState sessionization: streamed chunks produce the
same closed sessions as the batch g_sessionize operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdg_big_data_spark.streaming.stateful import streaming_sessionize


@pytest.fixture(scope="module")
def session_events(spark):
    rows = []
    t0 = 1_700_000_000
    eid = 0
    for u in [1, 2]:
        # session A: 5 events 10 min apart; 2h gap; session B: 3 events
        for i in range(5):
            rows.append((u, t0 + i * 600, eid, 1.0)); eid += 1
        for i in range(3):
            rows.append((u, t0 + 2 * 3600 + 5 * 600 + i * 600, eid, 2.0)); eid += 1
    return spark.createDataFrame(
        rows, schema="user_id long, t long, event_id long, value double"
    ).withColumn("ts", F.timestamp_seconds("t"))


def _batch_sessions(df, gap_s=3600):
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    g = df.withColumn(
        "new_s",
        F.when(F.col("t") - F.lag("t").over(w) > gap_s, 1).otherwise(0),
    )
    ws = w.rowsBetween(Window.unboundedPreceding, 0)
    s = g.withColumn("sid", F.sum("new_s").over(ws))
    return s.groupBy("user_id", "sid").agg(
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
        (F.max("t") - F.min("t")).alias("duration"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def test_streaming_sessionize_matches_batch(spark, session_events, tmp_path):
    import time as _time

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    # two single-file chunks split by TIME mid-way through session B, with
    # distinct mtimes so the file source replays them in order (the
    # operator's documented in-order-arrival contract)
    cut = 1_700_000_000 + 2 * 3600 + 5 * 600 + 600
    session_events.where(F.col("t") < cut).coalesce(1).write.parquet(src + "/p1")
    _time.sleep(1.1)
    session_events.where(F.col("t") >= cut).coalesce(1).write.parquet(src + "/p2")

    stream = spark.readStream.schema(session_events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    out = streaming_sessionize(stream, gap_s=3600)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(dst)
    # closed sessions: the first session of each user (the second stays
    # open — no later event passed the gap, and no timeout fired in the
    # availableNow run)
    batch = _batch_sessions(session_events)
    first = batch.where(F.col("sid") == 0).drop("sid")
    got_rows = sorted(map(tuple, got.select(*first.columns).collect()))
    exp_rows = sorted(map(tuple, first.collect()))
    assert got_rows == exp_rows
