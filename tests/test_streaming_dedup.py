"""Streaming dedup: stream-vs-batch parity (the stream's surviving key
set equals batch dedup's) and the bounded-state contract.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sdg_big_data_spark.functions import text as T
from sdg_big_data_spark.streaming.dedup import (
    streaming_content_dedup,
    streaming_key_dedup,
)


def _docs_with_dups(spark, path):
    t0 = dt.datetime(2021, 1, 1, 12, 0, 0)
    rows = []
    for i in range(60):
        body = f"document body number {i % 20} with shared content"
        rows.append((i, t0 + dt.timedelta(minutes=i), body))
    df = spark.createDataFrame(rows, schema="doc_id long, ts timestamp, text string")
    df.repartition(4).write.mode("overwrite").parquet(path)
    return df


def test_streaming_content_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = _docs_with_dups(spark, src)

    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        src
    )
    deduped = streaming_content_dedup(stream, "text", "ts", watermark="2 hours")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    # 20 distinct bodies; exactly one survivor per content fingerprint
    assert got.count() == 20
    stream_fps = {
        r["fp"]
        for r in got.select(T.doc_fingerprint(F.col("text")).alias("fp")).collect()
    }
    batch_fps = {
        r["fp"]
        for r in batch.select(
            T.doc_fingerprint(F.col("text")).alias("fp")
        ).distinct().collect()
    }
    assert stream_fps == batch_fps  # stream and batch agree on identity


def test_streaming_key_dedup_first_arrival_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2021, 1, 1, 0, 0, 0)
    rows = [
        (k, t0 + dt.timedelta(minutes=m), f"payload-{k}-{m}")
        for k in range(5)
        for m in range(4)  # 4 duplicate arrivals per key, minutes apart
    ]
    spark.createDataFrame(
        rows, schema="k long, ts timestamp, payload string"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("k long, ts timestamp, payload string").parquet(
        src
    )
    q = (
        streaming_key_dedup(stream, ["k"], "ts", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 5  # one row per key
    assert {r["k"] for r in got.collect()} == set(range(5))


def test_streaming_dedup_plan_is_watermark_bounded(spark):
    """The physical plan must carry the watermark-bounded dedup operator
    (bounded state), not the unbounded stream dropDuplicates."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withColumnRenamed("timestamp", "ts")
    )
    deduped = streaming_key_dedup(stream, ["value"], "ts", watermark="10 minutes")
    plan = deduped.explain(extended=True) or deduped._jdf.queryExecution().toString()
    assert "dropDuplicatesWithinWatermark" in plan.lower().replace(" ", "") or (
        "deduplicatewithinwatermark" in plan.lower().replace(" ", "")
    )


def test_streaming_index_dedup_grows_index_without_dups(spark, tmp_path):
    """Two micro-batches through the index-dedup sink: batch 2's exact
    copy and near copy of batch-1 docs are rejected, novel docs land in
    the index; final index equals what batch incremental_dedup would
    keep."""
    from sdg_big_data_spark.streaming.dedup import streaming_index_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to find some food for the long cold winter that is coming soon"
    )
    other = (
        "a completely different indexed document about spark planning "
        "and adaptive query execution at large scale in production"
    )
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2021, 1, 1, 12, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, t0, base), (2, t0, other), (3, t0, base)],  # 3 = in-batch exact dup
        "doc_id long, ts timestamp, text string",
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src)
    q = streaming_index_dedup(
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src),
        idx, ckpt, threshold=0.5,
    )
    q.awaitTermination()
    after1 = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert after1 == {1, 2}  # in-batch exact dup 3 dropped

    batch2 = spark.createDataFrame(
        [
            (10, t0, base + " http://t.example/q"),  # exact dup of indexed 1
            (11, t0, base.replace("cold winter", "cold dark winter")),  # near dup
            (12, t0, "entirely novel content with no overlap whatsoever "
                     "in any shingle of the existing corpus documents"),
        ],
        "doc_id long, ts timestamp, text string",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    q = streaming_index_dedup(
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src),
        idx, ckpt, threshold=0.5,
    )
    q.awaitTermination()
    after2 = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert after2 == {1, 2, 12}  # 10 exact-dup, 11 near-dup both rejected


def test_index_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch retry contract (ADVICE r4, high): re-invoking the
    batch processor with the SAME batch_id after a committed write — the
    retry-after-failed-checkpoint-commit case — must leave the index
    unchanged. Before the fix, the retry read the batch's own
    ingest_batch partition back as 'the index', statused every doc as an
    exact dup of itself, and the overwrite ERASED the batch's docs."""
    from sdg_big_data_spark.streaming.dedup import index_dedup_batch

    t0 = dt.datetime(2021, 1, 1, 12, 0, 0)
    idx = str(tmp_path / "idx")
    doc_a = (
        "alpha document with some real content about distributed query "
        "engines and their shuffle behavior at large scale"
    )
    doc_b = (
        "beta document covering a wholly different topic of sampling "
        "strategies for stratified survey estimation pipelines"
    )
    b0 = spark.createDataFrame(
        [(1, t0, doc_a), (2, t0, doc_b)],
        "doc_id long, ts timestamp, text string",
    )
    index_dedup_batch(b0, 0, idx, threshold=0.5)
    after_first = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(idx).collect()
    )
    assert [d for d, _ in after_first] == [1, 2]

    # retry of the SAME batch id: index must be byte-identical after
    index_dedup_batch(b0, 0, idx, threshold=0.5)
    after_retry = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(idx).collect()
    )
    assert after_retry == after_first

    # a LATER batch still dedups against batch 0's docs (the partition
    # exclusion is scoped to the batch's own id, not the whole index)
    b1 = spark.createDataFrame(
        [(10, t0, doc_a), (11, t0, "novel gamma content entirely new "
                                   "tokens nothing shared with the index")],
        "doc_id long, ts timestamp, text string",
    )
    index_dedup_batch(b1, 1, idx, threshold=0.5)
    ids = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
    assert ids == {1, 2, 11}
    # and retrying batch 1 changes nothing either
    index_dedup_batch(b1, 1, idx, threshold=0.5)
    ids2 = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
    assert ids2 == {1, 2, 11}
