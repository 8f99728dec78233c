"""Streaming curation ladder: planted-document end-to-end — junk and
off-language docs never reach the index, exact and near duplicates are
suppressed ACROSS micro-batch boundaries, and a re-run of the same
batch is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_big_data_spark.streaming.curation import streaming_curation

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and that is a fine "
    "thing for everyone to see in the morning with coffee and the news"
)
GOOD_EN_2 = (
    "a completely different english document that is long enough to "
    "pass the quality gate and talks about the weather and the harvest "
    "of the year with plenty of common words in it for the classifier"
)
NEAR_DUP_OF_GOOD = (
    "the quick brown fox jumps over the lazy dog and that is a fine "
    "thing for everyone to see in the morning with coffee and the press"
)
OFF_LANG = (
    "el zorro marrón salta sobre el perro perezoso y es una cosa que "
    "todos los vecinos de la ciudad pueden ver por la mañana con café"
)
JUNK = "x" * 400  # one giant token: fails token-shape quality heuristics


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, index, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming_curation(stream, index, ckpt, threshold=0.5)
    q.awaitTermination()


def test_streaming_curation_ladder(spark, tmp_path):
    src = str(tmp_path / "src")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: a keeper, an off-language doc, junk, and an exact dup
    _write_batch(
        spark,
        src,
        [(1, GOOD_EN), (2, OFF_LANG), (3, JUNK), (4, GOOD_EN)],
    )
    _run(spark, src, index, ckpt)
    ids = {r["doc_id"] for r in spark.read.parquet(index).collect()}
    assert ids == {1}, ids  # min-id exact-dup survivor; junk/offlang gone

    # batch 2: a near dup of the indexed doc, and a fresh keeper
    _write_batch(spark, src, [(10, NEAR_DUP_OF_GOOD), (11, GOOD_EN_2)])
    _run(spark, src, index, ckpt)
    ids = {r["doc_id"] for r in spark.read.parquet(index).collect()}
    assert ids == {1, 11}, ids  # near dup suppressed ACROSS batches

    # idempotence: re-running with no new files changes nothing
    _run(spark, src, index, ckpt)
    ids = {r["doc_id"] for r in spark.read.parquet(index).collect()}
    assert ids == {1, 11}, ids
