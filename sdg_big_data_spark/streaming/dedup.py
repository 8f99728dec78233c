"""Streaming deduplication — the continuous-ingest arm of the dedup
family (`operators/dedup.py` is the batch form).

A training-data pipeline that ingests a document feed needs dedup AT
INGEST, not just in batch reprocessing: the same article arrives from
multiple crawls/mirrors minutes apart. The Spark-native operator is
``dropDuplicatesWithinWatermark`` — unlike plain ``dropDuplicates`` on
a stream (whose key state grows forever, an unbounded-memory plan), the
watermark bounds state to the late-arrival window: a key's state is
evicted once the event-time watermark passes it, so state size tracks
the ingest RATE times the window, not corpus history. That is the only
formulation that survives an unbounded 100 TB/day feed.

Content dedup reuses the batch fingerprint (`text.doc_fingerprint`:
md5 over the normalized token stream) so a document deduped in the
stream is EXACTLY the document the batch `d_exact_dedup` would collapse
— stream and batch agree on identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def streaming_key_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key emission within the watermark window.

    Keeps the first arrival of each key; duplicates arriving within
    ``watermark`` of event time are suppressed; state for a key is
    dropped once the watermark passes, bounding memory. (A duplicate
    arriving LATER than the watermark re-emits — the same contract as
    the reference's bounded 2-day overlap rewind, where older dups are
    handled by the periodic batch pass.)"""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_content_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-identity dedup on the ingest stream: fingerprint =
    ``text.doc_fingerprint`` (md5 of the normalized token stream — the
    identical key the batch ``d_exact_dedup`` groups on), then
    watermark-bounded first-arrival dedup on the fingerprint."""
    fp = stream.withColumn("__fp", T.doc_fingerprint(F.col(text_col)))
    return streaming_key_dedup(fp, ["__fp"], ts_col, watermark).drop("__fp")


def index_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> None:
    """One micro-batch of :func:`streaming_index_dedup` — module-level so
    the idempotence contract is directly testable: calling it twice with
    the same ``batch_id`` (a foreachBatch RETRY after a committed write
    but failed checkpoint advance) must leave the index identical.

    The retry-critical step is EXCLUDING the batch's own
    ``ingest_batch=<id>`` partition from the standing-index read: a
    retry after a successful write otherwise sees the batch's docs
    already in the index, statuses every one of them ``exact_dup``
    against itself, and the overwrite then ERASES the batch from the
    index (data loss, the opposite of idempotence)."""
    from ..operators import dedup as batch_dedup

    spark = batch.sparkSession
    keep_min = batch_dedup.exact_dedup(batch, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    self_deduped = batch.join(keep_min, id_col, "left_semi")
    try:
        # basePath keeps the hive-style ingest_batch partition column
        # visible so the batch's OWN prior write (a retry) can be
        # filtered out — partition pruning drops that subdir at the scan
        index = (
            spark.read.option("basePath", index_dir)
            .parquet(index_dir)
            .where(F.col("ingest_batch") != F.lit(int(batch_id)))
            .select(id_col, text_col)
        )
        have_index = index.limit(1).count() > 0
    except Exception:
        have_index = False
    if have_index:
        status = batch_dedup.incremental_dedup(
            self_deduped, index, id_col, text_col, threshold
        )
        kept_ids = status.where(F.col("status") == "kept").select(id_col)
        kept = self_deduped.join(kept_ids, id_col, "left_semi")
    else:
        kept = self_deduped
    (
        kept.select(id_col, text_col)
        .write.mode("overwrite")
        .parquet(f"{index_dir}/ingest_batch={batch_id}")
    )


def streaming_index_dedup(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    trigger_available_now: bool = True,
):
    """Continuous-ingest NEAR-dup dedup against a growing parquet index —
    the streaming arm of ``operators.dedup.incremental_dedup``. Each
    micro-batch:

    1. self-dedups WITHIN the batch (exact fingerprint, keep min id —
       within-batch near-dups are out of scope, matching
       ``incremental_dedup``'s contract);
    2. statuses the remainder against the standing index (exact
       fingerprint semi-join, then cross-corpus LSH banding + Jaccard
       verify — never index x index);
    3. appends the ``kept`` docs to the index under a
       ``ingest_batch=<id>`` subdirectory, written with overwrite — a
       foreachBatch RETRY of the same batch id rewrites the same
       directory, so the index never double-counts (idempotent sink).
       The index read EXCLUDES the batch's own partition, so a retry
       never statuses the batch against its own prior write (see
       :func:`index_dedup_batch`, where the contract is tested).

    State lives entirely in the parquet index (id + text); nothing is
    held in executor memory between batches. At 100 TB the two index
    derivatives the batch operator recomputes per micro-batch
    (fingerprints, band frames) are the things to additionally persist —
    see ``incremental_dedup``'s docstring; this wrapper keeps the
    oracle-checkable raw-text form.

    Returns the started StreamingQuery.
    """
    def _process(batch: DataFrame, batch_id: int) -> None:
        index_dedup_batch(
            batch, batch_id, index_dir, id_col, text_col, threshold
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
