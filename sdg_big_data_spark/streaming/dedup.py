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
