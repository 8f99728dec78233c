"""Stream-static enrichment + idempotent merge sink — the two
continuous-ingest patterns the windowed/dedup modules don't cover:

- **Stream-static join**: every micro-batch joins against the CURRENT
  contents of a static dimension frame. Structured Streaming re-evaluates
  the static side per micro-batch, so a slowly-changing dimension that is
  periodically overwritten in place (admin tables, tz lookups — the
  frames the reference broadcast-joins in batch,
  `geocode_stop_locations.scala:82`, `tz_offset.scala:27`) is picked up
  without restarting the query.
- **foreachBatch key-merge sink**: at-least-once micro-batch delivery
  (replays after failure) made exactly-once-per-key at the TARGET by
  anti-joining each batch against the keys already written.

Scale notes: the enrich join is broadcast-hinted (dimension contract —
same rationale as operators/joins.broadcast_join); the merge sink's
anti-join reads only the target's key columns (parquet column pruning),
so the probe cost is keys-not-rows. On an ACID table format the merge is
`MERGE INTO` (environment-limited here — COVERAGE.md "Delta
availability"); the parquet form keeps the identical contract under a
single-writer assumption (one streaming query owns the target path —
Spark's checkpoint mechanism already requires this).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension frame (broadcast hash
    join per micro-batch). ``how`` is left/inner — stream-side outer
    retains events whose dimension row hasn't landed yet (the
    late-dimension case); re-running a batch backfill later heals them,
    the same contract as the reference's periodic reprocess."""
    return stream.join(F.broadcast(dim), on, how)


def foreach_batch_key_merge(
    stream: DataFrame,
    target_path: str,
    key_cols: Sequence[str],
    checkpoint_path: str,
):
    """Drive a stream into a parquet target keeping FIRST-arrival rows
    per key: each micro-batch drops intra-batch duplicates, anti-joins
    the keys already in the target, and appends only the remainder —
    idempotent under micro-batch replay (a replayed batch's keys are all
    in the target, so it appends nothing).

    Uses ``availableNow`` (process everything currently available, then
    stop) — the incremental-batch cadence of the reference's append
    pipeline, with Spark's checkpoint replacing its hand-rolled
    last-date bookkeeping."""
    keys = list(key_cols)

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(keys)
        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path).select(*keys)
            fresh = fresh.join(existing, keys, "left_anti")
        fresh.write.mode("append").parquet(target_path)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
