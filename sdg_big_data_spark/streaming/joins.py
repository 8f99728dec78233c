"""Stream-stream joins — the remaining Structured Streaming join shape.

`streaming/enrich.py` covers stream-STATIC enrichment (broadcast dim
join); this module covers stream-STREAM: correlating two live event
feeds (click→purchase attribution, request→response latency pairing).

The non-negotiable scale constraint: an unbounded stream-stream join
must bound its state. Spark does that with (a) watermarks on BOTH
sides and (b) a time-range join condition, from which the planner
derives each side's state-retention window (see the Structured
Streaming guide, "Inner Joins with optional Watermarking"). Omit
either and state grows forever — this module's constructors make both
mandatory rather than optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_pair_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    arriving within ``(left_ts, left_ts + max_delay]`` — the
    click→purchase attribution shape.

    State bound: the left side retains rows for
    ``right_watermark + max_delay`` of event time; the right side for
    ``left_watermark``. Both watermarks are REQUIRED (this function
    always applies them); on a batch DataFrame the same plan runs
    stateless, which is what the batch/stream parity test exploits.

    Column contract: ``left`` and ``right`` must have disjoint column
    names apart from ``key`` (rename upstream; streaming joins cannot
    alias around ambiguity after state is keyed).

    ``how``: 'inner', or 'leftOuter' for "left events with no match
    within the window" semantics (nulls emitted only once the right
    watermark passes left_ts + max_delay — i.e. when a match is
    provably impossible).
    """
    l_src = (
        left.withWatermark(left_ts, left_watermark)
        if left.isStreaming
        else left
    )
    r_src = (
        right.withWatermark(right_ts, right_watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l_src.alias("l").join(r_src.alias("r"), cond, how)
    # de-duplicate the key column (present on both sides)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)


def run_stream_to_parquet(
    df: DataFrame, dst: str, checkpoint: str, mode: str = "append"
) -> None:
    """availableNow micro-batch run to a parquet sink (test/backfill
    harness — identical code path to a continuous deployment)."""
    (
        df.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", dst)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
