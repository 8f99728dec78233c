"""Incremental-append protocol — SURVEY.md §2.11.

The reference's only streaming-shaped capability: the pipeline re-runs
every 10 days, discovers the last processed date partition
(`stop_locations_append.py:30-32`), rewinds 2 days to reprocess the
overlap — a manual watermark for late/boundary data (`:83-86`) — pushes
the time range into the scan (`:91`), and unions old + new with
re-clustering (`:128-132`).

Engine form: a first-class operator over date-partitioned parquet.
Dedup of the overlap region is deterministic (row_number by a declared
key + ordering, not "whichever file wins"). The optional Structured
Streaming wrapper runs the same transformation with
``trigger(availableNow=True)`` for exactly-once file discovery at scale.

Scale notes: state discovery reads only partition METADATA (no data
scan); the overlap re-read is bounded by the watermark window; the
append write touches only new date partitions (dynamic partition
overwrite), so a 100 TB table costs one day-slice per run, not a
rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_processed_date(spark: SparkSession, path: str, date_col: str = "date"):
    """Discover the max date partition of a partitioned parquet table —
    directory listing only, no data read (mirrors
    `stop_locations_append.py:30-32`)."""
    if not os.path.exists(path):
        return None
    parts = [
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith(f"{date_col}=")
    ]
    return max(parts) if parts else None


def incremental_append(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    date_col: str,
    key_cols: list[str],
    order_cols: list[str],
    overlap_days: int = 2,
) -> DataFrame:
    """Append new data to a date-partitioned table with overlap reprocess.

    1. discover last processed date (partition metadata);
    2. re-read the overlap window [last - overlap_days, last] from the
       target and union with source rows >= the overlap start — the
       manual watermark (`stop_locations_append.py:83-86`);
    3. deterministic dedup on ``key_cols`` (keep first by ``order_cols``);
    4. dynamic-partition overwrite of ONLY the affected date partitions.

    Returns the deduplicated increment that was written.
    """
    last = last_processed_date(spark, target_path, date_col)
    src = source.withColumn(date_col, F.to_date(date_col))
    if last is None:
        increment = src
    else:
        overlap_start = F.date_sub(F.lit(last).cast("date"), overlap_days)
        new_rows = src.where(F.col(date_col) >= overlap_start)
        existing = (
            spark.read.parquet(target_path)
            .withColumn(date_col, F.to_date(date_col))
            .where(F.col(date_col) >= overlap_start)
        )
        increment = new_rows.unionByName(existing)

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    deduped = (
        increment.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    (
        deduped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(date_col)
        .parquet(target_path)
    )
    return deduped


def available_now_stream(
    spark: SparkSession,
    source_path: str,
    transform,
    target_path: str,
    checkpoint_path: str,
    schema=None,
):
    """Structured Streaming wrapper: process all currently-available files
    exactly once (``trigger(availableNow=True)``) through ``transform``,
    append to parquet. File-discovery state lives in the checkpoint — the
    idiomatic replacement for the reference's by-hand file bookkeeping
    (`deployment_ONNX_bert.py:174-191`)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(source_path)
    out = transform(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# --- incremental aggregate-state maintenance --------------------------------
#
# The other half of the incremental protocol: `incremental_append` keeps
# the FACT table up to date; these keep a ROLLUP up to date without ever
# rescanning history. State rows are a commutative monoid
# (cnt, sum, min, max, sumsq per key), so
#
#   state(full corpus) == merge(state(history), state(new batch))
#
# holds exactly, and the nightly cost is one batch-sized pass + a
# state-sized merge — at 100 TB the difference between minutes and a
# full recompute. Identical to what Spark's partial aggregation does
# WITHIN a query, lifted to a persistable cross-run artifact (and the
# same mergeability contract as the HLL/Theta/KLL sketch rollups in
# operators/relational.py, here for the exact algebraic aggregates).


def agg_state(df, keys, value_col: str):
    """Mergeable per-key aggregate state for ``value_col``:
    (keys…, cnt, sum, min, max, sumsq). One map-side-combined shuffle."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.count(v).alias("cnt"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.sum(v * v).alias("sumsq"),
    )


def merge_agg_states(*states, keys):
    """Merge any number of state frames: union + one state-sized
    re-aggregation (sum/sum/min/max/sum — every column a monoid)."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.sum("sumsq").alias("sumsq"),
    )


def finalize_agg(state, keys):
    """Finish a state frame into the user-facing aggregates. Variance
    from moments ((sumsq − sum²/n)/(n−1)) — algebraically exact and
    REPLAYABLE from persisted state; for direct one-shot variance at
    extreme magnitudes prefer the built-in (Welford) path."""
    from pyspark.sql import functions as F

    n = F.col("cnt")
    var = F.when(
        n > 1,
        (F.col("sumsq") - F.col("sum") * F.col("sum") / n) / (n - 1),
    )
    return state.select(
        *keys,
        n.alias("n"),
        F.col("sum").alias("total"),
        (F.col("sum") / n).alias("mean"),
        F.col("min").alias("vmin"),
        F.col("max").alias("vmax"),
        F.sqrt(var).alias("stddev"),
    )
