"""Writers — SURVEY.md §2.1 S6-S9, S13.

Reference parity: partitioned overwrite (`tz_offset.scala:28`), parquet
append (`select_tweets_containing_ngrams.py:136`), single-file CSV export
(`compute_share_top_tweets_containing_ngram.py:107-108`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 — plain parquet sink."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """S6 — partitioned write (the reference uses Delta `partitionBy("date")`;
    parquet partitioning is the portable equivalent — partition pruning on
    read works the same way).

    Scale note: at 100 TB, date-partitioned layout is what makes the
    incremental-append protocol (streaming/incremental.py) and every
    date-range query prune to a handful of partitions instead of a full
    scan.
    """
    if fmt == "delta" and not _delta_available(df.sparkSession):
        raise RuntimeError(
            "Delta Lake is not available in this environment (no delta-spark "
            "module / delta JVM classes — probed, see COVERAGE.md 'Delta "
            "availability'). Use fmt='parquet' (same partition-pruning "
            "semantics) or run on a cluster with delta-spark installed."
        )
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def _delta_available(spark: SparkSession) -> bool:
    """True iff the Delta Lake classes are loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("io.delta.sql.DeltaSparkSessionExtension")
        return True
    except Exception:
        return False


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S9 — `coalesce(1)` CSV export for small result tables ONLY.

    coalesce(1) funnels everything through one task; the engine restricts
    it to post-aggregation outputs (the reference does the same — exports
    are final indicator tables).
    """
    df.coalesce(1).write.option("header", str(header).lower()).mode("overwrite").csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle: each bucket file pair joins independently, so the
    Exchange disappears from the plan (see
    test_plans.test_bucketed_join_has_no_shuffle). At 100 TB this is the
    difference between re-shuffling both fact tables on every join and
    paying the clustering cost once at write time. ``sort_cols`` adds
    within-bucket ordering (sort-merge joins skip the sort too).
    ``path`` makes it an external table (no warehouse dependency).
    """
    w = df.write.bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.mode(mode).format("parquet").saveAsTable(table_name)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Interleaved-bit (Morton / Z-order) sort key over ``cols``.

    Each column is min/max-normalized to ``bits`` bits, then the bits are
    interleaved — rows close in the key are close in EVERY column, so
    files/row-groups written in key order carry tight min/max footer
    stats on all ``cols`` simultaneously and multi-column range
    predicates skip most of the table (the effect Delta's
    ``OPTIMIZE ZORDER BY`` buys; same technique, parquet-native).
    Pure shift/and/or expressions — whole-stage codegen, no Python.

    Returns (key Column, stats Row) — stats is the one collected min/max
    row (dimension-sized: 2 doubles per column).
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    terms = []
    for ci, c in enumerate(cols):
        lo, hi = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        rng = (hi - lo) if (hi is not None and lo is not None) else 0.0
        if rng and rng > 0:
            scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(rng) * F.lit(top)
        else:
            scaled = F.lit(0.0)
        q = F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(top)
        )
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + ci
                )
            )
    key = terms[0]
    for t in terms[1:]:
        key = key + t  # bit positions are disjoint: sum == bitwise-or
    return key, stats


def optimize_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    zorder_cols: list[str] | None = None,
) -> None:
    """S14 — compaction (`tz_offset.scala:32` runs Delta ``OPTIMIZE``).

    On plain parquet: rewrite EACH leaf partition directory independently,
    coalesced toward ``target_file_mb`` files — the Hive layout
    (``date=.../part-*.parquet``) is untouched, so partition pruning and
    the incremental-append protocol's ``last_processed_date()`` keep
    working after compaction (a whole-table rewrite would flatten the
    ``date=`` directories away). Small-file proliferation is the #1
    silent killer of 100 TB scans (listing + task-per-file overhead). On
    Delta/Iceberg deployments, swap for the native OPTIMIZE/rewrite
    action — same contract.

    ``zorder_cols`` additionally clusters each rewritten leaf by the
    interleaved-bit key (:func:`zorder_key`) — ``repartitionByRange`` on
    the key plus within-file sort, so every output file covers a small
    hyper-rectangle of the column space and parquet footer stats prune
    multi-column range predicates (Delta's ``OPTIMIZE ZORDER BY``
    analogue). A z-ordered leaf is rewritten even when already compact:
    clustering, not file count, is the point.
    """
    import glob
    import shutil

    from pyspark.sql import functions as F

    leaf_dirs = sorted(
        {
            os.path.dirname(f)
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        }
    )
    for d in leaf_dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        size_b = sum(os.path.getsize(f) for f in files)
        n_files = int(max(1, size_b // (target_file_mb * 1024 * 1024)))
        if len(files) <= n_files and not zorder_cols:
            continue  # already compact enough
        # Reading the leaf dir drops the partition-column values, but they
        # live in the directory NAME, which is preserved by the rename —
        # a table-level read re-derives them from the path as before.
        df = spark.read.parquet(d)
        if zorder_cols:
            key, _ = zorder_key(df, zorder_cols)
            df = (
                df.withColumn("__z", key)
                .repartitionByRange(n_files, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            writer = df.write
        else:
            writer = df.coalesce(n_files).write
        tmp = d.rstrip("/") + "__compacted"
        writer.mode("overwrite").parquet(tmp)
        shutil.rmtree(d)
        os.rename(tmp, d)


def convert_format(
    spark: SparkSession, src: str, dst: str, src_fmt: str = "orc", dst_fmt: str = "parquet"
) -> None:
    """S13 — format conversion job (`convert_orc_to_parquet.py:27-29`)."""
    spark.read.format(src_fmt).load(src).write.mode("overwrite").format(dst_fmt).save(dst)
