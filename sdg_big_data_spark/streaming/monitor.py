"""Streaming data-quality monitoring — the continuous-ingest arm of the
``dq_*`` gates (``operators/quality.py`` holds the batch forms).

A 100 TB/day feed does not get re-profiled nightly; drift has to be
caught AT ingest, per micro-batch, against a pinned reference window.
``streaming_drift_monitor`` reuses the batch chi-square gate VERBATIM
inside ``foreachBatch`` — stream and batch agree on the statistic by
construction (the parity test drives the same rows through both paths),
the same reuse discipline as ``streaming/curation.py`` and
``streaming/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drift_monitor_batch(
    batch: DataFrame,
    batch_id: int,
    ref: DataFrame,
    cat_col: str,
    out_dir: str,
    alert_chi2: float | None = None,
) -> None:
    """One micro-batch of :func:`streaming_drift_monitor` — module-level
    so the per-batch contract is directly testable (the
    ``index_dedup_batch`` pattern). Appends one row per category under
    ``batch_id=<id>`` (hive layout → idempotent on foreachBatch retry:
    a re-run of the same batch id overwrites its own partition only).

    ``alert_chi2``: when set, an ``alert`` column marks batches whose
    TOTAL chi-square statistic exceeds it (Σ terms ~ χ²(k−1) under no
    drift) — the threshold a production monitor pages on."""
    from ..operators.quality import chi2_categorical_drift

    drift = chi2_categorical_drift(ref, batch, cat_col)
    total = drift.agg(F.sum("chi2_term").alias("__chi2_total"))
    out = drift.crossJoin(F.broadcast(total))
    if alert_chi2 is not None:
        out = out.withColumn(
            "alert", F.col("__chi2_total") > F.lit(float(alert_chi2))
        )
    (
        out.withColumnRenamed("__chi2_total", "chi2_total")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/batch_id={batch_id}")
    )


def streaming_drift_monitor(
    stream: DataFrame,
    ref: DataFrame,
    cat_col: str,
    out_dir: str,
    checkpoint_dir: str,
    alert_chi2: float | None = None,
    trigger_available_now: bool = True,
):
    """Continuous categorical-drift monitoring: every micro-batch's
    ``cat_col`` mix is chi-square-compared against the PINNED reference
    frame (``operators.quality.chi2_categorical_drift`` — the exact
    batch gate, not a reimplementation), and the per-category drift
    rows land under ``out_dir/batch_id=<id>``.

    The reference histogram is computed fresh per batch from ``ref`` —
    at scale, pass a pre-aggregated/persisted reference (it is
    category-sized) rather than a raw corpus frame. State: none held in
    executors; the sink is idempotent per batch id (hive partition
    overwrite). Returns the started StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        drift_monitor_batch(batch, batch_id, ref, cat_col, out_dir, alert_chi2)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
