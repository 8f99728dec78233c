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


def psi_monitor_batch(
    batch: DataFrame,
    batch_id: int,
    ref,
    value_col: str,
    out_dir: str,
    bins: int = 10,
    alert_psi: float | None = None,
) -> None:
    """One micro-batch of :func:`streaming_psi_monitor` — the NUMERIC
    sibling of :func:`drift_monitor_batch` (same per-batch contract,
    same idempotent ``batch_id=<id>`` hive-partition sink): the batch's
    ``value_col`` distribution is PSI-scored against the pinned
    reference's exact decile bins.

    ``ref`` is either a pre-materialized
    :func:`~..operators.quality.psi_reference_model` (edges + per-bin
    counts — what :func:`streaming_psi_monitor` passes, computed ONCE
    outside ``foreachBatch``) or a reference DataFrame, materialized
    here per call (the directly-testable batch contract). Scoring is
    :func:`~..operators.quality.psi_from_model` — one narrow
    literal-binned pass over the batch, value-identical to the batch
    ``psi_drift`` gate by construction.

    ``alert_psi``: the scorecard-monitoring page threshold on TOTAL PSI
    (rule of thumb: 0.1 watch, 0.25 page)."""
    from ..operators.quality import psi_from_model, psi_reference_model

    if isinstance(ref, DataFrame):
        ref = psi_reference_model(ref, value_col, bins=bins)
    drift = psi_from_model(batch, ref, value_col)
    total = drift.agg(F.sum("psi_term").alias("__psi_total"))
    out = drift.crossJoin(F.broadcast(total))
    if alert_psi is not None:
        out = out.withColumn(
            "alert", F.col("__psi_total") > F.lit(float(alert_psi))
        )
    (
        out.withColumnRenamed("__psi_total", "psi_total")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/batch_id={batch_id}")
    )


def streaming_psi_monitor(
    stream: DataFrame,
    ref: DataFrame,
    value_col: str,
    out_dir: str,
    checkpoint_dir: str,
    bins: int = 10,
    alert_psi: float | None = None,
    trigger_available_now: bool = True,
):
    """Continuous NUMERIC-distribution drift monitoring: every
    micro-batch's ``value_col`` is PSI-compared against the PINNED
    reference frame over the reference's exact decile edges — the
    gate a production scorecard monitor pages on, next to
    :func:`streaming_drift_monitor`'s categorical chi-square.

    The reference is materialized ONCE here — edges + per-bin counts
    via :func:`~..operators.quality.psi_reference_model`, both ≤ bins
    rows — and every micro-batch bins against those LITERALS. The first
    form called the full batch gate per micro-batch, which re-ranked
    the reference corpus every trigger and leaked one un-released rank
    checkpoint + cache registration per batch on a continuous stream.
    State: none in executors; the sink is idempotent per batch id.
    Returns the started StreamingQuery."""
    from ..operators.quality import psi_reference_model

    model = psi_reference_model(ref, value_col, bins=bins)

    def _process(batch: DataFrame, batch_id: int) -> None:
        psi_monitor_batch(
            batch, batch_id, model, value_col, out_dir, bins, alert_psi
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def constraint_monitor_batch(
    batch: DataFrame,
    batch_id: int,
    constraints: list[tuple],
    out_dir: str,
) -> None:
    """One micro-batch of :func:`streaming_constraint_monitor` — the
    VERIFICATION sibling of the drift monitors (same per-batch
    contract, same idempotent ``batch_id=<id>`` hive-partition sink):
    the declarative Deequ-style suite
    (:func:`~..operators.quality.constraint_suite`) evaluated on the
    batch frame verbatim, one row per constraint plus the batch-level
    ``all_passed`` gate column a circuit breaker trips on (quarantine
    the batch / halt the feed when a hard constraint fails — the
    standard ingestion guard in front of a 100 TB/day lake)."""
    from ..operators.quality import constraint_suite

    res = constraint_suite(batch, constraints)
    gate = res.agg(F.min("passed").alias("__all"))
    out = res.crossJoin(F.broadcast(gate)).withColumnRenamed(
        "__all", "all_passed"
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")


def streaming_constraint_monitor(
    stream: DataFrame,
    constraints: list[tuple],
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuous declarative data-quality verification: every
    micro-batch is scored against the same constraint suite the batch
    gate uses (``dq_constraints``), appending per-constraint metrics +
    pass flags under the batch's own partition. All metrics are
    mergeable single-pass aggregates, so the per-batch cost is one
    map-side-combined pass over the batch — no state in executors, no
    reference frame to pin; the sink is idempotent per batch id.
    Returns the started StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        constraint_monitor_batch(batch, batch_id, constraints, out_dir)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
