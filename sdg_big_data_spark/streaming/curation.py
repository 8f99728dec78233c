"""Streaming corpus curation — the LLM dataprep ladder applied to a
continuous ingest: quality gate → language gate → within-batch exact
dedup → cross-batch near-dup statusing against the growing index.

The batch gates (``pipelines.dataprep.quality_gate`` /
``language_gate``) are stateless narrow projections, so they apply to a
streaming DataFrame UNCHANGED — the same oracle-checked expressions run
on both surfaces, which is the point: one curation definition, batch
backfill and streaming ingest guaranteed to agree. The only stateful
stage (cross-batch dedup) delegates to
:func:`~.dedup.streaming_index_dedup`'s idempotent foreachBatch sink,
whose state is the parquet index itself — no executor-memory state, no
watermark loss on restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..pipelines.dataprep import language_gate, quality_gate
from .dedup import streaming_index_dedup


def streaming_curation(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    keep_langs: tuple[str, ...] = ("en",),
    threshold: float = 0.8,
    trigger_available_now: bool = True,
):
    """Run the full curation ladder over a document stream; returns the
    started StreamingQuery. Surviving (quality-pass, language-pass,
    non-duplicate) docs accumulate in ``index_dir`` — the continuously
    curated corpus.
    """
    gated = language_gate(
        quality_gate(stream, text_col=text_col, min_score=min_quality),
        text_col=text_col,
        keep_langs=keep_langs,
    ).select(id_col, text_col)
    return streaming_index_dedup(
        gated,
        index_dir,
        checkpoint_dir,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        trigger_available_now=trigger_available_now,
    )
