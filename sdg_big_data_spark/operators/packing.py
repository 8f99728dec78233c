"""Sequence packing plan — the pretraining layout stage of an LLM data
pipeline: concatenate every document's tokens per shard and chop into
fixed-capacity context windows (the standard "pack then split at window
boundaries" regime). The PLAN is computed distributed and exactly: each
document learns which window its tokens start and end in, and at what
offset — the actual token materialization then happens shard-locally in
the tokenizer job, with no global coordination.

Scalable by construction: the only non-narrow step is the grouped prefix
sum over token counts (:func:`~..operators.windows.grouped_prefix_sum` —
range shuffle + narrow Arrow cumsum + broadcast offsets), so one shard
being most of the corpus never becomes a single sort partition. All
window arithmetic is integer expressions — exact in any engine, so the
whole plan is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .windows import grouped_prefix_sum


def pack_plan(
    docs: DataFrame,
    capacity: int,
    shard_cols: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing coordinates under contiguous concatenation
    in deterministic (shard, id) order:

    - ``n_tokens`` — the document's token count;
    - ``first_bin`` / ``bin_offset`` — the context window its first
      token lands in, and the offset within that window;
    - ``last_bin`` — the window holding its final token (documents
      spanning window boundaries are split, the standard pretraining
      trade).

    Zero-token documents are excluded (they occupy no window).
    """
    shard_cols = shard_cols or ["source"]
    counts = docs.select(
        *shard_cols,
        id_col,
        F.size(T.tokenize(F.col(text_col))).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    summed = grouped_prefix_sum(
        counts,
        shard_cols,
        [F.col(id_col).asc()],
        "n_tokens",
        cum_col="__cum",
    )
    cum = F.col("__cum").cast("long")
    start = cum - F.col("n_tokens")
    return summed.select(
        *shard_cols,
        id_col,
        "n_tokens",
        F.floor(start / capacity).cast("long").alias("first_bin"),
        (start % capacity).cast("long").alias("bin_offset"),
        F.floor((cum - 1) / capacity).cast("long").alias("last_bin"),
    )
