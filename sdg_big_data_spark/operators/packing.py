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
    from ..cachescope import scoped_cache

    # Generate barrier: where(n_tokens > 0) would otherwise push the
    # tokenizer into the Filter (2 evaluations/row — measured 73.9 s vs
    # 37.2 s barriered at the 100x fixture). The cache then makes the
    # tokenize pass run ONCE total: grouped_prefix_sum's
    # repartitionByRange both SAMPLES its child (boundary estimation)
    # and shuffles it — uncached, each is a full corpus tokenize. The
    # cached frame is (shard, id, int) — doc-COUNT-sized, ~20 B/row,
    # never the text. Together: t_pack_plan 193 s -> ~45 s at 100x.
    counts = scoped_cache(
        docs.select(
            *shard_cols,
            id_col,
            F.explode(
                F.array(F.size(T.tokens_of(docs, text_col)))
            ).alias("n_tokens"),
        ).where(F.col("n_tokens") > 0)
    )
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


def chunk_plan(
    docs: DataFrame,
    capacity: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking plan — the RAG / long-context
    splitter: chunk i covers tokens [i·(C−O), min(i·(C−O)+C, n)) for
    capacity C and overlap O < C, so consecutive chunks share O tokens
    and every token is covered. Documents with n ≤ C yield one chunk;
    empty documents yield none.

    Unlike :func:`pack_plan` (which concatenates documents ACROSS a
    shard), chunking is per-document arithmetic — a pure NARROW
    projection + explode, no shuffle at any corpus size; the chunk count
    per doc is 1 + ceil((n−C)/(C−O)). Returns
    (id, chunk_id, tok_start, tok_end, n_chunk_tokens).
    """
    if not 0 <= overlap < capacity:
        raise ValueError("need 0 <= overlap < capacity")
    step = capacity - overlap
    n = F.col("__n")
    m = (
        F.when(n <= 0, F.lit(0))
        .when(n <= capacity, F.lit(1))
        .otherwise(
            (F.floor((n - capacity + step - 1) / F.lit(step)) + 1).cast("int")
        )
    )
    # Generate barrier: where(__n > 0) would otherwise push below the
    # projection by substituting size(tokenize(text)) — two tokenizer
    # runs per row (Filter + Project).
    staged = docs.select(
        F.col(id_col),
        F.explode(F.array(F.size(T.tokens_of(docs, text_col)))).alias("__n"),
    ).where(F.col("__n") > 0)
    start = F.col("chunk_id").cast("long") * step
    return (
        staged.select(
            id_col,
            "__n",
            F.explode(F.sequence(F.lit(0), m - 1)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            start.alias("tok_start"),
            F.least(start + capacity, F.col("__n").cast("long")).alias("tok_end"),
            (
                F.least(start + capacity, F.col("__n").cast("long")) - start
            ).alias("n_chunk_tokens"),
        )
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "epoch0",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global corpus shuffle — the step between curation
    and :func:`pack_plan`: pretraining wants documents in a pseudorandom
    order that is (a) reproducible run-to-run, (b) changeable per epoch
    (new ``salt``), and (c) computable without a driver-side permutation.

    Every row gets the engine-portable ``portable_hash60(salt:id)`` sort
    key and its EXACT global position under (key, id) via the scalable
    ``global_rank`` (range shuffle + shuffle-free local rank + broadcast
    offsets — no single-partition sort at any corpus size). Feeding the
    rank into ``pack_plan``'s order (or using it as the write sort key)
    yields the epoch's shuffled layout.
    """
    from .dedup import portable_hash60
    from .windows import global_rank

    keyed = df.withColumn(
        "__sk",
        portable_hash60(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ),
    )
    return global_rank(
        keyed, ["__sk", id_col], ascending=True, rank_col=rank_col
    ).drop("__sk")
