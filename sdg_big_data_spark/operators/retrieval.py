"""Lexical retrieval over the document corpus — BM25 ranking.

Beyond-reference operator (LLM-pipeline text-analysis family, same tier
as language-ID/quality scoring in ``functions/text.py``): BM25 is the
standard lexical ranking function (Robertson & Walker's Okapi BM25, the
probabilistic-relevance form used by Lucene/Elasticsearch), and a
training-data pipeline needs it for retrieval-based decontamination,
seed-query corpus mining, and hard-negative mining for embedding
training.

Scale shape: two narrow tokenize passes over the corpus (a 1-row
stats aggregate, and an explode immediately filtered to the query's
terms with the doc length riding on each token row) — the ONLY shuffle
in the query is the hits-sized (doc, term) tf aggregate; nothing
corpus-sized is ever exchanged. Document frequencies collapse to a
query-sized frame the planner broadcasts. The global top-k is a
TakeOrdered (per-partition heap + driver merge of k·partitions rows),
never a full sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    score_dp: int = 6,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)) — the
    Robertson–Sparck-Jones idf with Lucene's +1 floor, so idf ≥ 0 even
    for terms in more than half the corpus.

    Tokenization is the engine's corpus normalization
    (:func:`functions.text.tokenize` — URL strip → lower → accent fold →
    split), so query terms should be given pre-normalized. Scores are
    rounded to ``score_dp`` decimals and the ordering tiebreak is the
    document id, keeping the result deterministic and engine-portable.

    Returns (``id_col``, n_terms_hit, bm25) — the top-``k`` by
    (bm25 desc, id asc).
    """
    terms = [str(t) for t in query_terms]
    # Generate barrier (explode of a 1-element array): a plain alias gets
    # inlined by the optimizer into every consumer — the inferred
    # size>0 filter below the token explode, the doc-length projection,
    # and the explode input each re-ran the tokenizer (3x per row in the
    # executed plan). Nothing pushes through a Generate, so the tokenizer
    # runs ONCE here.
    arr = docs.select(
        F.col(id_col),
        F.explode(F.array(T.tokens_of(docs, text_col))).alias("__arr"),
    )
    # zero-token docs (URL-only text, empty strings) are NOT part of the
    # scored collection: they can match no term, and the corpus stats
    # must agree with the unnested-token view an oracle derives dl/N/
    # avgdl from (ADVICE r4 — counting them skewed idf + length
    # normalization vs that contract)
    arr = arr.where(F.size("__arr") > 0)
    # corpus stats: 1 row (doc count + average length) — a narrow
    # map-side aggregate over per-row array sizes, NO corpus shuffle
    stats = arr.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.size("__arr")).alias("__avgdl"),
    )
    # the doc length rides WITH each exploded token row, so per-doc
    # length needs no separate corpus-wide groupBy/join — the only
    # shuffle in the whole query is the hits-sized tf aggregate below
    toks = arr.select(
        F.col(id_col),
        F.size("__arr").alias("__dl"),
        F.explode("__arr").alias("__tok"),
    )
    # term frequencies for QUERY terms only — the filter runs before the
    # shuffle, so the (doc, term) exchange carries hits, not the corpus
    tf = (
        toks.where(F.col("__tok").isin(terms))
        .groupBy(id_col, "__tok")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    # document frequency per term: query-sized output, broadcast back
    dfreq = tf.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("__tok"),
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("__dl").cast("double") / F.col("__avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum("__s"), score_dp).alias("bm25"),
    )
    return agg.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)


def rrf_fuse(
    runs: Sequence[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k0: int = 60,
    k: int | None = None,
    unit: int = 1_000_000_000,
    score_dp: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked candidate runs — the standard hybrid-retrieval merge
    (lexical BM25 + embedding ANN, or several query formulations):

        rrf(d) = Σ_runs 1 / (k0 + rank_run(d))

    ``runs`` is a sequence of ``(frame, score_col)`` pairs; each frame
    needs (``id_col``, score) and is ranked internally by
    (score DESC, id ASC) — pass PRE-ROUNDED scores (every producer in
    this engine rounds, e.g. ``bm25_topk``/``cosine_topk``) so the rank
    order is engine-portable. Ranks are 1-based; a document absent from
    a run simply contributes nothing (the RRF convention).

    Returns (``id_col``, n_runs_hit, rrf) ordered by (rrf DESC, id ASC),
    top-``k`` if ``k`` is given. Each reciprocal is pinned to integer
    ``1/unit`` units before the cross-run sum (exact long arithmetic —
    float summation order can never flip a hash), then displayed at
    ``score_dp`` decimals.

    Scale shape: fusion inputs are CANDIDATE LISTS by contract
    (top-k·queries rows, not corpora — fuse after retrieval, which is
    where RRF is defined), so the per-run ``row_number`` window over a
    run-sized frame and the (id)-keyed sum are both candidate-sized;
    nothing corpus-sized is touched. Feed corpus-sized frames to a
    retrieval operator first (``bm25_topk``, ``similarity.cosine_topk``).
    """
    from pyspark.sql.window import Window

    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    staged = []
    for i, (df, score_col) in enumerate(runs):
        w = Window.partitionBy(F.lit(i)).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        staged.append(
            df.select(
                F.col(id_col),
                F.row_number().over(w).alias("__rank"),
            ).select(
                id_col,
                F.round(F.lit(float(unit)) / (F.col("__rank") + F.lit(k0)))
                .cast("long")
                .alias("__r_units"),
            )
        )
    allruns = staged[0]
    for s in staged[1:]:
        allruns = allruns.unionByName(s)
    out = (
        allruns.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_runs_hit"),
            F.round(
                F.sum("__r_units").cast("double") / float(unit), score_dp
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    )
    return out.limit(k) if k else out


def bm25_topk_multi(
    docs: DataFrame,
    run_terms: dict[str, Sequence[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    score_dp: int = 6,
    run_col: str = "run",
) -> DataFrame:
    """Top-``k`` per query for SEVERAL bag-of-terms queries in ONE
    corpus pass — the fan-out form of :func:`bm25_topk` for multi-query
    retrieval (RRF fusion of query formulations, batch decontamination
    probes, hard-negative mining over a query set).

    Scoring is identical to :func:`bm25_topk` per run (same idf, same
    stats, same rounding/tiebreak — document frequency is a corpus
    property, independent of which runs ask for the term). What changes
    is the physical plan: the tokenize passes, the corpus stats, the
    (doc, term) tf shuffle (filtered to the UNION of all runs' terms)
    and the df aggregate are all computed ONCE and shared; runs then
    attach via a broadcast (run, term) membership frame and rank inside
    a per-run window. Two separate ``bm25_topk`` calls measured 189.9 s
    at the 100x universe (4 tokenize passes); this form pays 2 — the
    retrieval cost stops scaling with the number of runs.

    Returns (``run_col``, ``id_col``, n_terms_hit, bm25): each run's
    top-``k`` by (bm25 DESC, id ASC).
    """
    from pyspark.sql.window import Window

    from ..cachescope import scoped_cache

    if not run_terms:
        raise ValueError("bm25_topk_multi needs at least one run")
    all_terms = sorted({str(t) for ts in run_terms.values() for t in ts})
    if not all_terms:
        raise ValueError("bm25_topk_multi needs at least one query term")
    spark = docs.sparkSession
    membership = spark.createDataFrame(
        [(r, str(t)) for r, ts in run_terms.items() for t in ts],
        f"{run_col} string, __tok string",
    )
    # ONE tokenize pass total: doc length AND the query-term-filtered
    # token list come out of the same barriered projection, and the
    # result is cached HITS-sized (id, dl, matching tokens — never the
    # full token explosion) for its two consumers (corpus stats, tf).
    # The two-consumer form without the cache re-tokenized the corpus
    # per consumer: 113.9 s at the 100x universe vs ~60 s with it.
    term_arr = F.array(*[F.lit(t) for t in all_terms])
    hits = scoped_cache(
        docs.select(
            F.col(id_col),
            F.explode(F.array(T.tokens_of(docs, text_col))).alias("__arr"),
        )
        .where(F.size("__arr") > 0)
        .select(
            F.col(id_col),
            F.size("__arr").alias("__dl"),
            F.filter(
                "__arr", lambda t: F.array_contains(term_arr, t)
            ).alias("__hit"),
        )
    )
    stats = hits.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        hits.select(id_col, "__dl", F.explode("__hit").alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    dfreq = tf.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    scored = (
        tf.join(F.broadcast(membership), "__tok")
        .join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(run_col),
            F.col(id_col),
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("__dl").cast("double") / F.col("__avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    agg = scored.groupBy(run_col, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum("__s"), score_dp).alias("bm25"),
    )
    w = Window.partitionBy(run_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def rrf_fuse_runs(
    df: DataFrame,
    run_col: str = "run",
    id_col: str = "doc_id",
    score_col: str = "bm25",
    k0: int = 60,
    k: int | None = None,
    unit: int = 1_000_000_000,
    score_dp: int = 6,
) -> DataFrame:
    """:func:`rrf_fuse` over a single run-TAGGED candidate frame (the
    shape :func:`bm25_topk_multi` emits) — one window pass ranks every
    run, then the same pinned reciprocal sum. Identical semantics to
    calling ``rrf_fuse`` on the per-run splits, without re-scanning."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(run_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col),
        F.round(
            F.lit(float(unit))
            / (F.row_number().over(w) + F.lit(k0))
        )
        .cast("long")
        .alias("__r_units"),
    )
    out = (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_runs_hit"),
            F.round(
                F.sum("__r_units").cast("double") / float(unit), score_dp
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    )
    return out.limit(k) if k else out
