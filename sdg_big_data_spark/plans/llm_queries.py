"""Catalog queries — LLM-training-data pipeline operators: deduplication,
similarity search, model scoring (F6), and gap-based sessionization (the
SQL-expressible core of stop detection F2).

Dedup/similarity hashes are explicit integer arithmetic (operators/dedup.py)
so every step — including MinHash+LSH candidate generation — has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds
from ..operators import dedup, scoring, similarity
from .catalog import register, table
from .shared_corpus import tokenized_documents
from .text_queries import _SQL_TOKS

_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)

_SQL_SHINGLE_TABLE = f"""
    toks AS (
      SELECT doc_id, {_SQL_TOKS.format(c="text")} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle
      FROM toks WHERE len(t) >= 3
    )
"""


@register(
    "d_exact_dedup",
    sql=f"""
    SELECT md5(array_to_string({_SQL_TOKS.format(c="text")}, ' ')) AS fp,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup-exact",),
    doc="exact dedup via md5 fingerprint of normalized text; one shuffle "
    "of (16-byte key, id) — the cheapest full-corpus pass at 100 TB",
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text")


@register(
    "d_jaccard_top_pairs",
    sql=f"""
    WITH {_SQL_SHINGLE_TABLE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    LIMIT 50
    """,
    tags=("dedup-jaccard",),
    doc="n-gram Jaccard verify stage: 50 most-similar pairs (candidate "
    "generation at scale is d_minhash_lsh, not this all-pairs form)",
)
def d_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text")
    return (
        pairs.withColumn("jaccard", F.round("jaccard", 4))
        .orderBy(F.col("jaccard").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(50)
    )


@register(
    "d_ssjoin_prefix",
    sql=f"""
    WITH {_SQL_SHINGLE_TABLE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= 0.8
    ORDER BY id_a, id_b
    """,
    tags=("dedup-jaccard",),
    doc="EXACT Jaccard>=0.8 self-join via df-ordered prefix filtering "
    "(VernicaJoin, SIGMOD 2010): candidates only from each doc's "
    "n-ceil(t*n)+1 rarest shingles, verified by array intersect after a "
    "join-back to the per-doc shingle arrays "
    "— exact where d_minhash_lsh is probabilistic; the oracle computes "
    "the same answer from the full inverted index",
)
def d_ssjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.set_similarity_join(docs, "doc_id", "text", threshold=0.8)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


def _minhash_sql() -> str:
    perm_rows = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(dedup.MINHASH_PERMS)
    )
    return f"""
    WITH {_SQL_SHINGLE_TABLE},
    enc AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT
               % {dedup.MINHASH_PRIME} AS sid
      FROM sh
    ),
    perms(i, a, b) AS (VALUES {perm_rows})
    SELECT enc.doc_id, perms.i AS perm,
           min((perms.a * enc.sid + perms.b) % {dedup.MINHASH_PRIME}) AS minhash
    FROM enc CROSS JOIN perms
    GROUP BY 1, 2
    """


@register(
    "d_minhash_signatures",
    sql=_minhash_sql(),
    tags=("dedup-minhash",),
    doc="MinHash signatures (8 fixed affine permutations over "
    "md5-hash-encoded shingles — no vocabulary dictionary, nothing "
    "corpus-derived broadcast) — deterministic, engine-portable",
)
def d_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, "doc_id", "text").select(
        "doc_id", "perm", "minhash"
    )


@register(
    "d_minhash_lsh",
    sql=f"""
    WITH sig AS ({_minhash_sql()}),
    bands AS (
      SELECT doc_id, perm // 2 AS band,
             array_to_string(list_sort(list(format('{{:d}}.{{:d}}', perm, minhash))), ':')
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 2
    )
    SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    """,
    tags=("dedup-minhash", "dedup-lsh"),
    doc="LSH banding over minhash signatures → candidate near-dup pairs; "
    "equi-join on (band, signature), no all-pairs product",
)
def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(docs, "doc_id", "text")


@register(
    "sim_cosine_topk",
    sql="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                              list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
                * sqrt(list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                                        list_transform(c.embedding, x -> CAST(x AS DOUBLE)))))
               AS cos
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity", "ann-baseline"),
    doc="brute-force cosine top-5 (exact ANN baseline): broadcast query "
    "batch, one corpus pass, per-query window top-k",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))


@register(
    "f6_model_scoring",
    sql="""
    WITH t AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(n_tokens - 40) / 10.0)), 6) AS is_relevant,
           round(1.0 / (1.0 + exp(-(n_tokens - 50) / 10.0)), 6) AS is_spam
    FROM t
    """,
    tags=("F6", "scoring"),
    doc="mapInPandas batch scorer (pluggable model; deterministic logistic "
    "stub here so the Arrow plumbing itself is oracle-verified) — replaces "
    "the reference's SLURM+ONNX out-of-Spark loop",
)
def f6_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scores = scoring.score_documents(
        docs, "text", "doc_id", ["is_relevant", "is_spam"]
    )
    return scores.select(
        "doc_id",
        F.round("is_relevant", 6).alias("is_relevant"),
        F.round("is_spam", 6).alias("is_spam"),
    )


@register(
    "g_sessionize",
    sql="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t, value,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 3600
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, t, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           min(t) AS t_start, max(t) AS t_end,
           max(t) - min(t) AS duration,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
    tags=("F2-core", "sessionize"),
    doc="gap-based sessionization (the relational core of stop detection "
    "F2: new segment when gap > max_gap=3600s, stop_locations.py pattern) "
    "— lag + running sum, no Python",
)
def g_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "user_id",
        "ts",
        "event_id",
        epoch_seconds("ts").alias("t"),
        "value",
        F.when(
            epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w) > 3600, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = g.withColumn("session_id", F.sum("new_session").over(ws))
    return s.groupBy("user_id", "session_id").agg(
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
        (F.max("t") - F.min("t")).alias("duration"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "t_token_budget",
    sql=f"""
    WITH c AS (
      SELECT doc_id, lang, len({_SQL_TOKS.format(c="text")}) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY n_tokens DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM c
    )
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 3000
    """,
    tags=("budget", "data-mixing"),
    doc="token-budget selection per language (training-data mixing): keep "
    "longest-first docs while the stratum's inclusive running token count "
    "stays within budget. Spark side runs the SCALABLE grouped prefix sum "
    "(range shuffle + narrow Arrow cumsum + broadcast offsets — no "
    "whole-group sort partition, windows.grouped_prefix_sum); the oracle "
    "states the same semantics as a plain window cumsum",
)
def t_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.dataprep import budget_select

    td = tokenized_documents(spark, sf_dir)
    out = budget_select(td, budget_tokens=3000, group_col="lang", text_col="toks")
    return out.select(
        "doc_id", "lang", "n_tokens", F.col("cum_tokens").cast("long").alias("cum_tokens")
    )


@register(
    "t_pack_plan",
    sql=f"""
    WITH c AS (
      SELECT source, doc_id, len({_SQL_TOKS.format(c="text")}) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT source, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM c WHERE n_tokens > 0
    )
    SELECT source, doc_id, n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS first_bin,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset,
           CAST((cum - 1) // 512 AS BIGINT) AS last_bin
    FROM s
    """,
    tags=("packing", "data-mixing"),
    doc="sequence-packing plan (packing.pack_plan): per-shard contiguous "
    "token concatenation chopped into 512-token context windows; each doc "
    "learns its (first_bin, bin_offset, last_bin) coordinates. Runs on the "
    "scalable grouped prefix sum — no whole-shard sort partition; pure "
    "integer window arithmetic, exactly oracle-replayable",
)
def t_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_plan

    td = tokenized_documents(spark, sf_dir)
    return pack_plan(td, capacity=512, shard_cols=["source"], text_col="toks")


@register(
    "t_shuffle_order",
    sql="""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY ('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                      doc_id ASC
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    tags=("packing", "data-mixing", "shuffle"),
    doc="deterministic epoch-stable corpus shuffle (packing.shuffle_order): "
    "every doc gets its exact global position under the engine-portable "
    "portable_hash60(salt:id) pseudorandom order — reproducible "
    "run-to-run, re-randomized per epoch by the salt, computed on the "
    "scalable global_rank (range shuffle + shuffle-free local rank + "
    "broadcast offsets; never a single-partition sort). Feeds pack_plan "
    "or the write sort key for the epoch's training layout",
)
def t_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import shuffle_order

    docs = table(spark, sf_dir, "documents")
    out = shuffle_order(docs, id_col="doc_id", salt="epoch1")
    return out.select("doc_id", F.col("shuffle_rank").cast("long").alias("shuffle_rank"))


@register(
    "d_dup_clusters",
    sql=f"""
    WITH RECURSIVE sig AS ({_minhash_sql()}),
    bands AS (
      SELECT doc_id, perm // 2 AS band,
             array_to_string(list_sort(list(format('{{:d}}.{{:d}}', perm, minhash))), ':')
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 2
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    cc(node, lab) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v, cc.lab FROM cc JOIN edges e ON e.u = cc.node
    )
    SELECT node AS doc_id, min(lab) AS component
    FROM cc GROUP BY node
    """,
    tags=("dedup-cluster", "iterative"),
    doc="near-dup CLUSTER resolution: connected components over the "
    "MinHash-LSH candidate pairs (graph.connected_components — iterative "
    "min-label propagation, one join + one min-agg per round, "
    "localCheckpoint lineage truncation; rounds ~ graph diameter). The "
    "oracle states the same fixpoint as a recursive CTE — an iterative "
    "Spark algorithm with an exact declarative oracle",
)
def d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_candidates(docs, "doc_id", "text")
    out = connected_components(cand, "id_a", "id_b")
    return out.select(F.col("node").alias("doc_id"), "component")


@register(
    "e_quantize",
    sql="""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale,
             embedding
      FROM embeddings
    ),
    c AS (
      SELECT vec_id, scale,
             CASE WHEN scale > 0
                  THEN list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT))
                  ELSE list_transform(embedding, x -> 0) END AS codes
      FROM q
    )
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(len(codes) AS INTEGER) AS n_dims,
           ('0x' || substr(md5(array_to_string(
              list_transform(codes, x -> CAST(x AS VARCHAR)), ',')), 1, 15)
           )::BIGINT AS codes_digest
    FROM c
    """,
    tags=("similarity", "quantization"),
    doc="int8 symmetric scalar quantization of embeddings "
    "(similarity.quantize_embeddings): per-vector scale = max|x|/127, "
    "codes = round(x/scale) — 4x memory for ANN buckets; pure "
    "expressions, exact integer oracle. The code array (list-typed — "
    "the comparison harness cannot canonicalize lists, r4 finding) is "
    "verified through a per-vector 60-bit md5 digest of its "
    "comma-joined form: one scalar expression per row instead of the "
    "r5 posexplode (64 rows/vector + a Generate barrier), which paid "
    "~0.5 s/query in plan width alone",
)
def e_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash60

    emb = table(spark, sf_dir, "embeddings")
    out = similarity.quantize_embeddings(emb)
    return out.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.size("codes").alias("n_dims"),
        portable_hash60(
            F.array_join(F.col("codes").cast("array<string>"), ",")
        ).alias("codes_digest"),
    )


@register(
    "d_contamination",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS.format(c="text")} AS t FROM documents
    ),
    sharr AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN {_SQL_SHINGLES}
                  ELSE CAST([] AS VARCHAR[]) END AS sa
      FROM toks
    ),
    bsh AS (
      SELECT DISTINCT unnest(sa) AS sh FROM sharr WHERE doc_id % 97 = 0
    ),
    train AS (SELECT doc_id, sa FROM sharr WHERE doc_id % 97 != 0),
    ex AS (SELECT doc_id, unnest(sa) AS sh FROM train),
    hits AS (
      SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
      FROM ex JOIN bsh USING (sh) GROUP BY ex.doc_id
    )
    SELECT t.doc_id, CAST(len(t.sa) AS INTEGER) AS n_shingles,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           round(CASE WHEN len(t.sa) > 0
                      THEN CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / len(t.sa)
                      ELSE 0 END, 6) AS contamination
    FROM train t LEFT JOIN hits h USING (doc_id)
    """,
    tags=("decontamination", "dedup"),
    doc="benchmark decontamination (dedup.contamination_overlap): per "
    "training doc, the fraction of its distinct 3-gram shingles found "
    "anywhere in the held-out benchmark slice (doc_id % 97 = 0). "
    "Benchmark shingle set is eval-suite-sized -> broadcast; the corpus "
    "never shuffles by shingle",
)
def d_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    out = dedup.contamination_overlap(train, bench, "doc_id", "text", n=3)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round("contamination", 6).alias("contamination"),
    )


@register(
    "t_chunk_plan",
    sql=f"""
    WITH c AS (
      SELECT doc_id, len({_SQL_TOKS.format(c="text")}) AS n
      FROM documents
    ),
    m AS (
      SELECT doc_id, n,
             CASE WHEN n <= 32 THEN 1
                  ELSE CAST(floor((n - 32 + 24 - 1) / 24) AS BIGINT) + 1
             END AS n_chunks
      FROM c WHERE n > 0
    ),
    e AS (
      SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_id FROM m
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(chunk_id * 24 AS BIGINT) AS tok_start,
           CAST(least(chunk_id * 24 + 32, n) AS BIGINT) AS tok_end,
           CAST(least(chunk_id * 24 + 32, n) - chunk_id * 24 AS BIGINT)
             AS n_chunk_tokens
    FROM e
    """,
    tags=("packing", "chunking", "curation"),
    doc="sliding-window document chunking plan (packing.chunk_plan): chunk "
    "i covers tokens [i*(C-O), i*(C-O)+C) with C=32, O=8 — the RAG / "
    "long-context splitter. Pure narrow projection + explode: zero "
    "shuffle at any corpus size (vs pack_plan's cross-document prefix "
    "sum); exact integer window arithmetic, oracle replays it verbatim",
)
def t_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import chunk_plan

    td = tokenized_documents(spark, sf_dir)
    return chunk_plan(td, capacity=32, overlap=8, text_col="toks")


# --- g_pagerank -------------------------------------------------------------

_PR_DAMP = 0.85
_PR_ITER = 3
_PR_DP = 10


def _pagerank_oracle_sql(n_iter: int = _PR_ITER) -> str:
    """Unrolled-CTE PageRank oracle (same exact-replay pattern as the BPE
    trainer's oracle): r0 = uniform, each r{i} applies one damped
    power-iteration step with dangling-mass redistribution, rounded at
    the SAME decimal the Spark operator rounds at so the float
    trajectory is pinned in both engines."""
    d = f"CAST({_PR_DAMP} AS DOUBLE)"
    omd = f"CAST({1 - _PR_DAMP} AS DOUBLE)"
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
      UNION
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR),
             's' || CAST(l_suppkey AS VARCHAR)
      FROM lineitem
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM e
      UNION SELECT DISTINCT dst FROM e
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
    od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT nn FROM n) AS rank
      FROM nodes
    )"""
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(f"""
    r{i} AS (
      SELECT nodes.node,
             round({omd} / (SELECT nn FROM n)
               + {d} * (COALESCE(c.s, CAST(0 AS DOUBLE))
                 + (SELECT COALESCE(sum(p.rank), CAST(0 AS DOUBLE))
                    FROM {prev} p ANTI JOIN od ON p.node = od.src)
                   / (SELECT nn FROM n)),
               {_PR_DP}) AS rank
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / od.od) AS s
        FROM e JOIN od USING (src) JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst
      ) c USING (node)
    )""")
        prev = f"r{i}"
    # No final re-round: iteration ranks are already pinned at _PR_DP
    # decimals in both engines; re-rounding at a coarser dp lands exactly
    # on .5 boundaries of the _PR_DP grid, where Spark (BigDecimal
    # shortest-repr, HALF_UP) and DuckDB (scaled C round on the raw
    # binary double) legitimately disagree by 1e-(dp) — observed on 4 of
    # ~2100 nodes at dp=8.
    parts.append(f"""
    SELECT node, rank FROM {prev}""")
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


@register(
    "g_pagerank",
    sql=_pagerank_oracle_sql(),
    tags=("graph", "pagerank", "iterative"),
    doc="fixed-iteration PageRank (graph.pagerank) over the bipartite "
    "supplier<->part co-occurrence graph from lineitem — per iteration: "
    "one edge-src join shuffle + one groupBy(dst) shuffle + a 1-row "
    "dangling-mass broadcast; lineage truncated per round. Oracle = "
    "the power iteration unrolled as CTEs with per-iteration rounding "
    "pinning the float trajectory in both engines",
)
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    # dedup the raw co-occurrence pairs as INTS (one ~|lineitem| shuffle of
    # 8-byte keys), mirror, and run the whole iteration on LONG node ids
    # (parts offset by 10^8: suppkey reaches exactly 10^7 at TPC-H
    # SF1000 — an offset of 10^7 would collide there, and this fixture's
    # partkeys START AT 0, so the p-node range is [_OFF, …) and the
    # supplier test must stay STRICT `<`): every per-iteration
    # join/aggregate then shuffles 8-byte keys instead of strings; the
    # display ids ('s…'/'p…') are minted ONCE on the final |nodes|-row
    # frame. Both directions of a distinct pair set are still distinct,
    # so assume_distinct skips the operator's own dedup; the symmetrized
    # graph has every node as a src, so assume_no_dangling skips the
    # anti-join + probe.
    _OFF = 100_000_000
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    s = F.col("l_suppkey").cast("long")
    p = F.col("l_partkey").cast("long") + _OFF
    edges = pairs.select(s.alias("src"), p.alias("dst")).unionByName(
        pairs.select(p.alias("src"), s.alias("dst"))
    )
    ranks = graph.pagerank(
        edges,
        damping=_PR_DAMP,
        n_iter=_PR_ITER,
        round_dp=_PR_DP,
        assume_distinct=True,
        assume_no_dangling=True,
        assume_no_sinks=True,
    )
    node_str = F.when(
        F.col("node") < _OFF, F.concat(F.lit("s"), F.col("node").cast("string"))
    ).otherwise(
        F.concat(F.lit("p"), (F.col("node") - _OFF).cast("string"))
    )
    return ranks.select(node_str.alias("node"), "rank")



@register(
    "g_triangles",
    sql="""
    WITH ps AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      WHERE l_orderkey % 10 = 0
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM ps a JOIN ps b ON a.ok = b.ok AND a.pk < b.pk
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    ORDER BY n_triangles DESC, node ASC
    LIMIT 20
    """,
    tags=("graph", "triangles"),
    doc="per-node triangle counts over the co-purchase graph (parts "
    "sharing an order), top 20: degree-oriented wedge enumeration (Suri & "
    "Vassilvitskii WWW 2011) — each triangle counted once, wedge fan-out "
    "bounded by out-degree under the (degree, id) order, O(sqrt(m)) for "
    "any graph; the oracle counts the same triangles via the simpler "
    "id-ordered form (per-node counts are orientation-invariant)",
)
def g_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    li = table(spark, sf_dir, "lineitem")
    # deterministic 1/10 order subset: the FULL co-purchase graph at sf0.1
    # is 1.2M edges / 72M wedges (~9 s of pure wedge enumeration) — a
    # bench fixture, not an operator limit; the subset keeps the same
    # plan shape at ~1/100 the wedge count
    ps = (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = ps.select("ok", F.col("pk").alias("p1"))
    b = ps.select("ok", F.col("pk").alias("p2"))
    edges = (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    out = triangle_counts(edges, "src", "dst")
    return (
        out.orderBy(F.col("n_triangles").desc(), F.col("node").asc())
        .limit(20)
        .select(F.col("node"), F.col("n_triangles"))
    )


def _incremental_dedup_sql() -> str:
    perm_rows = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(dedup.MINHASH_PERMS)
    )
    p = dedup.MINHASH_PRIME
    toks = _SQL_TOKS.format(c="text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS t FROM documents),
    fp AS (SELECT doc_id, md5(array_to_string(t, ' ')) AS fp FROM t),
    newd AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
    idxd AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
    exact AS (
      SELECT f.doc_id FROM fp f JOIN newd USING (doc_id)
      WHERE f.fp IN (SELECT f2.fp FROM fp f2 JOIN idxd USING (doc_id))
    ),
    sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle
      FROM t WHERE len(t) >= 3
    ),
    enc AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS sid
      FROM sh
    ),
    perms(i, a, b) AS (VALUES {perm_rows}),
    sig AS (
      SELECT enc.doc_id, perms.i AS perm,
             min((perms.a * enc.sid + perms.b) % {p}) AS minhash
      FROM enc CROSS JOIN perms GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, perm // 2 AS band,
             array_to_string(list_sort(list(format('{{:d}}.{{:d}}', perm, minhash))), ':')
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 2
    ),
    rest AS (
      SELECT doc_id FROM newd WHERE doc_id NOT IN (SELECT doc_id FROM exact)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_new, y.doc_id AS id_idx
      FROM bands x
      JOIN rest r ON x.doc_id = r.doc_id
      JOIN bands y ON x.band = y.band AND x.band_sig = y.band_sig
      JOIN idxd i ON y.doc_id = i.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT c.id_new, c.id_idx, count(*) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_new
      JOIN sh b ON b.doc_id = c.id_idx AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    near AS (
      SELECT DISTINCT i.id_new AS doc_id
      FROM inter i
      JOIN sizes sn ON sn.doc_id = i.id_new
      JOIN sizes si ON si.doc_id = i.id_idx
      WHERE CAST(i.n_inter AS DOUBLE) / (sn.n_sh + si.n_sh - i.n_inter) >= 0.8
    )
    SELECT n.doc_id,
           CASE WHEN n.doc_id IN (SELECT doc_id FROM exact) THEN 'exact_dup'
                WHEN n.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
                ELSE 'kept' END AS status
    FROM newd n
    ORDER BY doc_id
    """


@register(
    "d_incremental_dedup",
    sql=_incremental_dedup_sql(),
    tags=("dedup", "incremental"),
    doc="incremental-ingest dedup: a NEW batch (odd doc ids) statuses "
    "against the standing INDEX corpus (even ids) — exact fingerprint "
    "semi-join, then cross-corpus LSH band candidates + Jaccard verify "
    "for the remainder; never index x index, never all-pairs. The "
    "index's fingerprint and band frames are the natural cross-batch "
    "persists at scale (id-plus-hash width)",
)
def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    new_docs = docs.where(F.col("doc_id") % 2 == 1)
    index_docs = docs.where(F.col("doc_id") % 2 == 0)
    return dedup.incremental_dedup(
        new_docs, index_docs, "doc_id", "text", threshold=0.8
    ).orderBy("doc_id")


def _curation_sql() -> str:
    """End-to-end oracle for the composed dataprep ladder — each stage's
    CTE replays the exact registered fragment of its standalone query
    (t_quality_score, t_lang_id, d_exact_dedup, d_minhash_lsh +
    jaccard verify), chained on the previous stage's survivors."""
    from ..functions import text as T
    from .text_queries import _sql_list

    toks = _SQL_TOKS.format(c="text")
    stop = _sql_list(T.STOPWORDS_EN)
    hits = {
        lang: f"len(list_filter(toks, x -> list_contains({_sql_list(m)}, x)))"
        for lang, m in T.LANG_MARKERS.items()
    }
    perm_rows = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(dedup.MINHASH_PERMS)
    )
    p = dedup.MINHASH_PRIME
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text, {toks} AS toks FROM documents
    ),
    f AS (
      SELECT doc_id,
             len(toks) AS q_n_tokens,
             CASE WHEN length(text) > 0 THEN
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({stop}, x))) AS DOUBLE)
               / len(toks) ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS mean_tok_len,
             {hits["de"]} AS h_de, {hits["en"]} AS h_en,
             {hits["es"]} AS h_es, {hits["fr"]} AS h_fr
      FROM base
    ),
    scored AS (
      SELECT doc_id,
             round(CAST(
               (CASE WHEN q_n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END)
               + (CASE WHEN stop_ratio > 0.01 THEN 0.2 ELSE 0.0 END)
               + (CASE WHEN mean_tok_len BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END)
               AS DOUBLE), 2) AS q_score,
             CASE
               WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
               WHEN h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
               WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
               WHEN h_fr > 0 THEN 'fr'
               ELSE 'und'
             END AS lang_pred
      FROM f
    ),
    q1 AS (SELECT doc_id FROM scored WHERE q_score >= 0.6),
    l1 AS (
      SELECT s.doc_id FROM scored s JOIN q1 USING (doc_id)
      WHERE s.lang_pred = 'en'
    ),
    e1 AS (
      SELECT min(b.doc_id) AS doc_id
      FROM base b JOIN l1 USING (doc_id)
      GROUP BY md5(array_to_string(b.toks, ' '))
    ),
    sh3 AS (
      SELECT b.doc_id,
             unnest(list_distinct(list_transform(range(1, len(b.toks) - 1),
               i -> b.toks[i] || ' ' || b.toks[i+1] || ' ' || b.toks[i+2]))) AS shingle
      FROM base b JOIN e1 USING (doc_id) WHERE len(b.toks) >= 3
    ),
    enc AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {p} AS sid
      FROM sh3
    ),
    perms(i, a, b) AS (VALUES {perm_rows}),
    sig AS (
      SELECT enc.doc_id, perms.i AS perm,
             min((perms.a * enc.sid + perms.b) % {p}) AS minhash
      FROM enc CROSS JOIN perms GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, perm // 2 AS band,
             array_to_string(list_sort(list(format('{{:d}}.{{:d}}', perm, minhash))), ':')
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 2
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh3 GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh3 a ON a.doc_id = c.id_a
      JOIN sh3 b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT i.id_b AS doc_id
      FROM inter i
      JOIN sizes na ON na.doc_id = i.id_a
      JOIN sizes nb ON nb.doc_id = i.id_b
      WHERE CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter) >= 0.8
    ),
    nd AS (
      SELECT e1.doc_id FROM e1
      WHERE e1.doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    tok_counts AS (SELECT doc_id, len(toks) AS n_tok FROM base)
    SELECT * FROM (
      SELECT '0_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens
      FROM tok_counts
      UNION ALL
      SELECT '1_quality', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(t.n_tok), 0) AS BIGINT)
      FROM q1 JOIN tok_counts t USING (doc_id)
      UNION ALL
      SELECT '2_language', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(t.n_tok), 0) AS BIGINT)
      FROM l1 JOIN tok_counts t USING (doc_id)
      UNION ALL
      SELECT '3_exact_dedup', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(t.n_tok), 0) AS BIGINT)
      FROM e1 JOIN tok_counts t USING (doc_id)
      UNION ALL
      SELECT '4_near_dedup', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(t.n_tok), 0) AS BIGINT)
      FROM nd JOIN tok_counts t USING (doc_id)
    ) ORDER BY stage
    """


@register(
    "d_curation_e2e",
    sql=_curation_sql(),
    tags=("dedup", "pipeline", "composition"),
    doc="the COMPOSED dataprep ladder (quality gate -> language gate -> "
    "exact dedup -> MinHash/LSH near-dup removal) as one lineage; "
    "returns per-stage surviving doc/token counts — proves the stages "
    "compose exactly, not just pass in isolation",
)
def d_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines import dataprep

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return dataprep.survival_report(
        docs, min_quality=0.6, keep_langs=("en",), jaccard_threshold=0.8
    ).orderBy("stage")


# --- d_leakage_split --------------------------------------------------------

# Cut points computed EXACTLY as pipelines.dataprep.leakage_safe_split does
# (same float accumulation), so the oracle's CASE thresholds are literal
# copies of the operator's.
_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _split_cuts() -> list[tuple[str, int]]:
    cuts, acc = [], 0.0
    items = list(_SPLIT_FRACS.items())
    for name, frac in items[:-1]:
        acc += frac
        cuts.append((name, int(acc * 2**32)))
    return cuts


def _leakage_split_sql() -> str:
    u = "(CAST(rep_id AS HUGEINT) * 2654435761) % 4294967296"
    case = "CASE"
    for name, cut in _split_cuts():
        case += f" WHEN {u} < {cut} THEN '{name}'"
    case += f" ELSE '{list(_SPLIT_FRACS)[-1]}' END"
    return f"""
    WITH RECURSIVE sig AS ({_minhash_sql()}),
    bands AS (
      SELECT doc_id, perm // 2 AS band,
             array_to_string(list_sort(list(format('{{:d}}.{{:d}}', perm, minhash))), ':')
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 2
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    cc(node, lab) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v, cc.lab FROM cc JOIN edges e ON e.u = cc.node
    ),
    comp AS (SELECT node AS doc_id, min(lab) AS comp_rep FROM cc GROUP BY node),
    base AS (
      SELECT d.doc_id, COALESCE(c.comp_rep, d.doc_id) AS rep_id
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, rep_id, {case} AS split FROM base
    """


@register(
    "d_leakage_split",
    sql=_leakage_split_sql(),
    tags=("curation", "data-selection", "iterative"),
    doc="leakage-safe train/val/test split: near-dup clusters (MinHash-LSH "
    "candidates -> connected components) are assigned to ONE split by "
    "hashing the cluster REPRESENTATIVE, so an eval doc can never have a "
    "near-duplicate in train (the Lee et al. arXiv:2107.06499 SS6 "
    "contamination mode). Oracle replays LSH + a recursive-CTE fixpoint + "
    "the same multiplicative-hash cuts",
)
def d_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.dataprep import leakage_safe_split

    docs = table(spark, sf_dir, "documents")
    return leakage_safe_split(docs, dict(_SPLIT_FRACS))


# --- g_bfs_hops ---------------------------------------------------------------

_BFS_OFF = 100_000_000
_BFS_MAX_HOPS = 3

_BFS_SQL = f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
             CAST(l_partkey AS BIGINT) + {_BFS_OFF} AS dst
      FROM lineitem
      UNION
      SELECT DISTINCT CAST(l_partkey AS BIGINT) + {_BFS_OFF},
             CAST(l_suppkey AS BIGINT)
      FROM lineitem
    ),
    bfs(node, hop) AS (
      SELECT CAST(s_suppkey AS BIGINT), 0
      FROM supplier WHERE s_suppkey = 1
      UNION
      SELECT e.dst, bfs.hop + 1
      FROM bfs JOIN e ON e.src = bfs.node
      WHERE bfs.hop < {_BFS_MAX_HOPS}
    )
    SELECT CASE WHEN node < {_BFS_OFF} THEN 's' || CAST(node AS VARCHAR)
                ELSE 'p' || CAST(node - {_BFS_OFF} AS VARCHAR) END AS node,
           CAST(min(hop) AS INTEGER) AS hop
    FROM bfs GROUP BY 1
"""


@register(
    "g_bfs_hops",
    sql=_BFS_SQL,
    tags=("graph", "bfs", "iterative"),
    doc="multi-source BFS hop distances (graph.bfs_hops) over the "
    "symmetrized supplier<->part graph from a single supplier seed, "
    "max 3 hops — Pregel-style frontier loop: per level one edge "
    "equi-join + distinct + anti-join against visited (first-visit-wins "
    "IS hop minimality), frontier broadcast below the size gate so the "
    "checkpointed edge frame never re-shuffles. The oracle's recursive "
    "CTE dedups (node, hop) states per level — node-bounded state, no "
    "path enumeration in either engine",
)
def g_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    s = F.col("l_suppkey").cast("long")
    p = F.col("l_partkey").cast("long") + _BFS_OFF
    edges = pairs.select(s.alias("src"), p.alias("dst")).unionByName(
        pairs.select(p.alias("src"), s.alias("dst"))
    )
    seeds = sup.where(F.col("s_suppkey") == 1).select(
        F.col("s_suppkey").cast("long").alias("node")
    )
    out = graph.bfs_hops(edges, seeds, max_hops=_BFS_MAX_HOPS)
    node_str = F.when(
        F.col("node") < _BFS_OFF, F.concat(F.lit("s"), F.col("node").cast("string"))
    ).otherwise(F.concat(F.lit("p"), (F.col("node") - _BFS_OFF).cast("string")))
    return out.select(node_str.alias("node"), F.col("hop").cast("int").alias("hop"))


# --- sim_mmr_rerank -----------------------------------------------------------

_MMR_LAM = 0.7
_MMR_K_CAND = 25
_MMR_K_SEL = 5

_ORACLE_COS = (
    "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE))) "
    "/ (sqrt(list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({a}, x -> CAST(x AS DOUBLE)))) "
    "* sqrt(list_dot_product(list_transform({b}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE)))))"
)


def _mmr_oracle_sql(lam: float = _MMR_LAM, k_cand: int = _MMR_K_CAND,
                    k_sel: int = _MMR_K_SEL) -> str:
    """Unrolled-CTE MMR oracle (the exact-replay pattern of g_pagerank /
    t_bpe_merges): candidate top-k and all pairwise sims use the SAME
    sequential-fold double cosine as the operator, then each greedy step
    is one CTE — anti-join the selected set, left-join the max-sim
    diversity term, argmax by (raw mmr DESC, cand_id ASC). IEEE double
    compares replay bit-for-bit, so no rounding is needed until the
    displayed columns."""
    lam_s, mu_s = repr(float(lam)), repr(1.0 - float(lam))
    head = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {_ORACLE_COS.format(a="q.embedding", b="c.embedding")} AS rel
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id != q.vec_id
    ),
    cand AS (
      SELECT query_id, cand_id, rel FROM (
        SELECT query_id, cand_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id ASC) AS rn
        FROM scored
      ) WHERE rn <= {k_cand}
    ),
    cv AS (
      SELECT c.query_id, c.cand_id, c.rel, e.embedding AS v
      FROM cand c JOIN embeddings e ON e.vec_id = c.cand_id
    ),
    pair AS (
      SELECT a.query_id, a.cand_id, b.cand_id AS other_id,
             {_ORACLE_COS.format(a="a.v", b="b.v")} AS sim
      FROM cv a JOIN cv b
        ON a.query_id = b.query_id AND a.cand_id != b.cand_id
    ),
    s1 AS (
      SELECT query_id, cand_id, rel, {lam_s} * rel AS mmr, 1 AS mmr_rank
      FROM (
        SELECT query_id, cand_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {lam_s} * rel DESC, cand_id ASC)
                 AS rn
        FROM cand
      ) WHERE rn = 1
    )"""
    parts = [head]
    for i in range(2, k_sel + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT query_id, cand_id FROM s{j}" for j in range(1, i)
        )
        parts.append(f"""
    sel{i} AS ({sel_union}),
    st{i} AS (
      SELECT c.query_id, c.cand_id, c.rel,
             {lam_s} * c.rel - {mu_s} * coalesce(mx.div, 0.0) AS mmr
      FROM cand c
      ANTI JOIN sel{i} sl
        ON c.query_id = sl.query_id AND c.cand_id = sl.cand_id
      LEFT JOIN (
        SELECT p.query_id, p.cand_id, max(p.sim) AS div
        FROM pair p JOIN sel{i} s
          ON p.query_id = s.query_id AND p.other_id = s.cand_id
        GROUP BY p.query_id, p.cand_id
      ) mx ON c.query_id = mx.query_id AND c.cand_id = mx.cand_id
    ),
    s{i} AS (
      SELECT query_id, cand_id, rel, mmr, {i} AS mmr_rank
      FROM (
        SELECT query_id, cand_id, rel, mmr,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY mmr DESC, cand_id ASC) AS rn
        FROM st{i}
      ) WHERE rn = 1
    )""")
        
    final_union = " UNION ALL ".join(
        f"SELECT * FROM s{j}" for j in range(1, k_sel + 1)
    )
    tail = f"""
    SELECT query_id, cand_id AS neighbor_id, CAST(mmr_rank AS INTEGER)
             AS mmr_rank,
           round(rel, 4) AS rel, round(mmr, 4) AS mmr
    FROM ({final_union})"""
    return ",".join(parts) + tail


@register(
    "sim_mmr_rerank",
    sql=_mmr_oracle_sql(),
    tags=("similarity", "retrieval", "mmr"),
    doc="Maximal Marginal Relevance diversified top-k (similarity."
    "mmr_rerank, Carbonell & Goldstein 1998): exact-cosine top-25 "
    "candidates per query, then a 5-step greedy λ·rel − (1−λ)·max-sim "
    "selection — candidate generation is the one corpus-scale pass, "
    "everything after is k-bounded per query (k² pair join + grouped-map "
    "greedy). Oracle unrolls the greedy as per-step argmax CTEs on the "
    "same sequential-fold doubles",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    out = similarity.mmr_rerank(
        emb, queries, k_candidates=_MMR_K_CAND, k_select=_MMR_K_SEL,
        lam=_MMR_LAM,
    )
    return out.select(
        "query_id", "neighbor_id", "mmr_rank",
        F.round("rel", 4).alias("rel"), F.round("mmr", 4).alias("mmr"),
    )


@register(
    "g_common_neighbors",
    sql="""
    WITH ps AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      WHERE l_orderkey % 10 = 0
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM ps a JOIN ps b ON a.ok = b.ok AND a.pk < b.pk
    ),
    adj AS (
      SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e
    ),
    common AS (
      SELECT x.n AS a, y.n AS b, count(*) AS n_common
      FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
      GROUP BY x.n, y.n
    ),
    deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY w),
    scored AS (
      SELECT c.a, c.b, c.n_common,
             CAST(c.n_common AS DOUBLE) / (da.deg + db.deg - c.n_common)
               AS jac,
             CASE WHEN ed.u IS NULL THEN 0 ELSE 1 END AS are_connected
      FROM common c
      JOIN deg da ON da.w = c.a
      JOIN deg db ON db.w = c.b
      LEFT JOIN e ed ON ed.u = c.a AND ed.v = c.b
    )
    SELECT a AS node_a, b AS node_b, n_common,
           round(jac, 6) AS jaccard, are_connected
    FROM scored
    ORDER BY jac DESC, a ASC, b ASC
    LIMIT 20
    """,
    tags=("graph", "link-prediction"),
    doc="common-neighbor / Jaccard link prediction (graph."
    "common_neighbor_similarity, Liben-Nowell & Kleinberg 2003) over "
    "the part co-occurrence graph: wedge self-join enumerates each "
    "co-neighbor pair once, map-side-combined intersection counts, "
    "|nodes|-sized degree joins for the union term, "
    "TakeOrderedAndProject top-20 — never a global sort; the exact "
    "Σdeg² wedge cost is the documented price of exact overlap (the "
    "MinHash ladder is the sanctioned approximation at hub skew)",
)
def g_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    ps = (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = ps.select("ok", F.col("pk").alias("u"))
    b = ps.select("ok", F.col("pk").alias("v"))
    edges = (
        a.join(b, "ok").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    return graph.common_neighbor_similarity(
        edges, src="u", dst="v", top_k=20
    )


@register(
    "e_truncated_rerank",
    sql=f"""
    WITH q AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
    ),
    coarse AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             q.embedding AS qv, c.embedding AS cv,
             list_dot_product(
               list_transform((q.embedding)[1:16], x -> CAST(x AS DOUBLE)),
               list_transform((c.embedding)[1:16], x -> CAST(x AS DOUBLE)))
               AS coarse
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id != q.vec_id
    ),
    cands AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY coarse DESC, neighbor_id ASC) AS crank
        FROM coarse
      ) WHERE crank <= 50
    ),
    rer AS (
      SELECT query_id, neighbor_id,
             {_ORACLE_COS.format(a="qv", b="cv")} AS cos
      FROM cands
    )
    SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM rer
    ) WHERE rank <= 5
    """,
    tags=("similarity", "ann", "matryoshka"),
    doc="two-stage ANN by dimension truncation (similarity."
    "truncated_rerank_topk, Matryoshka adaptive retrieval arXiv:"
    "2205.13147): coarse dot over the first 16 of 64 dims prunes the "
    "corpus to 50 candidates/query (map + per-query top-k, ~4x cheaper "
    "arithmetic and proportionally less vector I/O under a prefix-"
    "split layout), exact full-dim cosine re-ranks the survivors — "
    "the (d_coarse, k_coarse) dial is IVF's nprobe analogue and "
    "ev_ann_recall measures it unchanged",
)
def e_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.truncated_rerank_topk(
        emb, queries, d_coarse=16, k_coarse=50, k=5
    )
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos")
    )


# --- g_kcore ------------------------------------------------------------------

_KCORE_K = 6
_KCORE_ORACLE_ROUNDS = 9  # fixture converges in 5 at sf0.01 AND sf0.1;
# the fixpoint is unique, so extra rounds are no-ops, not divergence


def _kcore_oracle_sql(k: int = _KCORE_K, rounds: int = _KCORE_ORACLE_ROUNDS) -> str:
    # every e{i} is referenced twice (its degree frame and the next
    # peel), so the CTEs are MATERIALIZED — DuckDB inlines plain CTEs
    # per reference, which goes exponential over an unrolled chain
    parts = ["""
    WITH ps AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      WHERE l_orderkey % 10 = 0
    ),
    ee AS MATERIALIZED (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM ps a JOIN ps b ON a.ok = b.ok AND a.pk < b.pk
    ),
    e0 AS MATERIALIZED (SELECT u, v FROM ee UNION ALL SELECT v, u FROM ee)"""]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f"""
    k{i} AS MATERIALIZED (
      SELECT u FROM (SELECT u, count(*) AS c FROM {prev} GROUP BY u)
      WHERE c >= {k}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      SEMI JOIN k{i} a ON e.u = a.u
      SEMI JOIN k{i} b ON e.v = b.u
    )""")
        prev = f"e{i}"
    # Convergence guard: the unrolled chain is only a valid oracle if
    # the LAST round was a no-op (the peeling fixpoint was reached by
    # round rounds-1). A denser fixture needing more rounds would
    # silently diverge from the engine's run-to-fixpoint result —
    # instead, error() loudly (lazily evaluated per output row, so a
    # converged run never touches it; an EMPTY final round emits no
    # rows and IS a fixpoint, so no false alarm there). If the peel
    # finishes exactly at the last round this still trips — the remedy
    # in both cases is raising ``rounds``, an oracle limitation, not an
    # engine bug.
    parts.append(f"""
    SELECT u AS node,
           CASE WHEN (SELECT count(*) FROM e{rounds})
                     = (SELECT count(*) FROM e{rounds - 1})
                THEN count(*)
                ELSE error('g_kcore oracle: {rounds} unrolled peeling rounds did not converge — raise rounds')
           END AS core_degree
    FROM {prev} GROUP BY u""")
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


@register(
    "g_kcore",
    sql=_kcore_oracle_sql(),
    tags=("graph", "k-core", "iterative"),
    doc="k-core decomposition at k=6 (graph.k_core, Seidman 1983) over "
    "the part co-occurrence graph: iterative peeling — per round one "
    "map-side-combined degree aggregate + two semi-joins with the "
    "surviving-node frame broadcast, early stop at the fixpoint (which "
    "is UNIQUE and peeling-order-independent, so the oracle may peel "
    "on any schedule: it unrolls 9 rounds, past the fixture's measured "
    "5-round convergence at both sf0.01 and sf0.1 — extra rounds are "
    "no-ops by definition)",
)
def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    ps = (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = ps.select("ok", F.col("pk").alias("u"))
    b = ps.select("ok", F.col("pk").alias("v"))
    edges = (
        a.join(b, "ok").where(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    return graph.k_core(edges, k=_KCORE_K, src="u", dst="v")
