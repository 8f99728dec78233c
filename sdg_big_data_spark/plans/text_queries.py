"""Catalog queries — text/string family (SURVEY.md §2.9), array aggregates
A12/A13, z-scores A15, dictionary sentiment F8, and the text-analysis
operators for training-data pipelines (language ID, quality scoring, token
counting) on the ``documents`` table.

All pure built-in expressions — zero Python UDFs in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachescope import scoped_cache
from ..functions import text as T
from ..operators import relational
from .catalog import register, table
from .shared_corpus import tokenized_documents

# SQL fragments mirroring functions/text.py exactly.
_SQL_NORM = (
    "translate(lower(regexp_replace({c}, 'http\\S+', '', 'g')), "
    f"'{T._ACCENT_SRC}', '{T._ACCENT_DST}')"
)
_SQL_TOKS = (
    "list_filter(string_split_regex(" + _SQL_NORM + ", '[^a-z0-9'']+'), x -> x <> '')"
)

POSITIVE_WORDS = ["fast", "big", "good"]
NEGATIVE_WORDS = ["slow", "small", "bad"]


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "f_string_normalize",
    sql=f"""
    SELECT doc_id,
           {_SQL_NORM.format(c="text")} AS norm_text,
           len({_SQL_TOKS.format(c="text")}) AS n_tokens
    FROM documents
    """,
    tags=("scalar-string", "F7"),
    doc="corpus normalization: URL strip → lower → accent fold → tokenize "
    "(build_random_sets.py:38,50-62), one translate() pass instead of the "
    "reference's 10 chained regexp_replace",
)
def f_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # Two projections on purpose (r10): n_tokens derives from the ALIASED
    # norm_text, so the normalize chain (URL regex → lower → accent fold)
    # evaluates once per row instead of once per consumer — CollapseProject
    # declines to re-inline a non-cheap alias referenced twice — and the
    # token count is one codegen regexp_count pass over it.
    inner = docs.select(
        "doc_id", T.normalize_text(F.col("text")).alias("norm_text")
    )
    return inner.select(
        "doc_id",
        "norm_text",
        F.regexp_count(F.col("norm_text"), F.lit(T.TOKEN_RUN_RE)).alias(
            "n_tokens"
        ),
    )


@register(
    "a12_explode_value_counts",
    sql=f"""
    SELECT word, count(*) AS n
    FROM (SELECT unnest({_SQL_TOKS.format(c="text")}) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
    tags=("A12", "F7"),
    doc="explode + value_counts (news regions frequency table, cell 19)",
)
def a12_explode_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    return (
        td.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "a13_collect_sorted_set",
    sql="""
    SELECT lang,
           array_to_string(list_sort(list_distinct(list(source))), ',') AS sources
    FROM documents GROUP BY lang
    """,
    tags=("A13",),
    doc="grouped sorted collect_set (news cell 23), string-joined for a "
    "stable cross-engine representation",
)
def a13_collect_sorted_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources")
    )


@register(
    "a15_zscore_by_group",
    sql="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS value_z
    FROM events
    """,
    tags=("A15",),
    doc="per-group z-score via window, single scan (news README:39)",
)
def a15_zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    out = relational.zscore_by_group(events, "value", ["event_type"])
    return out.select(
        "event_id", "event_type", F.round("value_z", 4).alias("value_z")
    )


@register(
    "f8_dictionary_sentiment",
    sql=f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKS.format(c="text")} AS toks FROM documents
    )
    SELECT doc_id, lang,
           len(list_filter(toks, x -> list_contains({_sql_list(POSITIVE_WORDS)}, x)))
             AS n_pos,
           len(list_filter(toks, x -> list_contains({_sql_list(NEGATIVE_WORDS)}, x)))
             AS n_neg,
           round(CAST(len(list_filter(toks, x -> list_contains({_sql_list(POSITIVE_WORDS)}, x)))
                 - len(list_filter(toks, x -> list_contains({_sql_list(NEGATIVE_WORDS)}, x))) AS DOUBLE)
                 / len(toks), 6) AS sentiment_tf
    FROM t WHERE len(toks) > 0
    """,
    tags=("F8", "A14"),
    doc="bag-of-words dictionary sentiment TF (news notebook cell 15): "
    "lexicon hits / total tokens, as pure array expressions (the reference "
    "used pandas + mp.Pool — here it distributes for free)",
)
def f8_dictionary_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    pos_arr = F.array(*[F.lit(w) for w in POSITIVE_WORDS])
    neg_arr = F.array(*[F.lit(w) for w in NEGATIVE_WORDS])
    # let-bound: the shared token array feeds all three counters (HOFs
    # are interpreted — an inlined expression would run 3x per row).
    counts = T.let(
        F.col("toks"),
        lambda toks: F.struct(
            F.size(F.filter(toks, lambda x: F.array_contains(pos_arr, x))).alias("p"),
            F.size(F.filter(toks, lambda x: F.array_contains(neg_arr, x))).alias("n"),
            F.size(toks).alias("t"),
        ),
    )
    return (
        # Generate barrier: the where(__n > 0) below would otherwise be
        # pushed through the projection by substituting the whole counts
        # chain — tokenizer + three filters twice per row.
        td.select("doc_id", "lang", F.explode(F.array(counts)).alias("__c"))
        .select(
            "doc_id",
            "lang",
            F.col("__c")["p"].alias("n_pos"),
            F.col("__c")["n"].alias("n_neg"),
            F.col("__c")["t"].alias("__n"),
        )
        .where(F.col("__n") > 0)
        .select(
            "doc_id",
            "lang",
            "n_pos",
            "n_neg",
            F.round(
                (F.col("n_pos") - F.col("n_neg")).cast("double") / F.col("__n"), 6
            ).alias("sentiment_tf"),
        )
    )


def _sql_marker_hits(markers: list[str]) -> str:
    return f"len(list_filter(toks, x -> list_contains({_sql_list(markers)}, x)))"


def _langid_sql() -> str:
    h = {lang: _sql_marker_hits(m) for lang, m in T.LANG_MARKERS.items()}
    return f"""
    WITH t AS (
      SELECT doc_id, lang AS lang_true, {_SQL_TOKS.format(c="text")} AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang_true,
             {h["de"]} AS h_de, {h["en"]} AS h_en,
             {h["es"]} AS h_es, {h["fr"]} AS h_fr
      FROM t
    )
    SELECT doc_id, lang_true,
           CASE
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
             WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
             WHEN h_fr > 0 THEN 'fr'
             ELSE 'und'
           END AS lang_pred
    FROM s
    """


@register(
    "t_lang_id",
    sql=_langid_sql(),
    tags=("text-analysis", "langid"),
    doc="heuristic n-gram/stopword language ID with deterministic "
    "alphabetical-first tiebreak; swap in fasttext via operators/scoring.py "
    "for production",
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        T.lang_id(F.col("text")).alias("lang_pred"),
    )


@register(
    "t_quality_score",
    sql=f"""
    WITH t AS (
      SELECT doc_id, text, {_SQL_TOKS.format(c="text")} AS toks FROM documents
    ),
    f AS (
      SELECT doc_id,
             length(text) AS q_n_chars,
             len(toks) AS q_n_tokens,
             CASE WHEN length(text) > 0 THEN
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> list_contains({_sql_list(T.STOPWORDS_EN)}, x))) AS DOUBLE)
               / len(toks) ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS mean_tok_len
      FROM t
    )
    SELECT doc_id, q_n_chars, CAST(q_n_tokens AS INT) AS q_n_tokens,
           round(punct_ratio, 4) AS q_punct_ratio,
           round(stop_ratio, 4) AS q_stopword_ratio,
           round(mean_tok_len, 4) AS q_mean_token_len,
           round(CAST(
             (CASE WHEN q_n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN stop_ratio > 0.01 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN mean_tok_len BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END)
             AS DOUBLE), 2) AS q_score
    FROM f
    """,
    tags=("text-analysis", "quality"),
    doc="document quality features + composite score for corpus filtering "
    "(length / punctuation / stopword / token-shape heuristics)",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.quality_features(docs.select("doc_id", "text")).drop("text")


@register(
    "t_tfidf",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS.format(c="text")} AS toks FROM documents
    ),
    n_docs AS (SELECT count(*) AS n FROM t),
    terms AS (SELECT unnest({_sql_list(POSITIVE_WORDS + NEGATIVE_WORDS)}) AS term),
    dfreq AS (
      SELECT term,
             (SELECT count(*) FROM t WHERE list_contains(toks, term)) AS df
      FROM terms
    ),
    idf AS (
      SELECT term, ln(CAST((SELECT n FROM n_docs) AS DOUBLE) / (1 + df)) AS idf
      FROM dfreq
    ),
    hits AS (
      SELECT t.doc_id, u.tok AS term, count(*) AS tf, any_value(len(t.toks)) AS n_toks
      FROM t, unnest(t.toks) AS u(tok)
      WHERE list_contains({_sql_list(POSITIVE_WORDS + NEGATIVE_WORDS)}, u.tok)
      GROUP BY t.doc_id, u.tok
    )
    SELECT h.doc_id,
           round(sum(h.tf * i.idf) / any_value(h.n_toks), 6) AS tfidf
    FROM hits h JOIN idf i USING (term)
    GROUP BY h.doc_id
    """,
    tags=("F8", "tfidf"),
    doc="dictionary TF-IDF scoring (news notebook cell 15: "
    "tfidf=dot(counts,idfs)/T): corpus document frequencies -> idf "
    "weights (tiny, broadcast) -> per-doc weighted hit sum / total "
    "tokens. Two scans total (df pass + scoring pass), lexicon join "
    "broadcast",
)
def t_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    lex = POSITIVE_WORDS + NEGATIVE_WORDS
    lex_arr = F.array(*[F.lit(w) for w in lex])
    toks_df = tokenized_documents(spark, sf_dir).select("doc_id", "toks")
    n_docs = toks_df.count()
    # document frequency per term (one pass over exploded lexicon hits)
    dfreq = (
        toks_df.select(
            F.explode(
                F.array_distinct(
                    F.filter(F.col("toks"), lambda x: F.array_contains(lex_arr, x))
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = dfreq.select(
        "term", F.log(F.lit(float(n_docs)) / (1 + F.col("df"))).alias("idf")
    )
    hits = (
        toks_df.select(
            "doc_id",
            F.size("toks").alias("n_toks"),
            F.explode(
                F.filter(F.col("toks"), lambda x: F.array_contains(lex_arr, x))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("n_toks").alias("n_toks"))
    )
    return (
        hits.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("idf")) / F.first("n_toks"), 6
            ).alias("tfidf")
        )
    )


@register(
    "t_unigram_ppl",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS.format(c="text")}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab)
    SELECT doc_id, count(*) AS n_tokens,
           round(exp(avg(-ln(cnt / total))), 4) AS ppl
    FROM toks JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("text", "quality", "language-model"),
    doc="unigram language-model perplexity per document — the CCNet-style "
    "perplexity quality gate for training-data curation. Vocabulary counts "
    "train in ONE shuffle over the corpus, the token->probability table is "
    "dimension-sized and broadcast-joins back, score = exp(mean -ln p(tok)); "
    "all built-in expressions, no Python. At 100 TB the vocab stays "
    "broadcastable (natural-language vocabularies grow ~sublinearly, Heaps' "
    "law); a too-big vocab degrades to a plain shuffle join, same algebra",
)
def t_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cached: feeds vocabulary training AND per-doc scoring — uncached
    # the explode over the shared tokenized corpus runs twice
    toks = tokenized_documents(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    toks = scoped_cache(toks)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    vt = vocab.crossJoin(F.broadcast(total))
    return (
        toks.join(F.broadcast(vt), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.exp(F.avg(-F.log(F.col("cnt") / F.col("total")))), 4
            ).alias("ppl"),
        )
    )


_BM25_TERMS = ["join", "window", "stream", "sort", "filter"]


@register(
    "t_bm25_topk",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({{toks}}) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE tok IN ({{terms}})
      GROUP BY doc_id, tok
    ),
    dfq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT tf.doc_id,
             ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS sc
      FROM tf
      JOIN dfq USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
           round(sum(sc), 6) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 20
    """.format(
        toks=_SQL_TOKS.format(c="text"),
        terms=", ".join(f"'{t}'" for t in _BM25_TERMS),
    ),
    tags=("text", "retrieval", "bm25"),
    doc="BM25 top-k lexical retrieval (operators/retrieval.py) — Okapi "
    "BM25 with the Lucene +1 idf floor over the engine's corpus "
    "normalization; the training-data primitive for retrieval-based "
    "decontamination and corpus mining. One tokenize pass filtered to "
    "query terms before the shuffle, query-sized df frame broadcast "
    "back, global top-k via TakeOrdered — never a full sort",
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk

    td = tokenized_documents(spark, sf_dir)
    return bm25_topk(td, _BM25_TERMS, "doc_id", "toks", k=20)


_BM25_TERMS_ALT = ["shuffle", "partition", "broadcast", "cache", "join"]

_BM25_RUN_SQL = """
    tf{s} AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE tok IN ({terms})
      GROUP BY doc_id, tok
    ),
    dfq{s} AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf{s} GROUP BY tok
    ),
    scored{s} AS (
      SELECT tf{s}.doc_id,
             ln(1 + (st.n - dfq{s}.df + 0.5) / (dfq{s}.df + 0.5))
               * (tf{s}.tf * 2.2)
               / (tf{s}.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS sc
      FROM tf{s}
      JOIN dfq{s} USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats st
    ),
    run{s} AS (
      SELECT doc_id, round(sum(sc), 6) AS bm25
      FROM scored{s} GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id ASC LIMIT 20
    )"""


@register(
    "t_rrf_fusion",
    sql=(
        """
    WITH toks AS (
      SELECT doc_id, unnest({toks}) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
    ),"""
        + _BM25_RUN_SQL.format(s="1", terms="{terms1}")
        + ","
        + _BM25_RUN_SQL.format(s="2", terms="{terms2}")
        + """,
    ranked AS (
      SELECT doc_id,
             CAST(round(1000000000.0
               / (row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) + 60))
               AS BIGINT) AS ru
      FROM run1
      UNION ALL
      SELECT doc_id,
             CAST(round(1000000000.0
               / (row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) + 60))
               AS BIGINT) AS ru
      FROM run2
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs_hit,
           round(CAST(sum(ru) AS DOUBLE) / 1000000000.0, 6) AS rrf
    FROM ranked GROUP BY doc_id
    """
    ).format(
        toks=_SQL_TOKS.format(c="text"),
        terms1=", ".join(f"'{t}'" for t in _BM25_TERMS),
        terms2=", ".join(f"'{t}'" for t in _BM25_TERMS_ALT),
    ),
    tags=("text", "retrieval", "rrf", "hybrid"),
    doc="reciprocal-rank fusion (retrieval.rrf_fuse — Cormack et al. "
    "2009) of two BM25 query formulations: the standard hybrid-"
    "retrieval merge (same operator fuses lexical + ANN runs). Each "
    "reciprocal 1/(60+rank) is pinned to integer 1e-9 units before the "
    "cross-run sum, so the fused score is exact long arithmetic in "
    "both engines. Fusion is candidate-sized by contract — two top-20 "
    "runs in, <=40 fused rows out; both runs score in ONE shared "
    "corpus pass (bm25_topk_multi: shared tokenize/stats/tf/df, "
    "per-run window rank — two separate bm25_topk calls measured "
    "189.9 s at 100x from doubled tokenize passes)",
)
def t_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk_multi, rrf_fuse_runs

    td = tokenized_documents(spark, sf_dir)
    runs = bm25_topk_multi(
        td, {"a": _BM25_TERMS, "b": _BM25_TERMS_ALT}, "doc_id", "toks", k=20
    )
    return rrf_fuse_runs(runs, "run", "doc_id", "bm25")


_BIGRAM_LAMBDA = 0.7


@register(
    "t_bigram_ppl",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS.format(c="text")} AS t FROM documents
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cu
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS total FROM uni),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2)
    ),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
      FROM big GROUP BY w1, w2
    )
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(exp(avg(-ln(
             {_BIGRAM_LAMBDA} * CAST(bc.cb AS DOUBLE) / u1.cu
             + {1.0 - _BIGRAM_LAMBDA} * CAST(u2.cu AS DOUBLE) / tot.total
           ))), 4) AS ppl
    FROM big b
    JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    JOIN uni u1 ON u1.tok = b.w1
    JOIN uni u2 ON u2.tok = b.w2
    CROSS JOIN tot
    GROUP BY b.doc_id
    """,
    tags=("text", "quality", "language-model"),
    doc="interpolated bigram language-model perplexity per document "
    "(Jelinek-Mercer smoothing, lambda=0.7 on the bigram MLE, 0.3 on "
    "the unigram): the stronger CCNet-style quality gate — boilerplate "
    "and keyword-stuffed docs score fluent under unigrams but have "
    "improbable TRANSITIONS. Counts train in two corpus shuffles "
    "(unigram + bigram); scoring joins the count tables back on token "
    "keys (broadcast at vocab scale, shuffle fallback above); score = "
    "exp(mean -ln p(w2|w1)); docs under 2 tokens have no transitions "
    "and are excluded by contract",
)
def t_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import bigram_perplexity

    td = tokenized_documents(spark, sf_dir)
    # broadcast_vocab=True: the fixture vocabulary is dimension-sized by
    # construction, and the explicit flag keeps plan construction lazy
    # (the default size-gate runs an eager tokenize+count job, which
    # plan dumps / HOF audits / lazy compositions would trigger)
    return bigram_perplexity(
        td, "doc_id", "toks", lam=_BIGRAM_LAMBDA, broadcast_vocab=True
    )


@register(
    "t_zipf_slope",
    sql=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS.format(c="text")}) AS w FROM documents
    ),
    cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w DESC) AS r FROM cnt
    ),
    pts AS (
      SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM rk WHERE r <= 1000
    )
    SELECT CAST(regr_count(y, x) AS BIGINT) AS n,
           round(CAST(regr_slope(y, x) AS DOUBLE), 6) AS slope,
           round(CAST(regr_intercept(y, x) AS DOUBLE), 6) AS intercept,
           round(CAST(regr_r2(y, x) AS DOUBLE), 6) AS r2
    FROM pts
    """,
    tags=("text", "diagnostics", "zipf"),
    doc="Zipf's-law fit over the corpus unigram distribution: "
    "log-frequency regressed on log-rank for the top-1000 tokens — the "
    "standard corpus-health diagnostic (a natural corpus slopes ~ -1; "
    "boilerplate-heavy or templated corpora flatten). One tokenize pass "
    "+ map-side-combined counts; ranking is TakeOrderedAndProject "
    "top-k, then REGR_* single-pass moments over <= 1000 rows",
)
def t_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import grouped_trend
    from ..operators.windows import global_topk

    td = tokenized_documents(spark, sf_dir)
    cnt = (
        td.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = global_topk(cnt, ["c", "w"], 1000, rank_col="r")
    pts = top.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    ).withColumn("__g", F.lit(1))
    out = grouped_trend(pts, ["__g"], "x", "y")
    return out.select(
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )
