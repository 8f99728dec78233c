"""Catalog queries — corpus-curation operators for training-data
pipelines: repetition quality signals (the Gopher-style boilerplate
filters), PII redaction, and domain-mixture weighting.

The PII fixture PLANTS deterministic emails/phones derived from doc_id
before scrubbing — the raw fixture text contains none, and an oracle
that only ever checks zero matches would prove nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality
from .catalog import register, table
from .shared_corpus import tokenized_documents
from .text_queries import _SQL_TOKS

_TOKS = _SQL_TOKS.format(c="text")

# --- t_repetition -----------------------------------------------------------

_REPETITION_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    stats AS (
      SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS nd
      FROM toks
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
               AS gram
      FROM toks WHERE len(t) >= 2
    ),
    cnt AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram),
    top AS (
      SELECT doc_id, gram, c,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC)
               AS rn
      FROM cnt
    )
    SELECT s.doc_id, CAST(s.n_tokens AS INTEGER) AS n_tokens,
           round(CASE WHEN s.n_tokens > 0
                      THEN CAST(1 AS DOUBLE) - CAST(s.nd AS DOUBLE) / s.n_tokens
                      ELSE 0 END, 6) AS dup_token_frac,
           t.gram AS top_bigram,
           round(CASE WHEN s.n_tokens >= 2
                      THEN CAST(t.c AS DOUBLE) * 2 / s.n_tokens
                      ELSE 0 END, 6) AS top_bigram_frac
    FROM stats s LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
"""


@register(
    "t_repetition",
    sql=_REPETITION_SQL,
    tags=("text-quality", "curation"),
    doc="Gopher-style repetition signals: duplicate-token fraction + "
    "most-common-bigram coverage. Spark side is a pure NARROW map (sorted "
    "bigram run-fold inside the row — quality.repetition_signals); the "
    "oracle states the same answer as the textbook explode+groupBy+argmax",
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    out = quality.repetition_signals(td, "doc_id", "toks")
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
        "top_bigram",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


# --- t_pii_scrub ------------------------------------------------------------

_EMAIL_RE = quality.PII_PATTERNS["email"][0]
_PHONE_RE = quality.PII_PATTERNS["phone"][0]

_PLANTED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_PII_SQL = (
    "WITH planted AS (SELECT doc_id, "
    + _PLANTED
    + " AS text FROM documents)\n"
    + "SELECT doc_id,\n"
    + f"  len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,\n"
    + f"  len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phone,\n"
    + f"  regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),"
    + f" '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text\n"
    + "FROM planted"
)


@register(
    "t_pii_scrub",
    sql=_PII_SQL,
    tags=("pii", "curation"),
    doc="PII redaction (quality.scrub_pii): per-pattern match counts + "
    "masked text in one narrow projection. Emails/phones are planted "
    "deterministically from doc_id so the oracle checks real redactions, "
    "not a vacuous zero; patterns are RE2-compatible so both engines run "
    "the identical regex text",
)
def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return quality.scrub_pii(planted, "doc_id", "text")


# --- t_domain_mix -----------------------------------------------------------

_MIX_WEIGHTS = {
    "src0": 0.3,
    "src1": 0.25,
    "src2": 0.2,
    "src3": 0.15,
    "src4": 0.1,
}
_MIX_BUDGET = 20_000

_MIX_VALUES = ", ".join(
    f"('{s}', CAST({w} AS DOUBLE))" for s, w in sorted(_MIX_WEIGHTS.items())
)

_MIX_SQL = f"""
    WITH c AS (
      SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    w(source, share) AS (VALUES {_MIX_VALUES}),
    j AS (
      SELECT c.source, c.src_tokens,
             COALESCE(w.share, CAST(0 AS DOUBLE)) AS share
      FROM c LEFT JOIN w USING (source)
    )
    SELECT source, src_tokens, round(share, 6) AS share,
           round(least(CAST(1 AS DOUBLE), share * {_MIX_BUDGET} / src_tokens), 6)
             AS rate,
           CAST(floor(least(CAST(1 AS DOUBLE), share * {_MIX_BUDGET} / src_tokens)
                      * src_tokens) AS BIGINT) AS expected_tokens
    FROM j
"""


@register(
    "t_domain_mix",
    sql=_MIX_SQL,
    tags=("data-mixing", "curation"),
    doc="domain-mixture planning (quality.mixture_weights): per-source "
    "sampling rates hitting a target token distribution under a budget; "
    "one groupBy(source) + broadcast weight join; under-provisioned "
    "sources cap at rate 1 (the shortfall is reported, not silently "
    "re-normalized)",
)
def t_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    out = quality.mixture_weights(
        td, _MIX_WEIGHTS, _MIX_BUDGET, source_col="source", text_col="toks"
    )
    return out.select(
        "source",
        "src_tokens",
        F.round("share", 6).alias("share"),
        F.round("rate", 6).alias("rate"),
        "expected_tokens",
    )


# --- t_bpe_merges -----------------------------------------------------------

_BPE_K = 8


def _bpe_oracle_sql(k: int) -> str:
    """Unrolled k-round BPE oracle. Each round: pair counts over the
    encoded vocab, winning pair by (freq DESC, left ASC, right ASC),
    merge applied as the SAME literal left-to-right string replace the
    Spark operator uses — so every intermediate merge is value-exact."""
    ctes = [
        f"""w0 AS MATERIALIZED (
          SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY w
        ),
        e0 AS MATERIALIZED (
          SELECT '|' || array_to_string(regexp_split_to_array(word, ''), '||')
                     || '||</w>|' AS enc, freq
          FROM w0
        )"""
    ]
    for r in range(1, k + 1):
        p = r - 1
        ctes.append(f"""p{r} AS MATERIALIZED (
          SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq
          FROM (
            SELECT unnest(list_transform(range(1, len(s)),
                          i -> s[i] || '||' || s[i+1])) AS pair, freq
            FROM (SELECT string_split(substring(enc, 2, length(enc) - 2), '||')
                    AS s, freq FROM e{p})
          ) GROUP BY pair
        ),
        t{r} AS MATERIALIZED (
          SELECT {r} AS step,
                 split_part(pair, '||', 1) AS left_sym,
                 split_part(pair, '||', 2) AS right_sym,
                 pair_freq
          FROM p{r}
          ORDER BY pair_freq DESC, left_sym ASC, right_sym ASC LIMIT 1
        ),
        e{r} AS MATERIALIZED (
          SELECT replace(enc,
                   '|' || (SELECT left_sym FROM t{r}) || '||'
                       || (SELECT right_sym FROM t{r}) || '|',
                   '|' || (SELECT left_sym FROM t{r})
                       || (SELECT right_sym FROM t{r}) || '|') AS enc, freq
          FROM e{p}
        )""")
    union = "\n    UNION ALL ".join(
        f"SELECT step, left_sym, right_sym, pair_freq FROM t{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@register(
    "t_bpe_merges",
    sql=_bpe_oracle_sql(_BPE_K),
    tags=("bpe", "tokenizer", "curation"),
    doc="distributed BPE tokenizer training (operators/bpe.train_bpe): "
    "corpus touched ONCE (word-frequency shuffle, vocab-sized output); "
    "each merge round = pair-count groupBy over the weighted vocab + "
    "1-row collect + narrow merge map. The encoded-string merge "
    "(literal left-to-right replace) makes every round exactly "
    "replayable — the oracle unrolls all rounds as CTEs and matches the "
    "full merge table value-for-value",
)
def t_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe

    td = tokenized_documents(spark, sf_dir)
    merges, _vocab = train_bpe(td, "toks", n_merges=_BPE_K)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_freq long"
    )


def _bpe_apply_oracle_sql(k: int) -> str:
    """Oracle for merge APPLICATION: re-derives the k merges (same CTE
    chain as the training oracle), binds them as scalar constants, and
    applies the identical replace chain to every document's tokens."""
    base = _bpe_oracle_sql(k)
    with_body = base[len("WITH ") : base.index("\nSELECT step")].rstrip().rstrip(",")
    # bind each round's winner as columns of a 1-row consts relation
    consts = ", ".join(
        f"(SELECT left_sym FROM t{r}) AS l{r}, (SELECT right_sym FROM t{r}) AS r{r}"
        for r in range(1, k + 1)
    )
    chain = "'|' || array_to_string(regexp_split_to_array(w, ''), '||') || '||</w>|'"
    for r in range(1, k + 1):
        chain = (
            f"replace({chain}, '|' || l{r} || '||' || r{r} || '|', "
            f"'|' || l{r} || r{r} || '|')"
        )
    return f"""WITH {with_body},
    consts AS (SELECT {consts}),
    dt AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    applied AS (
      SELECT doc_id, len(t) AS n_tokens,
             list_transform(t, w -> len(string_split(
               substring({chain}, 2, length({chain}) - 2), '||'))) AS lens
      FROM dt, consts
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(COALESCE(list_sum(lens), 0) AS INTEGER) AS n_subtokens
    FROM applied"""


@register(
    "t_bpe_encode",
    sql=_bpe_apply_oracle_sql(_BPE_K),
    tags=("bpe", "tokenizer", "curation"),
    doc="BPE merge application (operators/bpe.bpe_segment): segment every "
    "document with the merges trained by t_bpe_merges — the merge table "
    "rides into the plan as literals (expression-level broadcast), so "
    "corpus encoding is a map-only stage; oracle re-derives the merges "
    "and replays the identical replace chain",
)
def t_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_segment, train_bpe

    td = tokenized_documents(spark, sf_dir)
    merges, _vocab = train_bpe(td, "toks", n_merges=_BPE_K)
    pairs = [(m[1], m[2]) for m in merges]
    staged = td.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        bpe_segment(F.col("toks"), pairs, pretokenized=True).alias("__syms"),
    )
    return staged.select(
        "doc_id", "n_tokens", F.size("__syms").alias("n_subtokens")
    )


# --- d_span_dup -------------------------------------------------------------

# Planted boilerplate (10 tokens, >= the 8-token window) appended to every
# 5th document: the raw fixture text shares no 8-token spans across docs,
# so an unplanted oracle would only ever prove "0 rows == 0 rows". Both
# engines derive the identical planted text from doc_id.
_SPAN_SUFFIX = (
    "this boilerplate license header is shared across many documents verbatim"
)
_SPAN_N = 8

_SPAN_SRC_SQL = f"""
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' {_SPAN_SUFFIX}'
                  ELSE text END AS text
      FROM documents
"""

_SPAN_WIN_SQL = f"""
    WITH src AS ({_SPAN_SRC_SQL}),
    toks AS (SELECT doc_id, {{toks}} AS t FROM src),
    wins AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(t[i:i+{_SPAN_N - 1}], ' ')) AS h
      FROM toks, LATERAL (
        SELECT unnest(range(1, len(t) - {_SPAN_N} + 2)) AS i
      ) r
      WHERE len(t) >= {_SPAN_N}
    ),
    dup AS (
      SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    m AS (
      SELECT w.doc_id, w.pos, w.pos + {_SPAN_N} AS e
      FROM wins w JOIN dup USING (h)
    ),
    flg AS (
      SELECT doc_id, pos, e,
             CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                   OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS nw
      FROM m
    ),
    grp AS (
      SELECT doc_id, pos, e,
             sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM flg
    )
    SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
           CAST(max(e) - min(pos) AS INTEGER) AS span_len,
           count(*) AS n_windows
    FROM grp GROUP BY doc_id, g
"""


@register(
    "d_span_dup",
    sql=_SPAN_WIN_SQL.format(toks=_TOKS),
    tags=("dedup", "span", "curation"),
    doc="cross-document duplicated-span detection "
    "(dedup.duplicated_spans): the token-window form of exact substring "
    "dedup (Lee et al., arXiv:2107.06499) — rolling 8-token window "
    "hashes, one linear hash-shuffle for the >=2-docs gate, equi-join "
    "back, interval-merge to maximal spans via two keyed windows. "
    "Catches boilerplate repeated INSIDE otherwise-distinct documents, "
    "which whole-document fingerprints cannot. Fixture plants a shared "
    "10-token suffix on every 5th doc",
)
def d_span_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup

    docs = table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.duplicated_spans(
        planted, "doc_id", "text", n=_SPAN_N, min_docs=2
    )


# --- t_url_canonical --------------------------------------------------------
# Planted URL variants (like the PII fixture): every doc derives a messy
# URL from doc_id — scheme/host case noise, www., default port, tracking
# params, unsorted params, fragment. Canonicalization must collapse the
# doc_id%7 x doc_id%3 grid to its true identity.

_URL_EXPR_SQL = """
      'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)
        || '.com:443/Shop/Item' || CAST(doc_id % 3 AS VARCHAR)
        || '/?utm_source=s' || CAST(doc_id AS VARCHAR)
        || '&ref=' || CAST(doc_id % 5 AS VARCHAR)
        || '&utm_medium=email#sec' || CAST(doc_id % 2 AS VARCHAR)
"""

_URL_CANON_SQL = f"""
    WITH src AS (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents),
    parsed AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        regexp_replace(regexp_replace(
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
          '^www\\.', ''), ':(80|443)$', '') AS host,
        regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')
          AS path,
        array_to_string(list_sort(list_filter(
          string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
          p -> p <> '' AND NOT regexp_matches(p,
            '^(utm_[A-Za-z0-9_]*|gclid|fbclid)='))), '&') AS qs
      FROM src
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://' || host || path
               || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
               AS canonical_url
      FROM parsed
    )
    SELECT doc_id, canonical_url,
           count(*) OVER (PARTITION BY canonical_url) AS n_same
    FROM canon
"""


@register(
    "t_url_canonical",
    sql=_URL_CANON_SQL,
    tags=("url", "dedup", "curation"),
    doc="URL canonicalization (quality.canonicalize_url): lowercase "
    "scheme/host, strip www./default ports/fragment, drop tracking "
    "params, SORT the rest — the group key of the web-corpus dedup "
    "ladder; a pure narrow regexp/array projection, zero shuffle; "
    "n_same counts crawl variants collapsing to one identity",
)
def t_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.quality import canonicalize_url

    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com:443/Shop/Item"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("/?utm_source=s"),
        F.col("doc_id").cast("string"),
        F.lit("&ref="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&utm_medium=email#sec"),
        (F.col("doc_id") % 2).cast("string"),
    )
    canon = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return canon.withColumn(
        "n_same", F.count(F.lit(1)).over(W.partitionBy("canonical_url"))
    )


# --- d_dsir_weights ---------------------------------------------------------

_DSIR_B = 512

_DSIR_SQL = f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, lang,
             unnest(t || list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks
    ),
    hb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {_DSIR_B} AS b
      FROM grams
    ),
    hist AS (
      SELECT b, count(*) AS cr,
             count(CASE WHEN lang = 'en' THEN 1 END) AS ct
      FROM hb GROUP BY b
    ),
    tot AS (SELECT sum(cr) AS r_tot, sum(ct) AS t_tot FROM hist),
    w AS (
      SELECT b,
             ln((ct + 0.5) / (t_tot + {_DSIR_B} * 0.5))
               - ln((cr + 0.5) / (r_tot + {_DSIR_B} * 0.5)) AS d
      FROM hist CROSS JOIN tot
    ),
    per AS (
      SELECT hb.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             sum(w.d) AS lw
      FROM hb JOIN w USING (b) GROUP BY hb.doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_grams, 0) AS n_grams,
           round(COALESCE(per.lw, 0.0), 6) AS dsir_logw
    FROM documents d LEFT JOIN per USING (doc_id)
"""


@register(
    "d_dsir_weights",
    sql=_DSIR_SQL,
    tags=("curation", "data-selection"),
    doc="DSIR importance log-weights (hashed unigram+bigram class models, "
    "target = lang='en' docs vs the whole pool): fit is one map-side-"
    "combined histogram to 512 rows; scoring embeds the log-ratio table "
    "as a literal codebook so the per-doc pass is zero-shuffle at any "
    "corpus size (arXiv:2302.03169)",
)
def d_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    return quality.dsir_logweights(
        td, F.col("lang") == "en", buckets=_DSIR_B, alpha=0.5, text_col="toks"
    )


# --- dq_k_anonymity ---------------------------------------------------------


@register(
    "dq_k_anonymity",
    sql="""
    WITH q AS (
      SELECT c_custkey, c_nationkey,
             CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band
      FROM customer
    ),
    sz AS (
      SELECT c_nationkey, bal_band, count(*) AS n_class
      FROM q GROUP BY 1, 2
    )
    SELECT q.c_custkey,
           CASE WHEN sz.n_class >= 5 THEN q.c_nationkey END AS c_nationkey,
           CASE WHEN sz.n_class >= 5 THEN q.bal_band END AS bal_band,
           sz.n_class,
           sz.n_class >= 5 AS is_k_anon
    FROM q JOIN sz ON q.c_nationkey IS NOT DISTINCT FROM sz.c_nationkey
                  AND q.bal_band IS NOT DISTINCT FROM sz.bal_band
    """,
    tags=("privacy", "data-quality"),
    doc="k-anonymity suppression gate (k=5) over quasi-identifiers "
    "(nation x balance band): equivalence classes below k get their "
    "quasi-ids nulled (Sweeney 2002) — the combination-level privacy "
    "floor PII regex scrubbing cannot give; one bounded-cardinality "
    "histogram + null-safe join back (NULL quasi values form an "
    "equivalence class; an equality join would drop those rows)",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    )
    return quality.k_anonymity(
        cust, ["c_nationkey", "bal_band"], k=5, id_col="c_custkey"
    )


# --- t_temperature_mix -------------------------------------------------------

_TEMP_ALPHA = 0.5
_TEMP_BUDGET = 20_000


@register(
    "t_temperature_mix",
    sql=f"""
    WITH c AS (
      SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS tot FROM c),
    p AS (
      SELECT source, src_tokens, src_tokens / tot AS p
      FROM c CROSS JOIN t
    ),
    z AS (SELECT sum(pow(p, {_TEMP_ALPHA})) AS z FROM p)
    SELECT source, src_tokens,
           round(pow(p, {_TEMP_ALPHA}) / z, 6) AS q,
           round(least(CAST(1 AS DOUBLE),
                       pow(p, {_TEMP_ALPHA}) / z * {_TEMP_BUDGET} / src_tokens),
                 6) AS rate,
           CAST(floor(least(CAST(1 AS DOUBLE),
                            pow(p, {_TEMP_ALPHA}) / z * {_TEMP_BUDGET} / src_tokens)
                      * src_tokens) AS BIGINT) AS expected_tokens
    FROM p CROSS JOIN z
    """,
    tags=("data-mixing", "curation"),
    doc="temperature-based domain mixture (alpha-sampling, alpha=0.5): "
    "q_s ~ p_s^alpha flattens the natural token distribution so "
    "low-resource sources are upsampled without a hand-curated target "
    "table; same one-pass + broadcast-normalizer shape as t_domain_mix",
)
def t_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = tokenized_documents(spark, sf_dir)
    return quality.temperature_mixture(
        td, _TEMP_ALPHA, _TEMP_BUDGET, source_col="source", text_col="toks"
    )


@register(
    "dq_chi2_drift",
    sql="""
    WITH r AS (
      SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n_ref
      FROM events WHERE day(ts) <= 15 GROUP BY event_type
    ),
    c AS (
      SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n_cur
      FROM events WHERE day(ts) > 15 GROUP BY event_type
    ),
    cats AS (
      SELECT COALESCE(r.category, c.category) AS category,
             COALESCE(r.n_ref, 0) AS n_ref,
             COALESCE(c.n_cur, 0) AS n_cur
      FROM r FULL OUTER JOIN c ON r.category IS NOT DISTINCT FROM c.category
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur,
             CAST(count(*) AS BIGINT) AS k
      FROM cats
    )
    SELECT category, n_ref, n_cur,
           round((n_ref + 0.5) / (t_ref + 0.5 * k) * t_cur, 6)
             AS expected_cur,
           round(power(n_cur - (n_ref + 0.5) / (t_ref + 0.5 * k) * t_cur, 2)
                 / ((n_ref + 0.5) / (t_ref + 0.5 * k) * t_cur), 6)
             AS chi2_term
    FROM cats CROSS JOIN tot
    """,
    tags=("data-quality", "drift"),
    doc="chi-square categorical drift between ingest windows "
    "(quality.chi2_categorical_drift): event-type mix of the first half "
    "of the month vs the second — the discrete sibling of dq_ks_drift "
    "(KS needs an ordered value). Two category histograms, full-outer "
    "join on the category key, Laplace-smoothed expected counts; "
    "category-sized everything after the two scans",
)
def dq_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import chi2_categorical_drift

    ev = table(spark, sf_dir, "events")
    ref = ev.where(F.dayofmonth("ts") <= 15)
    cur = ev.where(F.dayofmonth("ts") > 15)
    return chi2_categorical_drift(ref, cur, "event_type")


@register(
    "dq_key_skew",
    sql="""
    WITH h AS (
      -- 'v:' prefix disambiguates genuine '<NULL>' strings from real
      -- nulls (stripped in tk below), mirroring the engine
      SELECT COALESCE('v:' || CAST(l_partkey AS VARCHAR), '<NULL>') AS k,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS maxc
      FROM h
    ),
    tk AS (
      SELECT CASE WHEN min(h.k) = '<NULL>' THEN min(h.k)
                  ELSE substr(min(h.k), 3) END AS top_key
      FROM h, t WHERE h.c = t.maxc
    ),
    e AS (
      SELECT sum(-(CAST(c AS DOUBLE) / n_rows) * ln(CAST(c AS DOUBLE) / n_rows))
               AS hh
      FROM h, t GROUP BY n_rows
    )
    SELECT t.n_rows, t.n_keys, tk.top_key,
           round(CAST(t.maxc AS DOUBLE) / t.n_rows, 6) AS top_share,
           round(CAST(t.n_rows AS DOUBLE) / t.n_keys, 6) AS mean_rows_per_key,
           round(CASE WHEN t.n_keys > 1 THEN e.hh / ln(t.n_keys)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM t, tk, e
    """,
    tags=("data-quality", "skew", "diagnostics"),
    doc="join-key skew profile (quality.key_skew_profile) over the "
    "lineitem part key: rows, distinct keys, hottest key + its share, "
    "mean rows/key, normalized key-distribution entropy — the profile "
    "to run BEFORE keying a 100 TB shuffle (decides whether "
    "salted_join / AQE skew handling is needed). One corpus-touching "
    "histogram, three key-sized aggregates over its cache",
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import key_skew_profile

    li = table(spark, sf_dir, "lineitem")
    return key_skew_profile(li, "l_partkey")


@register(
    "dq_psi_drift",
    sql="""
    WITH vr AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE day(l_shipdate) <= 15 AND l_extendedprice IS NOT NULL
    ),
    vc AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE day(l_shipdate) > 15 AND l_extendedprice IS NOT NULL
    ),
    nn AS (SELECT count(*) AS c FROM vr),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM vr),
    pos AS (
      SELECT DISTINCT (j * nn.c) // 10 AS p
      FROM range(1, 10) t(j), nn WHERE (j * nn.c) // 10 > 0
    ),
    edges AS (
      SELECT list(v ORDER BY v) AS el FROM ranked JOIN pos ON ranked.r = pos.p
    ),
    binned AS (
      SELECT 0 AS side, len(list_filter(e.el, x -> x < vr.v)) AS bin
      FROM vr, edges e
      UNION ALL
      SELECT 1, len(list_filter(e.el, x -> x < vc.v)) FROM vc, edges e
    ),
    h AS (
      SELECT bin,
             CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur,
             CAST(count(*) AS BIGINT) AS k
      FROM h
    )
    SELECT bin, n_ref, n_cur,
           round((n_ref + 0.5) / (t_ref + 0.5 * k), 6) AS p_ref,
           round((n_cur + 0.5) / (t_cur + 0.5 * k), 6) AS p_cur,
           round(((n_cur + 0.5) / (t_cur + 0.5 * k)
                  - (n_ref + 0.5) / (t_ref + 0.5 * k))
                 * ln(((n_cur + 0.5) / (t_cur + 0.5 * k))
                      / ((n_ref + 0.5) / (t_ref + 0.5 * k))), 6) AS psi_term
    FROM h, tot
    """,
    tags=("data-quality", "drift", "psi"),
    doc="Population Stability Index drift gate "
    "(quality.psi_drift): extended-price distribution of the first "
    "half of the month vs the second, over the reference's EXACT "
    "decile cut points (scalable range-shuffle rank, replayed by the "
    "oracle's row_number — no percentile-interpolation divergence). "
    "Completes the drift family: KS (ordered), chi-square "
    "(categorical), PSI (binned numeric — the scorecard-monitoring "
    "standard). One cached ref pass + one union histogram pass",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import psi_drift

    li = table(spark, sf_dir, "lineitem")
    ref = li.where(F.dayofmonth("l_shipdate") <= 15)
    cur = li.where(F.dayofmonth("l_shipdate") > 15)
    return psi_drift(ref, cur, "l_extendedprice")


@register(
    "dq_cusum",
    sql="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS u,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    -- FLOOR-divided mean in exact long arithmetic: DuckDB's // (like
    -- Spark's DIV) truncates toward zero, so subtract the non-negative
    -- pmod remainder first — matches the engine on negative day sums
    x AS (SELECT day, (u - ((u % n + n) % n)) // n AS xv FROM d),
    p AS (
      SELECT day, xv,
             CAST(sum(xv - 4950) OVER (ORDER BY day) AS BIGINT) AS pp
      FROM x
    ),
    s AS (
      SELECT day, xv,
             pp - least(CAST(0 AS BIGINT), min(pp) OVER (ORDER BY day)) AS ss
      FROM p
    )
    SELECT day,
           round(CAST(xv AS DOUBLE) / 100, 2) AS mean_v,
           round(CAST(ss AS DOUBLE) / 100, 2) AS cusum,
           CAST(ss > 1000 AS INT) AS alert
    FROM s
    """,
    tags=("data-quality", "change-point", "cusum"),
    doc="one-sided CUSUM change-point detection (quality.cusum_alerts, "
    "Page 1954) over the daily mean event value: S_t = max(0, S_{t-1} "
    "+ x_t - k) via its closed form P_t - min(0, min prefix P) — a "
    "prefix sum + prefix min instead of a sequential loop. The WHEN "
    "companion to the PSI/KS/chi-square distribution gates. Exact: "
    "daily means are floor-divided integer 1e-2 units, k=49.50, "
    "h=10.00. One corpus-collapsing day aggregate; the window passes "
    "run on the day-sized series",
)
def dq_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import cusum_alerts

    ev = table(spark, sf_dir, "events")
    return cusum_alerts(ev, "ts", "value", k_units=4950, h_units=1000)


# --- d_line_dedup -----------------------------------------------------------

# The fixture corpus is single-line word soup, so both engines derive the
# SAME multi-line corpus from it first: a newline after every 5th word.
# The tiny shared vocabulary then yields heavy genuine cross-document
# line duplication — exactly the regime the operator exists for.
_LINE_DEDUP_SQL = r"""
    WITH lined AS (
      SELECT doc_id,
             regexp_replace(text, '((\S+ ){4}\S+) ', '\1' || chr(10), 'g') AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS arr FROM lined),
    lines AS (
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, arr[i] AS line
      FROM ls, LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i) r
      WHERE arr[i] <> ''
    ),
    -- keeper per line = min (doc_id, pos), encoded as a scalar (pos is
    -- bounded far below 10^6 in this fixture)
    firsts AS (
      SELECT line, min(doc_id * 1000000 + pos) AS k FROM lines GROUP BY line
    ),
    flagged AS (
      SELECT l.doc_id, l.pos, l.line,
             (l.doc_id * 1000000 + l.pos = f.k) AS keep
      FROM lines l JOIN firsts f USING (line)
    )
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS text_deduped,
           count(*) AS n_lines,
           count(*) FILTER (WHERE keep) AS n_kept
    FROM flagged GROUP BY doc_id
"""


@register(
    "d_line_dedup",
    sql=_LINE_DEDUP_SQL,
    tags=("dedup", "line", "curation"),
    doc="C4-style corpus-level line dedup (dedup.line_dedup, arXiv:"
    "1910.10683 §2.2) with keep-first semantics: first occurrence of "
    "every distinct line survives, later copies drop, documents "
    "reassemble in line order. Keeper selection is a partial-aggregable "
    "groupBy(line).min(struct) — never a per-line-group window sort, so "
    "a boilerplate line duplicated 10^9 times map-side-combines instead "
    "of sorting in one task",
)
def d_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import line_dedup

    docs = table(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"((\S+ ){4}\S+) ", "$1\n"
        ).alias("text"),
    )
    return line_dedup(lined, "doc_id", "text", sep="\n")


# --- t_gopher_rules ----------------------------------------------------------

_GOPHER_STOPS = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that']"

_GOPHER_SQL = rf"""
    WITH w AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                   / len(words), 4) AS mean_word_len,
             round(CAST(len(list_filter(words,
                     x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / len(words), 4) AS alpha_word_frac,
             round(CAST(length(text) - length(replace(text, '#', ''))
                     + (length(text) - length(replace(text, '...', ''))) / 3
                   AS DOUBLE) / len(words), 4) AS symbol_ratio,
             CAST(len(list_intersect(words, {_GOPHER_STOPS})) AS BIGINT)
               AS stop_hits
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
           stop_hits,
           CAST(n_words >= 30 AND n_words <= 10000 AS INTEGER) AS f_word_count,
           CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER)
             AS f_mean_word_len,
           CAST(alpha_word_frac >= 0.8 AS INTEGER) AS f_alpha_words,
           CAST(symbol_ratio <= 0.1 AS INTEGER) AS f_symbol_ratio,
           CAST(stop_hits >= 2 AS INTEGER) AS f_stop_words,
           CAST(n_words >= 30 AND n_words <= 10000 AS INTEGER)
             * CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER)
             * CAST(alpha_word_frac >= 0.8 AS INTEGER)
             * CAST(symbol_ratio <= 0.1 AS INTEGER)
             * CAST(stop_hits >= 2 AS INTEGER) AS pass_all
    FROM m
"""


@register(
    "t_gopher_rules",
    sql=_GOPHER_SQL,
    tags=("text", "quality", "curation"),
    doc="Gopher/MassiveText rule-based quality gate (quality."
    "gopher_quality_flags, arXiv:2112.11446 Table A1): word-count bounds, "
    "mean-word-length band, alphabetic-word fraction, symbol-to-word "
    "ratio, distinct-stop-word minimum — per-rule metrics + 0/1 flags + "
    "the conjunction. Pure narrow projection, zero shuffles at any "
    "corpus size",
)
def t_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import gopher_quality_flags

    docs = table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, "doc_id", "text", min_words=30,
                                max_words=10_000)


# --- dq_constraints -----------------------------------------------------------

_CONSTRAINTS_SQL = """
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(count(value) AS DOUBLE) / count(*) AS c_value,
             CAST(count(DISTINCT event_id) AS DOUBLE) / count(*) AS u_event,
             CAST(min(value) AS DOUBLE) AS min_value,
             CAST(sum(CASE WHEN event_type IN
                   ('click','view','purchase','signup','error')
                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS s_type
      FROM events
    )
    SELECT 'completeness(value)>=1.0' AS constraint,
           round(c_value, 6) AS metric,
           CAST(c_value >= 1.0 AS INTEGER) AS passed FROM m
    UNION ALL
    SELECT 'uniqueness(event_id)>=1.0', round(u_event, 6),
           CAST(u_event >= 1.0 AS INTEGER) FROM m
    UNION ALL
    SELECT 'min(value)>=0', round(min_value, 6),
           CAST(min_value >= 0 AS INTEGER) FROM m
    UNION ALL
    SELECT 'in_set(event_type)>=1.0', round(s_type, 6),
           CAST(s_type >= 1.0 AS INTEGER) FROM m
    UNION ALL
    SELECT 'row_count[1000,1000000000]', round(n, 6),
           CAST(n >= 1000 AND n <= 1000000000 AS INTEGER) FROM m
"""


@register(
    "dq_constraints",
    sql=_CONSTRAINTS_SQL,
    tags=("data-quality", "constraints"),
    doc="Deequ-style declarative verification suite (quality."
    "constraint_suite, Schelter et al. VLDB'18): completeness, exact "
    "uniqueness, value bound, set membership, row-count band — all "
    "evaluated in ONE map-side-combined aggregation pass to a single "
    "row, then a k-row explode; gate on min(passed), audit the metrics",
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import constraint_suite

    ev = table(spark, sf_dir, "events")
    return constraint_suite(
        ev,
        [
            ("completeness", "value", 1.0),
            ("uniqueness", "event_id", 1.0),
            ("min", "value", 0),
            ("in_set", "event_type",
             ("click", "view", "purchase", "signup", "error"), 1.0),
            ("row_count", 1000, 1_000_000_000),
        ],
    )
