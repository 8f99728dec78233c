"""Text functions — SURVEY.md §2.9 string family, §2.10 F7/F8, plus the
LLM-training-data text-analysis operators (language ID, quality scoring,
token counting, fingerprinting).

Everything here is built-in-expression based (JVM codegen, no Python
UDFs): at 100 TB of documents, per-row Python is the difference between
hours and weeks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_RE = r"http\S+"
# Accent-fold map mirroring the reference's regexp_replace chains
# (`build_random_sets.py:52-62`), as one translate() call.
_ACCENT_SRC = "áàâãäéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑ"
_ACCENT_DST = "aaaaaeeeeiiiiooooouuuucnyAAAAAEEEEIIIIOOOOOUUUUCN"
TOKEN_SPLIT_RE = r"[^a-z0-9']+"
# A token is a maximal run of token characters in normalized text; the
# two regexes below count tokens/token chars in ONE codegen regex pass
# (r10) — the same values as size()/length-fold over the split array,
# without materializing the array or paying interpreted lambda filters.
TOKEN_RUN_RE = r"[a-z0-9']+"
TOKEN_CHAR_RE = r"[a-z0-9']"


def _word_alt_re(words: list[str]) -> str:
    """Anchored alternation matching a WHOLE token (a maximal
    ``[a-z0-9']`` run) equal to one of ``words``: the lookarounds pin
    both run boundaries, so a match can only start where a token starts
    and must cover the whole token. ``regexp_count`` over it therefore
    equals ``size(filter(tokens, t -> t IN words))`` exactly — each
    matching token is counted once (only its start position can match,
    and the scan resumes after the consumed token) — in one compiled
    regex pass instead of a per-token interpreted ``array_contains``
    filter (r10: measured 4.5x on lang_id at the 10x fixture)."""
    return r"(?<![a-z0-9'])(?:" + "|".join(words) + r")(?![a-z0-9'])"


def strip_urls(col: Column) -> Column:
    """URL removal (`build_random_sets.py:38`)."""
    return F.regexp_replace(col, URL_RE, "")


def fold_accents(col: Column) -> Column:
    """Accent folding as a single translate() — one pass, vs the
    reference's 10 chained regexp_replace calls."""
    return F.translate(col, _ACCENT_SRC, _ACCENT_DST)


def normalize_text(col: Column) -> Column:
    """The reference's corpus normalization (`build_random_sets.py:38,50-62`):
    strip URLs → lowercase → fold accents."""
    return fold_accents(F.lower(strip_urls(col)))


def let(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` ONCE, bind it to a
    lambda variable, and build ``body`` over that variable.

    Why this exists: higher-order functions (transform/filter/aggregate)
    are interpreted (no whole-stage codegen, no common-subexpression
    elimination), so an expensive expression inlined into a lambda body is
    re-evaluated **per array element** — composing
    ``ngrams(tokenize(text))`` naively makes the regex tokenizer run once
    per gram, turning a 0.5 s pass into ~30 s at sf0.1. Wrapping the
    expensive input as ``transform(array(x), v -> body(v))[0]`` pins it to
    one evaluation per row regardless of how many times ``body``
    references it.
    """
    return F.transform(F.array(value), body)[0]


def tokenize(col: Column) -> Column:
    """Whitespace/punct tokenization of normalized text → array<string>,
    with empty tokens removed. Extracted as the maximal token runs in
    one codegen regex pass (r10): identical array — same maximal
    ``[a-z0-9']+`` runs in the same left-to-right order, no boundary
    empties — as ``filter(split(norm, TOKEN_SPLIT_RE), t != '')``, whose
    per-token interpreted lambda filter measured 3.08 s vs 0.35 s for
    the extract form on the 10x corpus (eqNullSafe array equality:
    0/50,000 mismatches)."""
    return F.regexp_extract_all(
        normalize_text(col), F.lit(TOKEN_RUN_RE), F.lit(0)
    )


def tokens_of(df, col: str) -> Column:
    """The pre-tokenized passthrough seam: ``tokenize(col)`` when ``col``
    is a string column, or the column itself when it is already
    ``array<string>`` — so every token-consuming operator accepts either
    raw text or a shared tokenize-once materialization
    (``plans.shared_corpus.tokenized_documents``) without API forks. At
    100 TB you tokenize once and persist; re-deriving the same token
    arrays per operator was measured at ~28 s per query per 100x-fixture
    pass, the whole text family's floor."""
    from pyspark.sql.types import ArrayType

    dt = df.schema[col].dataType
    return F.col(col) if isinstance(dt, ArrayType) else tokenize(F.col(col))


def token_count(col: Column) -> Column:
    """Token counting for quality/budget accounting (BPE-ish proxy:
    whitespace tokens; sub-word inflation is a per-language constant
    applied downstream). Counted as ``regexp_count`` of maximal token
    runs over the normalized text — the same value as
    ``size(tokenize(col))`` without materializing the token array or
    paying the interpreted empty-token filter (r10)."""
    return F.regexp_count(normalize_text(col), F.lit(TOKEN_RUN_RE))


def ngrams(tokens: Column, n: int) -> Column:
    """Contiguous n-grams from a ``tokenize``-produced token array, as
    space-joined strings — ONE compiled-regex pass (r11) instead of the
    previous per-position interpreted ``transform(sequence,
    concat_ws(slice))`` chain (~30% faster per pass at sf0.1; the win
    grows with n since every slice copied n elements).

    How: the tokens are space-joined (the same string
    ``doc_fingerprint`` hashes), and a zero-width lookahead captures the
    n-token window at every token start:
    ``(?<![a-z0-9'])(?=(tok( tok){n-1}))`` — the lookbehind pins match
    positions to token starts (index 0 or after the single space), the
    lookahead CAPTURES without consuming, so windows overlap exactly as
    the positional form produced them: same grams, same left-to-right
    order, same multiplicity; fewer than n tokens → no match → empty
    array; null tokens → null (guarded — concat_ws would fold null to
    ''). CONTRACT: elements must be maximal ``[a-z0-9']+`` runs (every
    call site tokenizes first; property-tested against the positional
    form in tests/test_text_functions.py)."""
    pat = (
        r"(?<![a-z0-9'])(?=("
        + TOKEN_RUN_RE
        + (" " + TOKEN_RUN_RE) * (n - 1)
        + r"))"
    )

    def body(t: Column) -> Column:
        return F.when(
            t.isNull(), F.lit(None).cast("array<string>")
        ).otherwise(F.regexp_extract_all(F.concat_ws(" ", t), F.lit(pat), F.lit(1)))

    return let(tokens, body)


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) for near-dup detection."""
    return shingles_from_tokens(tokenize(col), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """:func:`shingles` over an ALREADY-tokenized array — lets a consumer
    that needs several token derivatives (fingerprint + shingles + bands)
    run the regex tokenizer once and share the frame."""
    return F.array_distinct(ngrams(toks, n))


def doc_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of normalized, whitespace-collapsed text.
    md5 is identical across engines → oracle-checkable."""
    return doc_fingerprint_from_tokens(tokenize(col))


def doc_fingerprint_from_tokens(toks: Column) -> Column:
    """:func:`doc_fingerprint` over an already-tokenized array (same
    md5-of-space-joined-tokens value — the normalized token stream IS the
    fingerprint input)."""
    return F.md5(F.concat_ws(" ", toks))


# --- language ID (n-gram/stopword heuristic) --------------------------------

# Tiny built-in stopword profiles; a real deployment swaps in fasttext via
# the scoring operator (operators/scoring.py). Heuristic = count of
# language-marker word hits, argmax with deterministic tiebreak.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with", "fast"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "que", "sur", "avec"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "auf"],
}


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hits, 'und' when no
    marker fires. Deterministic tiebreak: alphabetically-first language
    wins (struct max compares (hits, pref) lexicographically, so the
    preference rank is descending-alphabet). Marker hits are one
    anchored-alternation ``regexp_count`` per language over the
    let-bound normalized text (r10: a compiled regex scan per profile
    replaces the per-token interpreted ``array_contains`` filter —
    value-identical, measured 5.32 s → 1.17 s on the 10x fixture)."""
    langs = sorted(LANG_MARKERS, reverse=True)  # pref i: higher = earlier alphabet

    def body(norm: Column) -> Column:
        scored = F.array(
            *[
                F.struct(
                    F.regexp_count(
                        norm, F.lit(_word_alt_re(LANG_MARKERS[lang]))
                    ).alias("hits"),
                    F.lit(i).alias("pref"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(langs)
            ]
        )
        # let-bound: `best` is referenced twice, and interpreted
        # expressions get no CSE — unbound, the array_max over every
        # language profile would run twice per row.
        return let(
            F.array_max(scored),
            lambda best: F.when(best["hits"] > 0, best["lang"]).otherwise(
                F.lit("und")
            ),
        )

    # norm is let-bound: all four profile scans share ONE evaluation of
    # the normalize chain (URL strip → lower → accent fold).
    return let(normalize_text(col), body)


# --- quality scoring ---------------------------------------------------------

STOPWORDS_EN = LANG_MARKERS["en"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality features for corpus filtering: length, token count,
    mean token length, punctuation ratio, stopword ratio, and a composite
    0-1 score. All codegen'd expressions — one narrow pass."""
    c = F.col(text_col)
    n_chars = F.length(c)

    # The raw struct holds only COUNTERS, each ONE codegen regex pass
    # over the alias-bound normalized text (r10: regexp_count of token
    # runs / anchored stopword alternation / token chars replaces the
    # size + interpreted stopword filter + length fold over the split
    # array — value-identical, no array materialization, measured
    # 6.36 s → 4.88 s on the 10x fixture). Ratios and the composite
    # score derive from the counters in the OUTER projection, so each
    # counter evaluates once however often the score references it.
    norm = F.col("__qnorm")
    counters = F.struct(
        F.regexp_count(norm, F.lit(TOKEN_RUN_RE)).alias("n_tok"),
        F.regexp_count(norm, F.lit(_word_alt_re(STOPWORDS_EN))).alias(
            "n_stop"
        ),
        F.regexp_count(norm, F.lit(TOKEN_CHAR_RE)).alias("sum_len"),
        (n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))).alias(
            "n_punct"
        ),
    )

    # Two projections on purpose: __q (and __qnorm below it) are
    # expensive expressions referenced more than once; the alias
    # boundaries make each evaluate once (CollapseProject declines to
    # inline non-cheap multi-referenced aliases).
    q = F.col("__q")
    n_tok, n_stop = q["n_tok"], q["n_stop"]
    punct_ratio = F.when(n_chars > 0, q["n_punct"] / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, q["sum_len"] / n_tok).otherwise(F.lit(0.0))
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 2) & (mean_tok_len <= 12), F.lit(0.2)).otherwise(
            F.lit(0.0)
        )
    )
    return (
        df.withColumn("__qnorm", normalize_text(c))
        .withColumn("__q", counters)
        .select(
            "*",
            n_chars.alias("q_n_chars"),
            n_tok.cast("int").alias("q_n_tokens"),
            F.round(punct_ratio, 4).alias("q_punct_ratio"),
            F.round(stop_ratio, 4).alias("q_stopword_ratio"),
            F.round(mean_tok_len, 4).alias("q_mean_token_len"),
            F.round(score, 2).alias("q_score"),
        )
        .drop("__q", "__qnorm")
    )
