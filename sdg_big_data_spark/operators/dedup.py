"""Deduplication operators for training-data pipelines.

Four tiers, cheapest-first — the standard large-corpus dedup ladder:

1. **Exact** — md5 fingerprint of normalized text, hash-groupBy. One
   shuffle of (16-byte key, id); at 100 TB this is the cheapest possible
   full-corpus pass.
2. **MinHash + LSH** — shingle → 64-bit arithmetic hash → k minhash
   values → band buckets → candidates share a band bucket → verify with
   exact Jaccard. Candidate generation is an equi-join on band signature,
   so Catalyst gives a hash-shuffle join; no all-pairs blowup. The
   encoder is a pure per-row hash (``portable_hash60``) — NO vocabulary
   dictionary is built, so nothing corpus-sized is ever broadcast or
   shuffled for encoding (a dictionary has ~corpus-many distinct
   shingles at 100 TB; broadcasting it OOMs the driver).
3. **SimHash** — bitwise majority over token hashes; near-dups differ in
   few bits. Bucketed by rotated prefixes for scale.
4. **N-gram Jaccard (all candidate pairs)** — the exact verifier; only
   ever run on LSH candidates (or small corpora, as in the oracle tests).

Everything is built-in expressions — deterministic, engine-portable
(every hash is explicit integer arithmetic, no engine-native ``hash()``),
so the DuckDB oracle can replay it bit-for-bit.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..cachescope import scoped_cache
from ..functions import text as T
from . import windows

# Fixed affine-permutation constants for minhash (public-domain technique:
# Broder 1997, "On the resemblance and containment of documents").
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_PERMS: list[tuple[int, int]] = [
    (1431655781, 1183186591),
    (1284865837, 1091562949),
    (1149582355, 1387288217),
    (1053253627, 1974591399),
    (984083771, 746147807),
    (912541517, 1676447807),
    (857171101, 541088063),
    (799199663, 1463708143),
]


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: fingerprint → (canonical id, copy count).
    Canonical = min id (deterministic)."""
    return (
        df.select(F.col(id_col), T.doc_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct word-n-gram shingles."""
    return df.select(
        F.col(id_col), F.explode(T.shingles(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity (ids a < b).

    Scale note: quadratic in docs sharing a shingle — this is the VERIFY
    stage; candidate generation at scale is :func:`minhash_lsh_candidates`.
    """
    # cached: feeds both sides of the self-join plus the size aggregate —
    # uncached, the tokenize→shingle chain runs 3x
    sh = scoped_cache(shingle_table(df, id_col, text_col, n))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 3,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via df-ordered prefix filtering
    (the MapReduce set-similarity join of Vernica/Carey/Li, SIGMOD 2010 —
    reference analogue: the LSH candidate path in ``minhash_lsh_candidates``
    trades exactness for fewer candidates; this form is exact).

    Returns (id_a, id_b, jaccard) for every pair with jaccard >= threshold,
    id_a < id_b. Guarantee: with tokens ordered by a single global total
    order (document frequency asc, shingle asc as tie-break), a pair with
    J >= t shares its globally-smallest common token inside BOTH prefixes
    of length ``n_sh - ceil(t * n_sh) + 1`` (J >= t implies the overlap
    i >= t * max(n_a, n_b), so fewer than i tokens fit outside either
    prefix). Candidates therefore come from a prefix-token equi-join —
    never the full inverted index.

    Scale shape (100 TB): linear shuffles only — (a) token df aggregate,
    (b) df join-back + per-doc sort (keyed by doc id, doc-sized groups),
    (c) prefix-token self-join over LIGHT rows (id, size, token) whose
    fan-out is bounded by the rarest tokens of each doc (df-ascending
    order makes prefix tokens the most selective ones), (d) candidate
    pairs join back to the per-doc shingle arrays (each array shuffled
    once per doc, not once per prefix token — the alternative VernicaJoin
    "kernel" layout that carries arrays in the prefix records multiplies
    payload by the prefix length, which loses badly below t≈0.9) and
    verify with a pure array intersect. Nothing corpus-derived is
    broadcast: the df table joins back by shuffle, and AQE may only
    broadcast it at toy scale.

    Contract note: the qualifying-PAIR set itself is quadratic in the
    size of an exact-duplicate group (a clique of k copies emits k(k-1)/2
    pairs — that is the answer, not an implementation artifact). Run
    :func:`exact_dedup` first on corpora with heavy exact duplication;
    the hot prefix tokens a clique creates are handled by AQE skew split
    (measured: `tools/skew_probe.py` probe ``dup_clique_ssjoin_prefix``,
    worst task max/median 1.12 at sf0.1).
    """
    sh = scoped_cache(shingle_table(df, id_col, text_col, n))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("t_df"))
    # per-doc token array in global (df asc, shingle asc) order + size;
    # cached: feeds the prefix explode AND both sides of the verify join
    docs_arr = scoped_cache(
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("t_df", "shingle"))).alias("arr"))
        .select(
            F.col(id_col).alias("id"),
            F.transform("arr", lambda s: s["shingle"]).alias("toks"),
            F.size("arr").alias("n_sh"),
        )
    )
    # Prefix length is the textbook n - ceil(t*n) + 1 PLUS a 2-token
    # guard: ceil over the DOUBLE product t*n can land one above the
    # exact ceiling when t*n sits on an integer (e.g. fl(0.55*100) =
    # 55.00000000000001 → ceil 56, exact 55), and the verify stage's
    # double division grants qualifying pairs one more unit of slack —
    # either alone shortens the safe prefix by one and silently MISSES
    # an exactly-at-threshold pair. Two extra prefix tokens per doc
    # absorb both error sources; candidates only grow marginally and
    # the verify stage is exact either way.
    pref_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")).cast("int") + 3
    prefix = docs_arr.select(
        "id", "n_sh", F.explode(F.slice("toks", F.lit(1), pref_len)).alias("ptok")
    )
    a = prefix.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "ptok")
    b = prefix.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "ptok")
    cand = (
        a.join(b, "ptok")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter: J >= t forces t*n_a <= n_b <= n_a/t — relaxed
        # by the same 2-unit float guard (pruning only; verify is exact)
        .where(
            (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")) - 2)
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")) - 2)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = docs_arr.select(
        F.col("id").alias("id_a"), F.col("toks").alias("toks_a"),
        F.col("n_sh").alias("n_a"),
    )
    vb = docs_arr.select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"),
        F.col("n_sh").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("jaccard", n_inter / (F.col("n_a") + F.col("n_b") - n_inter))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash of a string: the first 15 hex chars of its md5
    parsed base-16. Pure per-row arithmetic — no vocabulary, no shuffle,
    no broadcast — and bit-identical in any engine with md5:
    Spark ``conv(substr(md5(x),1,15),16,10)``; DuckDB
    ``('0x' || substr(md5(x),1,15))::BIGINT``. Always in [0, 2^60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_ids(sh: DataFrame) -> DataFrame:
    """OPTIONAL dictionary-encode of shingles to dense ids (global rank
    over sorted shingles via ``windows.global_rank`` — never funnels
    through one partition). NOT the scale path: a 100 TB corpus has
    ~corpus-many distinct shingles, so joining the dictionary back is a
    second full shuffle at best. The default encoders below use
    ``portable_hash60`` instead (no dictionary at all); keep this form
    for bounded vocabularies where dense ids matter (e.g. matrix
    factorization inputs). Deliberately no broadcast hint — AQE decides."""
    dict_df = sh.select("shingle").distinct()
    return windows.global_rank(dict_df, ["shingle"], ascending=True, rank_col="sid")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, perm_index, minhash) — k minhash values per doc via fixed
    affine permutations over hash-encoded shingles.

    Encoding is ``portable_hash60 mod MINHASH_PRIME`` — one narrow
    projection, nothing corpus-derived is broadcast (the r1 dictionary
    broadcast is gone), and the DuckDB oracle replays the exact same
    arithmetic. sid < 2^31 and perm coefficients < 2^31, so
    ``a*sid + b`` stays < 2^62 — no signed-64 overflow anywhere.

    ``shingles``: pass a precomputed (usually cached) ``shingle_table``
    frame to share the tokenize→shingle pass with other consumers (the
    Jaccard verify in ``pipelines.dataprep.near_dup_removal`` reads the
    same table) — identical output, one fewer corpus pass."""
    sh = shingles if shingles is not None else shingle_table(df, id_col, text_col, n)
    enc = sh.select(
        F.col(id_col),
        (portable_hash60(F.col("shingle")) % F.lit(MINHASH_PRIME))
        .cast("long")
        .alias("sid"),
    )
    # All k permutation minima as conditional aggregates in ONE
    # groupBy(id) — the shuffle carries 1 row per shingle (map-side
    # partial min collapses each partition to one row per doc) instead
    # of k exploded rows; the wide row then unpivots to the (id, perm,
    # minhash) contract with a zero-shuffle stack.
    mins = [
        F.min(
            (F.lit(a).cast("long") * F.col("sid") + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"__m{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    wide = enc.groupBy(id_col).agg(*mins)
    stack_expr = ", ".join(
        f"{i}L, __m{i}" for i in range(len(MINHASH_PERMS))
    )
    return wide.select(
        F.col(id_col),
        F.expr(
            f"stack({len(MINHASH_PERMS)}, {stack_expr}) AS (perm, minhash)"
        ),
    )


def minhash_bands(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, rows_per_band: int = 2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, band, __m0..__m{r-1}) — LSH band rows over the minhash
    signature. Band signature as ``rows_per_band`` LONG columns (one
    conditional max per in-band position — exactly one row per perm
    exists), not a sorted-collect_list string: the fixed-width form
    skips per-group list building + sort + string formatting and joins
    on narrow integer keys. The candidate-pair OUTPUT downstream is
    identical, so the oracle's banding SQL is unaffected."""
    sig = minhash_signatures(df, id_col, text_col, n, shingles=shingles)
    mcols = [
        F.max(
            F.when(F.col("perm") % rows_per_band == i, F.col("minhash"))
        ).alias(f"__m{i}")
        for i in range(rows_per_band)
    ]
    return (
        sig.withColumn("band", F.floor(F.col("perm") / rows_per_band))
        .groupBy(id_col, "band")
        .agg(*mcols)
    )


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, rows_per_band: int = 2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ANY band of their minhash
    signature. Banding = groupBy band signature + self-join — pure
    equi-joins, shuffle on (band, signature) only. ``shingles`` as in
    :func:`minhash_signatures`."""
    bands = minhash_bands(df, id_col, text_col, n, rows_per_band, shingles)
    bands = scoped_cache(bands)  # self-joined below — without the cache the full signature
    # pipeline (scan → shingle → dict → encode → min-agg) runs twice
    keys = ["band"] + [f"__m{i}" for i in range(rows_per_band)]
    x = bands.select(F.col(id_col).alias("id_a"), *keys)
    y = bands.select(F.col(id_col).alias("id_b"), *keys)
    return (
        x.join(y, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def incremental_dedup(
    new_docs: DataFrame,
    index_docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """Status of each NEW doc against an already-ingested INDEX corpus —
    the production shape for continuously-ingested corpora (a new crawl
    batch dedups against the standing index, not by re-deduping the
    whole corpus). Returns (id, status) for every new doc:

    - ``'exact_dup'`` — normalized-text fingerprint already indexed;
    - ``'near_dup'`` — shingle-Jaccard >= ``threshold`` with some
      indexed doc among the cross-corpus LSH band candidates;
    - ``'kept'`` — neither.

    Within-batch duplicates are OUT of scope by contract (run
    :func:`~..pipelines.dataprep.near_dup_removal` on the batch first);
    status priority is exact > near, and the near stage only examines
    non-exact survivors — cheaper, same statuses.

    Scale shape: the index side is touched by (a) one fingerprint
    aggregate and (b) one band frame — both linear passes with narrow
    outputs; the candidate join is new-bands x index-bands on the band
    key (never all-pairs, and never index x index); the verify walk is
    O(Σ_pairs shingles) exactly as in ``near_dup_removal``. Each side's
    regex tokenizer runs ONCE into a scoped-cached (id, tokens) frame
    that the fingerprint, band and shingle derivatives all read (the
    uncached form re-tokenized each side three times — the dominant
    cost of the whole operator at fixture scale). At 100 TB
    the index's fingerprint + band frames are the natural thing to
    PERSIST between batches (both are id-plus-hash width, a tiny
    fraction of corpus bytes) — this function recomputes them from
    ``index_docs`` so the oracle can replay everything from raw text."""
    toks_new = scoped_cache(
        new_docs.select(F.col(id_col), T.tokenize(F.col(text_col)).alias("__toks"))
    )
    toks_idx = scoped_cache(
        index_docs.select(F.col(id_col), T.tokenize(F.col(text_col)).alias("__toks"))
    )
    fps = toks_new.select(
        F.col(id_col), T.doc_fingerprint_from_tokens(F.col("__toks")).alias("fp")
    )
    idx_fp = toks_idx.select(
        T.doc_fingerprint_from_tokens(F.col("__toks")).alias("fp")
    ).distinct()
    # cached: three consumers (the anti-join feeding bands, the one
    # feeding shingles, and the final status join) would otherwise each
    # re-run the INDEX-side fingerprint aggregate — the expensive pass
    # here. The frame is new-batch-id-sized, never index-sized.
    exact = scoped_cache(
        fps.join(idx_fp, "fp", "left_semi").select(
            F.col(id_col), F.lit(True).alias("is_exact")
        )
    )
    rest_toks = toks_new.join(exact.select(id_col), id_col, "left_anti")

    def _sh(toks_frame: DataFrame) -> DataFrame:
        return toks_frame.select(
            F.col(id_col),
            F.explode(T.shingles_from_tokens(F.col("__toks"), n)).alias("shingle"),
        )

    keys = ["band"] + [f"__m{i}" for i in range(rows_per_band)]
    b_new = minhash_bands(
        rest_toks, id_col, text_col, n, rows_per_band, shingles=_sh(rest_toks)
    ).select(F.col(id_col).alias("id_new"), *keys)
    b_idx = minhash_bands(
        toks_idx, id_col, text_col, n, rows_per_band, shingles=_sh(toks_idx)
    ).select(F.col(id_col).alias("id_idx"), *keys)
    cand = scoped_cache(
        b_new.join(b_idx, keys).select("id_new", "id_idx").distinct()
    )
    sh_new = _sh(rest_toks).join(
        cand.select(F.col("id_new").alias(id_col)).distinct(), id_col, "left_semi"
    )
    sh_idx = _sh(toks_idx).join(
        cand.select(F.col("id_idx").alias(id_col)).distinct(), id_col, "left_semi"
    )
    sz_new = sh_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_new"))
    sz_idx = sh_idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_idx"))
    inter = (
        cand.join(sh_new.select(F.col(id_col).alias("id_new"), "shingle"), "id_new")
        .join(sh_idx.select(F.col(id_col).alias("id_idx"), "shingle"), ["id_idx", "shingle"])
        .groupBy("id_new", "id_idx")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    near = (
        inter.join(sz_new.select(F.col(id_col).alias("id_new"), "n_new"), "id_new")
        .join(sz_idx.select(F.col(id_col).alias("id_idx"), "n_idx"), "id_idx")
        .where(
            F.col("n_inter")
            / (F.col("n_new") + F.col("n_idx") - F.col("n_inter"))
            >= threshold
        )
        .select(F.col("id_new").alias(id_col))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    return (
        new_docs.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def simhash_of_tokens(
    toks: DataFrame, id_col: str, bits: int = 16, tok_col: str = "tok"
) -> DataFrame:
    """SimHash fingerprint from PRE-TOKENIZED rows (one row per (id,
    token)): bit b set iff the majority of token hashes have bit b set.
    The seam for non-text tokenizations — byte-gram rows from
    ``multimodal.payload_near_dup_pairs`` feed this directly, skipping
    the join-into-a-string / re-split round trip (and its interpreted
    array lambdas) entirely.

    Token hash = ``portable_hash60 mod 2^32`` — per-row projection, no
    token dictionary, nothing corpus-derived broadcast (r1's
    global-rank-dictionary + broadcast-join encoder is gone)."""
    enc = toks.select(
        F.col(id_col), (portable_hash60(F.col(tok_col)) % F.lit(2**32)).alias("h")
    )
    # Integer bit ops only (portable to any SQL oracle): bit b of h is
    # (h >> b) & 1. All ``bits`` majority votes run as conditional sums
    # in ONE aggregation — bit b of the fingerprint is set iff
    # 2*ones_b > n (strict majority; +1/-1 vote sum > 0 is the same
    # predicate). vs the explode-per-bit form this shuffles 1 row per
    # token instead of ``bits`` rows, and map-side partial aggregation
    # collapses each partition to one row per doc before the exchange —
    # at 100 TB the shuffle carries docs, not doc*token*bit rows.
    ones = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"__o{b}")
        for b in range(bits)
    ]
    g = enc.groupBy(id_col).agg(*ones, F.count(F.lit(1)).alias("__n"))
    # Fingerprint fold as ARITHMETIC, not a when-chain: shiftleft(cast
    # (majority as long), b), summed as a balanced tree. Same values —
    # bit b is 1 iff 2*ones_b > n either way — but the expression tree
    # is ~3x smaller and not left-deep, which is measurably cheaper to
    # OPTIMIZE: the 16-deep Add(When(...)) chain cost 0.25 s of pure
    # Catalyst time per fresh plan at bits=16 (profiled r4; execution
    # cost is identical since both forms codegen to branch-free longs).
    bit_terms = [
        F.shiftleft((F.col(f"__o{b}") * 2 > F.col("__n")).cast("long"), b)
        for b in range(bits)
    ]
    while len(bit_terms) > 1:
        bit_terms = [
            bit_terms[i] + bit_terms[i + 1] if i + 1 < len(bit_terms) else bit_terms[i]
            for i in range(0, len(bit_terms), 2)
        ]
    return g.select(F.col(id_col), bit_terms[0].alias("simhash"))


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash fingerprint over a text column: tokenize (lowercase,
    URL-strip, accent-fold, split on non-alphanumerics), then the
    majority-vote fold of ``simhash_of_tokens``. Near-dups → small
    Hamming distance. Pure integer arithmetic (portable)."""
    toks = df.select(F.col(id_col), F.explode(T.tokenize(F.col(text_col))).alias("tok"))
    return simhash_of_tokens(toks, id_col, bits)


def simhash_band_pairs(
    fp: DataFrame,
    id_col: str,
    bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming equi-join over a precomputed fingerprint frame
    (columns ``id_col, simhash``): band the fingerprint into
    ``bits/band_bits`` chunks, equi-join on (band, chunk value) —
    pigeonhole guarantees any pair within ``bits/band_bits - 1`` Hamming
    distance shares at least one band — then verify ``bit_count(xor) <=
    max_hamming`` on the candidates. Callers should pass an already
    cached/materialized ``fp``: its DAG feeds both sides of the
    self-join."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = fp.select(
        F.col(id_col),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "chunk",
        F.expr(f"(simhash >> (band * {band_bits})) & {mask}"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"), "band", "chunk"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"), "band", "chunk"
    )
    # The Hamming verify is a per-row bit_count — run it in the join
    # stage, so pairs failing the threshold die before any exchange. A
    # pair can arrive via up to ``n_bands`` band matches; instead of a
    # distinct (a full extra shuffle carrying every surviving pair — at
    # corpus scale the OUTPUT is the big frame), emit each pair exactly
    # once by keeping only its FIRST matching band: band k matches iff
    # chunk k of fp_a ^ fp_b is zero, so "no earlier band matched" is a
    # pure map-side expression over the pair's fingerprints.
    first_band = " AND ".join(
        f"(band <= {k} OR (((fp_a ^ fp_b) >> {k * band_bits}) & {mask}) != 0)"
        for k in range(n_bands - 1)
    ) or "true"
    return (
        a.join(b, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.expr(first_band))
        .withColumn("hamming", F.expr("bit_count(fp_a ^ fp_b)").cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pair generation at scale: band the
    fingerprint into ``bits/band_bits`` chunks, equi-join on (band,
    chunk value) — pigeonhole guarantees any pair within
    ``bits/band_bits - 1`` Hamming distance shares at least one band —
    then verify ``bit_count(xor) <= max_hamming`` on the candidates.

    Same shape as MinHash-LSH: candidate generation is a hash join, the
    quadratic step never materializes.

    **bits/band_bits are the scale knobs**: candidate volume is
    Σ n_bucket² over ``bits/band_bits`` bandings with ``2^band_bits``
    chunk values each. The DEFAULT is the scale-safe setting —
    bits=32/band_bits=8 gives 4 bands x 256 chunks = 1024 distinct band
    keys with the pigeonhole guarantee intact (bands = bits/band_bits
    must stay > max_hamming). The old 16/4 setting (64 band keys)
    saturated quadratic once the corpus outgrew them — measured 18x
    wall on 10x docs — and is still reachable explicitly where a
    16-bit fingerprint is the contract."""
    # cached: the fingerprint DAG (tokenize → dictionary → votes) feeds
    # both sides of the band self-join
    fp = scoped_cache(simhash(df, id_col, text_col, bits))
    return simhash_band_pairs(fp, id_col, bits, band_bits, max_hamming)


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of
    its distinct word n-gram shingles that appear anywhere in the
    benchmark corpus — the standard train/eval overlap gate run before
    training on web-scale data.

    Scale shape: the benchmark shingle set is evaluation-suite-sized
    (thousands of docs, not the corpus), so it broadcasts; the train side
    pays one narrow shingle pass + a broadcast hash join + one groupBy —
    the corpus never shuffles by shingle. The shingle array is staged
    once per doc (multiply-referenced non-cheap alias survives
    CollapseProject) so size() and explode share one tokenize.

    Returns ``(id, n_shingles, n_overlap, contamination)`` for EVERY
    train doc — zero-shingle docs report 0.0, not a dropped row.
    """
    bsh = (
        bench.select(F.explode(T.shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    staged = train.select(F.col(id_col), T.shingles(F.col(text_col), n).alias("__sh"))
    ex = staged.select(
        F.col(id_col),
        F.size("__sh").alias("n_shingles"),
        F.explode_outer("__sh").alias("sh"),
    )
    per_doc = (
        ex.join(F.broadcast(bsh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_overlap"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_shingles",
        "n_overlap",
        F.when(
            F.col("n_shingles") > 0, F.col("n_overlap") / F.col("n_shingles")
        )
        .otherwise(F.lit(0.0))
        .alias("contamination"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span detection — the token-window form of
    exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499). The reference's
    dedup surface stops at whole-document fingerprints; span-level dedup
    is what catches boilerplate (licenses, headers, templated paragraphs)
    repeated INSIDE otherwise-distinct documents.

    Strategy (suffix-array-free — Spark-native):

    1. roll an ``n``-token window over every document:
       (id, pos, md5(window)) — a narrow map (tokenize once per row,
       windows via positional n-grams), linear in corpus tokens;
    2. one hash-shuffle: window-hash → count(DISTINCT doc); keep hashes
       seen in ``>= min_docs`` documents. This replaces the suffix
       array's global sort with a groupBy Catalyst map-side-combines;
    3. join matched hashes back (equi-join on the 16-byte hash) and merge
       each document's matched windows into MAXIMAL spans: windows cover
       [pos, pos+n); a window starts a new span iff its pos exceeds the
       running max end of all earlier windows (classic interval merge,
       expressed as two keyed window functions — no per-doc Python).

    Output: one row per maximal duplicated span —
    (id, span_start, span_len, n_windows), token offsets 0-based.

    Scale: both shuffles are linear in total windows (~tokens); nothing
    is quadratic in documents or corpus size. At 100 TB the step-2
    output (hashes repeated across docs) is boilerplate-sized, far
    smaller than the corpus, so the step-3 join's build side stays
    small; a skewed mega-hash (a license header in 10^8 docs) spreads
    across tasks because the join key is (hash), not (doc).
    """
    from pyspark.sql.window import Window

    wins = df.select(
        F.col(id_col),
        F.posexplode(T.ngrams(T.tokenize(F.col(text_col)), n)).alias(
            "pos", "__gram"
        ),
    ).select(id_col, "pos", F.md5("__gram").alias("__h"))
    wins = scoped_cache(wins)
    dup_h = (
        wins.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h")
    )
    matched = wins.join(dup_h, "__h").select(
        id_col, "pos", (F.col("pos") + n).alias("__end")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = matched.withColumn(
        "__new",
        F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "__grp",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("__end") - F.min("pos")).alias("span_len"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("__grp")


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Corpus-level line deduplication — the C4 cleaning rule (Raffel et
    al. 2020, arXiv:1910.10683 §2.2: drop repeated lines corpus-wide)
    generalized to keep-first semantics: every distinct non-empty line
    keeps exactly its FIRST occurrence (smallest ``(id, pos)``) across
    the whole corpus; later copies — boilerplate navigation, cookie
    banners, licence footers — are dropped, and each document is
    reassembled in original line order.

    Strategy (three linear shuffles, nothing quadratic):

    1. ``posexplode(split(text, sep))`` — narrow, one row per line;
    2. first-occurrence per line via ``groupBy(line).agg(min(struct(id,
       pos)))`` — an *aggregation*, not a window: Catalyst map-side
       partial-combines it, so a footer line duplicated 10^9 times
       reduces to one row per map task BEFORE the shuffle (the
       ``row_number() OVER (PARTITION BY line)`` form would sort the
       entire mega-group in one task);
    3. equi-join the keeper set back on the line value (skew handled by
       AQE — build side is one row per distinct line) and flag each
       occurrence as kept/dropped;
    4. one ``groupBy(id)`` reassembles kept lines in position order
       (``array_sort`` over ``collect_list(struct(pos, line))`` — per-doc
       state only, bounded by document size, never corpus-sized).

    Output: one row per input document that has at least one non-empty
    line — (id, ``out_col`` deduped text, n_lines, n_kept).

    ``sep`` is a LITERAL separator on both sides: ``split`` takes a
    Java regex, so it is \\Q…\\E-quoted (Pattern.quote semantics) to
    match the literal ``array_join`` on reassembly — a separator like
    ``"."`` or ``"|"`` splits on the exact character, not the regex.
    """
    # Pattern.quote: wrap in \Q…\E, breaking out of any embedded \E
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_rx)).alias("pos", "__line"),
        )
        .where(F.col("__line") != "")
    )
    lines = scoped_cache(lines)
    firsts = lines.groupBy("__line").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "__first"
        )
    )
    flagged = lines.join(firsts, "__line").select(
        F.col(id_col),
        "pos",
        "__line",
        (
            (F.col(id_col) == F.col("__first.i")) & (F.col("pos") == F.col("__first.p"))
        ).alias("__keep"),
    )
    kept_struct = F.when(
        F.col("__keep"),
        F.struct(F.col("pos").alias("p"), F.col("__line").alias("l")),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["l"]
            ),
            sep,
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
    )
