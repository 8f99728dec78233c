"""Differential tests for the distributed BPE trainer (operators/bpe.py)
against a pure-Python classical reference implementation — merge tables
and final symbol sequences must be IDENTICAL, including tie-breaks."""

from __future__ import annotations

from collections import Counter

from sdg_big_data_spark.operators import bpe

# --- pure-python classical BPE (list-based, the textbook algorithm) ---------


def _py_vocab(texts: list[str]) -> dict[tuple[str, ...], int]:
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    return {tuple(w) + (bpe.END_OF_WORD,): n for w, n in words.items()}


def _py_pair_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    stats: Counter = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += freq
    return stats


def _py_merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_train(texts: list[str], k: int):
    vocab = _py_vocab(texts)
    merges = []
    for step in range(1, k + 1):
        stats = _py_pair_stats(vocab)
        if not stats:
            break
        # highest freq, then lexicographically smallest (left, right)
        pair = min(stats, key=lambda p: (-stats[p], p[0], p[1]))
        merges.append((step, pair[0], pair[1], stats[pair]))
        vocab = {_py_merge_word(s, pair): f for s, f in vocab.items()}
    return merges, vocab


# --- tests ------------------------------------------------------------------

TEXTS = [
    "low low low lower lowest",
    "new newer newest new new",
    "wide wider widest low new",
    "a ab abc new low low",
]


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merge_table_matches_reference(spark):
    docs = _spark_docs(spark, TEXTS)
    merges, _ = bpe.train_bpe(docs, "text", n_merges=10)
    py_merges, _ = _py_train(TEXTS, 10)
    assert merges == py_merges


def test_final_symbols_match_reference(spark):
    docs = _spark_docs(spark, TEXTS)
    merges, vocab = bpe.train_bpe(docs, "text", n_merges=6)
    py_merges, py_vocab = _py_train(TEXTS, 6)
    assert merges == py_merges
    got = {
        r["word"]: tuple(r["syms"])
        for r in vocab.selectExpr(
            "word", "split(substring(enc, 2, length(enc) - 2), '\\\\|\\\\|') AS syms"
        ).collect()
    }
    expected = {"".join(s).replace(bpe.END_OF_WORD, ""): s for s in py_vocab}
    assert got == expected


def test_overlapping_pair_merges_left_to_right(spark):
    # "b b b b" count for (b,b) is 3 (overlapping stats), but the merge
    # applies left-to-right non-overlapping: bb bb
    docs = _spark_docs(spark, ["bbbb bbbb"])
    merges, vocab = bpe.train_bpe(docs, "text", n_merges=2)
    assert merges[0][1:3] == ("b", "b")
    assert merges[0][3] == 6  # 3 overlapping pairs x freq 2
    (row,) = vocab.select("enc").collect()
    # round 2: (bb,bb) and (bb,</w>) tie at freq 2; '</w>' < 'bb'
    # lexicographically, so (bb,</w>) wins — same in the reference
    assert merges[1][1:3] == ("bb", bpe.END_OF_WORD)
    assert row["enc"] == "|bb||bb</w>|"


def test_subword_vocab_weights(spark):
    # "aaa" x3: (a,a) counts 6 (overlapping) vs (a,</w>) 3 -> (a,a) merges
    docs = _spark_docs(spark, ["aaa aaa aaa b"])
    _, vocab = bpe.train_bpe(docs, "text", n_merges=1)
    sv = {r["symbol"]: r["freq"] for r in bpe.subword_vocab(vocab).collect()}
    assert sv["aa"] == 3  # left-to-right merge: aaa -> aa a
    assert sv["a"] == 3
    assert sv["b"] == 1
    assert sv[bpe.END_OF_WORD] == 4


def test_merge_exhaustion_stops_early(spark):
    docs = _spark_docs(spark, ["a b"])
    merges, _ = bpe.train_bpe(docs, "text", n_merges=50)
    # each word collapses to one symbol after its chars merge with </w>;
    # once every word is a single symbol there are no pairs left
    assert 0 < len(merges) < 50


def test_driver_path_matches_distributed_path(spark):
    """driver_vocab_max=0 forces the distributed loop; the default takes
    the driver fast path — merge tables and final encodings must be
    identical (same pair stats, tie-break, replace order)."""
    from sdg_big_data_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "new newer newest", "wide wider widest",
             "low low new wide", "newest lowest"] * 3
        )],
        "doc_id long, text string",
    )
    m_fast, v_fast = train_bpe(docs, "text", n_merges=6)
    m_dist, v_dist = train_bpe(docs, "text", n_merges=6, driver_vocab_max=0)
    assert m_fast == m_dist
    fast = {r["word"]: (r["freq"], r["enc"]) for r in v_fast.collect()}
    dist = {r["word"]: (r["freq"], r["enc"]) for r in v_dist.collect()}
    assert fast == dist
