"""Distributed BPE pair-merge training — the tokenizer-training step of
an LLM data pipeline, Spark-first.

Architecture (the part that matters at 100 TB): the corpus is touched
ONCE — a word-frequency aggregation (one shuffle, output is
vocabulary-sized, millions of rows not billions). Every merge round then
runs on that small weighted vocabulary: pair counts are a groupBy over
exploded adjacent pairs weighted by word frequency, the winning pair is
a 1-row collect (dimension-sized, like a k-means centroid pull), and the
merge applies as a narrow map. Cost per round ~ vocab size, independent
of corpus size — which is exactly why classical BPE trainers operate on
word counts, not raw text.

Exactness trick: a word's symbol sequence is carried as ONE encoded
string — ``|sym1||sym2||sym3|`` — so applying merge (a,b) is the literal
string replace of ``|a||b|`` with ``|ab|``. Java, DuckDB, and Python
``str.replace`` all scan left-to-right non-overlapping, which is
precisely the classical BPE merge order, so the whole training loop —
including every intermediate merge table — is exactly replayable by a
SQL oracle (unrolled CTE rounds) and by the pure-Python reference in the
differential test. Symbols are drawn from the tokenizer alphabet
(lowercase alnum + apostrophe, plus the ``</w>`` end-of-word marker), so
``|`` can never occur inside a symbol and the encoding is unambiguous.

Tie-break rule (part of the contract): highest pair frequency, then
lexicographically smallest (left, right).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "|"
END_OF_WORD = "</w>"


def encode_word(word: Column) -> Column:
    """word → ``|c1||c2||...||cn||</w>|`` encoded symbol string."""
    return F.concat(
        F.lit(SEP),
        F.array_join(F.split(word, ""), SEP + SEP),
        F.lit(SEP + SEP + END_OF_WORD + SEP),
    )


def _symbols(enc: Column) -> Column:
    # substring(enc, 2, len-2) strips the outer separators
    return F.split(enc.substr(F.lit(2), F.length(enc) - 2), r"\|\|")


def adjacent_pairs(enc: Column) -> Column:
    """All adjacent symbol pairs of an encoded word, as ``a||b`` strings
    (overlapping occurrences each count — classical BPE statistics)."""
    s = _symbols(enc)
    # guard: Spark sequence(1, 0) would generate a DESCENDING [1, 0] for
    # single-symbol words, not an empty range
    return F.when(F.size(s) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat_ws(
                SEP + SEP, F.element_at(s, i), F.element_at(s, i + 1)
            ),
        )
    )


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, freq): the single corpus-scale pass. Accepts a
    pre-tokenized ``array<string>`` column through the
    :func:`~..functions.text.tokens_of` seam."""
    from ..functions.text import tokens_of

    return (
        docs.select(F.explode(tokens_of(docs, text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 16,
    driver_vocab_max: int = 1_000_000,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, vocab)``: the ordered merge table
    ``[(step, left_sym, right_sym, pair_freq), ...]`` and the final
    vocabulary frame ``(word, freq, enc)`` with merges applied.

    The corpus is touched once (the word-frequency shuffle). The merge
    rounds then run over the VOCABULARY, and the physical strategy
    follows its size:

    - vocab ≤ ``driver_vocab_max`` rows: collect (word, freq) to the
      driver — the same dimension-sized pull as a k-means centroid
      update — and run the rounds as the pure-Python classical trainer
      (identical pair statistics, identical tie-break, identical
      left-to-right replace; the differential suite in ``test_bpe.py``
      proves the equivalence). A distributed round costs one Spark job
      (~0.3 s of scheduling) regardless of data, so k rounds over a
      small vocab were pure fixed overhead.
    - larger vocab: the distributed loop — per round one vocab-sized
      pair-count aggregate and a 1-row collect of the winner; lineage
      truncated every ``checkpoint_every`` rounds via ``localCheckpoint``
      (the connected-components discipline, operators/graph.py).
    """
    from ..cachescope import scoped_cache

    vocab = word_vocab(docs, text_col).withColumn("enc", encode_word(F.col("word")))
    vocab = scoped_cache(vocab)
    if vocab.count() <= driver_vocab_max:
        rows = [(r["word"], int(r["freq"])) for r in vocab.collect()]
        merges, enc_map = _train_bpe_local(rows, n_merges)
        spark = docs.sparkSession
        out = spark.createDataFrame(
            [(w, f, enc_map[w]) for w, f in rows],
            schema="word string, freq long, enc string",
        )
        return merges, out

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = (
            vocab.select(F.explode(adjacent_pairs(F.col("enc"))).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = (
            pairs.orderBy(
                F.col("pair_freq").desc(),
                F.split("pair", r"\|\|")[0].asc(),
                F.split("pair", r"\|\|")[1].asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, freq = top[0]["pair"], int(top[0]["pair_freq"])
        left, right = pair.split(SEP + SEP)
        merges.append((step, left, right, freq))
        pat = SEP + left + SEP + SEP + right + SEP
        rep = SEP + left + right + SEP
        vocab = vocab.withColumn("enc", F.expr(
            f"replace(enc, {_sql_str(pat)}, {_sql_str(rep)})"
        ))
        if step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def _train_bpe_local(
    rows: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[int, str, str, int]], dict[str, str]]:
    """Driver-side merge rounds over a collected (word, freq) vocabulary —
    bit-identical semantics to the distributed loop: the same adjacent-pair
    statistics (overlapping occurrences each count), the same
    (freq desc, left asc, right asc) tie-break, and the same literal
    left-to-right ``|a||b|`` → ``|ab|`` replace (Python ``str.replace``
    and Java/DuckDB ``replace`` share the non-overlapping l-to-r scan).
    Returns (merges, {word: final_enc})."""
    enc = {
        w: SEP + (SEP + SEP).join(list(w) + [END_OF_WORD]) + SEP for w, _ in rows
    }
    freqs = dict(rows)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            syms = enc[w][1:-1].split(SEP + SEP)
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, freq))
        pat = SEP + left + SEP + SEP + right + SEP
        rep = SEP + left + right + SEP
        for w in enc:
            enc[w] = enc[w].replace(pat, rep)
    return merges, enc


def subword_vocab(vocab: DataFrame) -> DataFrame:
    """Final (symbol, freq) table: explode the merged symbol sequences,
    weight by word frequency."""
    return (
        vocab.select(F.explode(_symbols(F.col("enc"))).alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_segment(
    text_col: Column,
    merges: list[tuple[str, str]],
    pretokenized: bool = False,
) -> Column:
    """Segment a text column into BPE symbols using a trained merge list:
    tokenize → encode each token → apply the merges IN TRAINING ORDER
    (the same literal left-to-right replaces training used) → flatten the
    per-token symbol arrays.

    Pure narrow expression — the merge table rides into the plan as
    string literals (the expression-level analogue of a broadcast), so
    corpus-scale encoding is a map-only stage. ``text_col`` may already
    be a token array (``array<string>``) — pass ``pretokenized=True``
    (the Column form cannot inspect a schema).
    """
    from ..functions.text import tokenize

    def per_token(t: Column) -> Column:
        e = encode_word(t)
        for left, right in merges:
            e = F.replace(
                e,
                F.lit(SEP + left + SEP + SEP + right + SEP),
                F.lit(SEP + left + right + SEP),
            )
        return _symbols(e)

    toks = text_col if pretokenized else tokenize(text_col)
    return F.flatten(F.transform(toks, per_token))
