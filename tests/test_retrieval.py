"""BM25 retrieval — hand-computed scores, ranking contract, invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

import math

from sdg_big_data_spark.operators.retrieval import bm25_topk


def _bm25_hand(tf: float, df: float, n: float, dl: float, avgdl: float,
               k1: float = 1.2, b: float = 0.75) -> float:
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_hand_computed_two_docs(spark):
    # doc 1: "cat cat dog" (dl 3), doc 2: "dog bird" (dl 2); query {cat, dog}
    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["bm25"])
        for r in bm25_topk(df, ["cat", "dog"], k=10).collect()
    }
    avgdl = 2.5
    want1 = _bm25_hand(2, 1, 2, 3, avgdl) + _bm25_hand(1, 2, 2, 3, avgdl)
    want2 = _bm25_hand(1, 2, 2, 2, avgdl)
    assert got[1][0] == 2 and abs(got[1][1] - want1) < 1e-6
    assert got[2][0] == 1 and abs(got[2][1] - want2) < 1e-6
    # doc 1 hits a rarer term more often in a modestly longer doc -> ranks first
    assert got[1][1] > got[2][1]


def test_normalization_applies_to_corpus(spark):
    # query terms are pre-normalized; corpus goes through URL-strip/lower/
    # accent-fold, so "CafÉ" and a URL-only doc behave correctly
    df = spark.createDataFrame(
        [(1, "CafÉ cafe"), (2, "http://cafe.example only-link")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_terms_hit"] for r in bm25_topk(df, ["cafe"], k=10).collect()}
    assert got[1] == 1  # both tokens normalize to 'cafe' (tf=2, one term)
    assert 2 not in got  # its URL was stripped; 'only-link' splits to other toks


def test_k_limits_and_tiebreak(spark):
    # identical docs -> identical scores; tiebreak must be doc_id asc
    df = spark.createDataFrame(
        [(i, "x y z") for i in range(10)], "doc_id long, text string"
    )
    rows = bm25_topk(df, ["x"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_partition_invariance(spark):
    docs = [(i, f"alpha beta {'gamma ' * (i % 4)}") for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = [(r["doc_id"], r["bm25"]) for r in bm25_topk(df, ["gamma", "beta"], k=15).collect()]
    b = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(df.repartition(13), ["gamma", "beta"], k=15).collect()
    ]
    assert a == b


def test_zero_token_docs_excluded_from_corpus_stats(spark):
    """ADVICE r4: a doc that tokenizes to empty (URL-only text) must not
    count in N/avgdl — the oracle derives both from the unnested token
    table, which such a doc never reaches. With it wrongly counted, idf
    and length normalization shift for EVERY hit."""
    base = [(1, "cat cat dog"), (2, "dog bird")]
    with_empty = base + [(99, "http://only.a.link/")]  # tokenizes to []
    a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(
            spark.createDataFrame(base, "doc_id long, text string"),
            ["cat", "dog"], k=10,
        ).collect()
    }
    b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(
            spark.createDataFrame(with_empty, "doc_id long, text string"),
            ["cat", "dog"], k=10,
        ).collect()
    }
    assert a == b  # the empty doc changes neither scores nor membership


class TestRrfFuse:
    def test_hand_computed(self, spark):
        """Two 3-doc runs, overlapping on doc 1: rrf = sum of pinned
        1/(60+rank) reciprocals; absent-from-run docs contribute
        nothing (the RRF convention)."""
        from sdg_big_data_spark.operators.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, s double"
        )
        r2 = spark.createDataFrame(
            [(1, 0.5), (4, 0.4)], "doc_id long, s double"
        )
        got = {
            r["doc_id"]: r
            for r in rrf_fuse([(r1, "s"), (r2, "s")], "doc_id").collect()
        }

        def ru(rank):
            return round(1e9 / (60 + rank))

        assert got[1]["n_runs_hit"] == 2
        assert got[1]["rrf"] == round((ru(1) + ru(1)) / 1e9, 6)
        assert got[2]["rrf"] == round(ru(2) / 1e9, 6)
        assert got[4]["n_runs_hit"] == 1
        assert got[4]["rrf"] == round(ru(2) / 1e9, 6)

    def test_rank_tiebreak_is_id(self, spark):
        """Equal scores rank by id ascending — deterministic, matching
        the oracle's ORDER BY score DESC, id ASC."""
        from sdg_big_data_spark.operators.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(9, 0.5), (2, 0.5)], "doc_id long, s double"
        )
        rows = {r["doc_id"]: r["rrf"] for r in rrf_fuse([(r1, "s")]).collect()}
        assert rows[2] > rows[9]  # id 2 takes rank 1 on the tie

    def test_top_k_cut(self, spark):
        from sdg_big_data_spark.operators.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [(i, 1.0 - i / 10) for i in range(5)], "doc_id long, s double"
        )
        out = rrf_fuse([(r1, "s")], k=2).collect()
        assert [r["doc_id"] for r in out] == [0, 1]


class TestBm25Multi:
    def test_multi_matches_single_per_run(self, spark):
        """bm25_topk_multi must equal bm25_topk run-by-run (same idf,
        stats, rounding, tiebreak) — only the physical sharing differs."""
        from sdg_big_data_spark.operators.retrieval import (
            bm25_topk,
            bm25_topk_multi,
        )

        docs = spark.createDataFrame(
            [
                (i, f"alpha beta {'gamma ' * (i % 3)}delta epsilon alpha")
                for i in range(30)
            ],
            "doc_id long, text string",
        )
        runs = {"r1": ["alpha", "gamma"], "r2": ["delta", "beta", "alpha"]}
        multi = bm25_topk_multi(docs, runs, k=10)
        for r, terms in runs.items():
            want = {
                x["doc_id"]: x
                for x in bm25_topk(docs, terms, k=10).collect()
            }
            got = {
                x["doc_id"]: x
                for x in multi.where(F.col("run") == r).collect()
            }
            assert set(got) == set(want)
            for d in want:
                assert got[d]["bm25"] == want[d]["bm25"]
                assert got[d]["n_terms_hit"] == want[d]["n_terms_hit"]

    def test_fuse_runs_matches_fuse(self, spark):
        from sdg_big_data_spark.operators.retrieval import (
            rrf_fuse,
            rrf_fuse_runs,
        )

        r1 = spark.createDataFrame(
            [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, s double"
        )
        r2 = spark.createDataFrame(
            [(1, 0.5), (4, 0.4)], "doc_id long, s double"
        )
        tagged = r1.selectExpr("'a' as run", "doc_id", "s as sc").unionByName(
            r2.selectExpr("'b' as run", "doc_id", "s as sc")
        )
        want = sorted(map(tuple, rrf_fuse([(r1, "s"), (r2, "s")]).collect()))
        got = sorted(
            map(tuple, rrf_fuse_runs(tagged, "run", "doc_id", "sc").collect())
        )
        assert got == want
