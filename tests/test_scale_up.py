"""Invariants of the tools/scale_up.py fixture generator — the scaling
evidence in COVERAGE.md is only as good as the scaled data's fidelity:
keys must stay disjoint and referentially consistent across copies,
and content variation must change fingerprints without changing the
statistical shape (token counts, vector norms).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def scale_up_mod():
    import scale_up

    return scale_up


def test_keys_disjoint_and_complete(spark, sf_dir, scale_up_mod):
    from sdg_big_data_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    s = scale_up_mod.scaled(docs, "documents", 3)
    assert s.count() == 3 * n
    assert s.select("doc_id").distinct().count() == 3 * n  # no collisions
    # each copy occupies its own stride band
    bands = (
        s.select((F.col("doc_id") / scale_up_mod.STRIDE).cast("long").alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert sorted((r["b"], r["count"]) for r in bands) == [(0, n), (1, n), (2, n)]


def test_lineitem_foreign_keys_follow_their_copy(spark, sf_dir, scale_up_mod):
    from sdg_big_data_spark.sources.readers import read_table

    li = scale_up_mod.scaled(read_table(spark, sf_dir, "lineitem"), "lineitem", 2)
    od = scale_up_mod.scaled(read_table(spark, sf_dir, "orders"), "orders", 2)
    # every scaled lineitem row joins an order in the SAME copy band
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"], "left")
    assert joined.where(F.col("o_orderkey").isNull()).count() == 0


def test_text_varies_but_token_count_is_preserved(spark, sf_dir, scale_up_mod):
    from sdg_big_data_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    s = scale_up_mod.scaled(docs, "documents", 2)
    base = s.where(F.col("doc_id") < scale_up_mod.STRIDE).select(
        (F.col("doc_id")).alias("k"), F.col("text").alias("t0")
    )
    copy = s.where(F.col("doc_id") >= scale_up_mod.STRIDE).select(
        (F.col("doc_id") - scale_up_mod.STRIDE).alias("k"),
        F.col("text").alias("t1"),
    )
    m = base.join(copy, "k")
    # different text (fingerprints change) ...
    assert m.where(F.col("t0") == F.col("t1")).count() == 0
    # ... same whitespace-token count (workload shape preserved)
    diff = m.where(
        F.size(F.split("t0", r"\s+")) != F.size(F.split("t1", r"\s+"))
    )
    assert diff.count() == 0


def test_embedding_rotation_preserves_norm(spark, sf_dir, scale_up_mod):
    from sdg_big_data_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(100)
    s = scale_up_mod.scaled(emb, "embeddings", 3)
    norms = s.select(
        F.pmod(F.col("vec_id"), F.lit(scale_up_mod.STRIDE)).alias("k"),
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("nn"),
        F.size("embedding").alias("d"),
    )
    agg = norms.groupBy("k").agg(
        F.countDistinct(F.round("nn", 6)).alias("u"),
        F.countDistinct("d").alias("ud"),
    )
    bad = agg.where((F.col("u") != 1) | (F.col("ud") != 1)).count()
    assert bad == 0  # all 3 rotations: same norm, same dimension
