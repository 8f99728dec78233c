"""Weighted sampling operators — determinism, exact-k, and the actual
weighting property (heavier rows win proportionally more often)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_big_data_spark.operators.sampling import (
    weighted_bernoulli_sample,
    weighted_fixed_k,
)


def _frame(spark, n=4000):
    # half the rows weight 9, half weight 1 — expected presence ratio 9:1
    # in a small fixed-k sample
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(9.0)).otherwise(F.lit(1.0)).alias("w"),
    )


def test_weighted_fixed_k_exact_k_and_deterministic(spark):
    df = _frame(spark)
    a = weighted_fixed_k(df, 200, "k", "w").collect()
    b = weighted_fixed_k(df.repartition(13), 200, "k", "w").collect()
    assert len(a) == 200
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partition-invariant


def test_weighted_fixed_k_prefers_heavy_rows(spark):
    out = weighted_fixed_k(_frame(spark), 200, "k", "w")
    heavy = out.where(F.col("w") == 9.0).count()
    # E[heavy] = 200 * 0.9 = 180 under exponential races; allow wide slack
    assert heavy > 140


def test_weighted_fixed_k_excludes_nonpositive_weights(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 50, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    out = weighted_fixed_k(df, 60, "k", "w").collect()
    assert len(out) == 50  # only the positive-weight rows are eligible
    assert all(r["w"] > 0 for r in out)


def test_weighted_bernoulli_rate_tracks_weight(spark):
    df = _frame(spark)
    kept = weighted_bernoulli_sample(df, "k", "w", scale=18.0)
    rates = {
        r["w"]: r["n"]
        for r in kept.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_half = 2000
    # keep prob = w/18 → 0.5 for heavy, 0.0555… for light
    assert abs(rates[9.0] / n_half - 0.5) < 0.08
    assert abs(rates.get(1.0, 0) / n_half - 1 / 18) < 0.04
    # determinism: same rows under a different partitioning
    again = weighted_bernoulli_sample(df.repartition(7), "k", "w", scale=18.0)
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))
