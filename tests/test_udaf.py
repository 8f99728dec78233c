"""GROUPED_AGG pandas UDAF: weighted median — hand-computed cases,
null/weight hygiene, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_big_data_spark.functions.udaf import weighted_median


def _agg(spark, rows, n_parts=None):
    df = spark.createDataFrame(rows, "k string, v double, w double")
    if n_parts:
        df = df.repartition(n_parts)
    out = df.groupBy("k").agg(weighted_median("v", "w").alias("wm"))
    return {r["k"]: r["wm"] for r in out.collect()}


def test_hand_computed(spark):
    rows = [
        # a: half-total weight = 3; cum hits 3 at v=2 -> 2.0
        ("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 3.0, 3.0),
        # b: dominant weight wins regardless of value order
        ("b", 10.0, 1.0), ("b", 5.0, 100.0), ("b", 20.0, 1.0),
        # c: equal weights -> lower median of [1,2]
        ("c", 2.0, 1.0), ("c", 1.0, 1.0),
    ]
    got = _agg(spark, rows)
    assert got == {"a": 2.0, "b": 5.0, "c": 1.0}


def test_nulls_and_nonpositive_weights_ignored(spark):
    rows = [
        ("a", None, 5.0), ("a", 1.0, None), ("a", 99.0, 0.0),
        ("a", 7.0, 1.0),
        ("b", 1.0, -2.0), ("b", None, None),
    ]
    got = _agg(spark, rows)
    assert got["a"] == 7.0
    assert got["b"] is None


def test_partition_invariance(spark):
    rows = [("g", float(i % 17), float(1 + i % 3)) for i in range(500)]
    assert _agg(spark, rows, 2) == _agg(spark, rows, 16)


def test_matches_unweighted_median_when_weights_equal(spark):
    import numpy as np

    vals = [float(x) for x in [9, 1, 4, 7, 3, 8, 2]]
    rows = [("g", v, 1.0) for v in vals]
    got = _agg(spark, rows)
    # lower median of sorted [1,2,3,4,7,8,9]: cum hits 3.5 at 4
    assert got["g"] == float(np.sort(vals)[3])
