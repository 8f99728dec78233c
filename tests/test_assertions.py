"""Runtime data-assertion operators (reference's data_assertions parity)."""

from __future__ import annotations

import pytest

from sdg_big_data_spark.operators import assertions as A


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 95.0), ("v", 1, -5.0), ("v", 1, 20.0)],
        schema="k string, t int, lat double",
    )


def test_in_range_raises_with_count(frame):
    with pytest.raises(A.DataAssertionError) as e:
        A.expect_in_range(frame, "lat", -90, 90)
    assert e.value.n_bad == 1
    ok = frame.where("lat between -90 and 90")
    assert A.expect_in_range(ok, "lat", -90, 90) is ok


def test_in_range_quarantine_mode(frame):
    viol = A.expect_in_range(frame, "lat", 0, 90, raise_on_fail=False)
    assert {r["lat"] for r in viol.collect()} == {-5.0, 95.0}


def test_unique(frame):
    with pytest.raises(A.DataAssertionError):
        A.expect_unique(frame, ["k", "t"])
    assert A.expect_unique(frame.dropDuplicates(["k", "t"]), ["k", "t"]) is not None


def test_ordered(spark):
    df = spark.createDataFrame(
        [("u", 1), ("u", 3), ("u", 2), ("v", 1)], schema="k string, t int"
    )
    viol = A.expect_ordered(df, ["k"], "t", raise_on_fail=False)
    # ordering check sorts within key: 1,2,3 is fine once sorted — the
    # violation notion is decreases in the SORTED sequence, i.e. none
    assert viol.count() == 0
    dup = spark.createDataFrame([("u", 1), ("u", 1)], schema="k string, t int")
    assert A.expect_ordered(dup, ["k"], "t", raise_on_fail=False).count() == 0
    with pytest.raises(A.DataAssertionError):
        A.expect_ordered(dup, ["k"], "t", strictly=True)


def test_not_null(spark):
    df = spark.createDataFrame([("a", None), ("b", 1)], schema="k string, v int")
    with pytest.raises(A.DataAssertionError):
        A.expect_not_null(df, ["v"])


class TestCountMinSketch:
    def test_estimate_upper_bounds_exact_and_merges(self, spark):
        import pyspark.sql.functions as F

        from sdg_big_data_spark.operators.relational import cm_estimate, cm_sketch

        rows = [(i % 7,) for i in range(700)] + [(99,)] * 5
        df = spark.createDataFrame(rows, "k long")
        sk = cm_sketch(df, "k", depth=4, width=64)
        keys = df.select("k").distinct()
        est = {
            r["k"]: r["cm_est"]
            for r in cm_estimate(sk, keys, "k", depth=4, width=64).collect()
        }
        exact = {
            r["k"]: r["n"]
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for k, n in exact.items():
            assert est[k] >= n  # overestimate-only
        # cells total = depth * rows
        total = sk.agg(F.sum("cnt")).collect()[0][0]
        assert total == 4 * len(rows)
        # mergeability: sketch(a) + sketch(b) == sketch(a union b), cellwise
        a, b = df.where("k < 4"), df.where("k >= 4")
        merged = (
            cm_sketch(a, "k", depth=4, width=64)
            .unionByName(cm_sketch(b, "k", depth=4, width=64))
            .groupBy("i", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        full = cm_sketch(df, "k", depth=4, width=64)
        assert (
            merged.exceptAll(full).count() == 0
            and full.exceptAll(merged).count() == 0
        )

    def test_unseen_key_estimates_bounded_by_collisions(self, spark):
        from sdg_big_data_spark.operators.relational import cm_estimate, cm_sketch

        df = spark.createDataFrame([(1,)], "k long")
        sk = cm_sketch(df, "k", depth=4, width=64)
        unseen = spark.createDataFrame([(123456,)], "k long")
        est = cm_estimate(sk, unseen, "k", depth=4, width=64).collect()[0]
        assert est["cm_est"] in (0, 1)  # at most the single stored row
