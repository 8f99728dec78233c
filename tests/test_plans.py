"""Plan-quality regression gates — the physical plans we designed for
must survive refactors: filters pushed to scans, dimension joins
broadcast, no sort-merge or cartesian fallbacks, narrow read schemas.

These are the properties that decide 100 TB behavior; a silent
regression here is invisible at test scale and catastrophic at cluster
scale.
"""

from __future__ import annotations

import re

import pytest

from sdg_big_data_spark.plans import catalog


def _plan(spark, sf_dir, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")  # no "..."
    qs = catalog.queries()
    df = qs[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p_predicate_pushdown")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(p.strip() for p in pushed), plan


def test_threshold_indicator_pushes_score_filter(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a11_threshold_indicator")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "GreaterThan" in pushed or "value" in pushed, plan


def test_multiway_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j8_multiway_join")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_spatial_join_is_broadcast_hash(spark, sf_dir):
    """The two-phase grid join must plan as a broadcast hash join on the
    cell key — never a nested-loop/cartesian against the polygon side."""
    plan = _plan(spark, sf_dir, "sp_bbox_join")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_scans_are_narrow(spark, sf_dir):
    """Column pruning: the pricing summary reads only the needed lineitem
    columns, not the full 7+-column table."""
    plan = _plan(spark, sf_dir, "a1_pricing_summary")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    # Q1 needs exactly 6 of lineitem's 16 columns — pruned, not full-width.
    assert all(len(s.split(",")) <= 6 for s in schemas), schemas


def test_lsh_candidates_no_cross_product(spark, sf_dir):
    """LSH near-dup generation must be an equi-join on the bucket, not an
    all-pairs product."""
    plan = _plan(spark, sf_dir, "e_near_dups")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators.joins import salted_join

    big = spark.range(10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], schema="k long, tag string"
    )
    plain = big.join(small, "k").groupBy("tag").count()
    salted = salted_join(big, small, "k").groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_optimize_table_compacts(spark, tmp_path):
    from sdg_big_data_spark.sources.writers import optimize_table

    import os

    p = str(tmp_path / "frag")
    spark.range(1000).repartition(20).write.parquet(p)
    n_before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    optimize_table(spark, p)
    n_after = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert n_before == 20 and n_after == 1
    assert spark.read.parquet(p).count() == 1000


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """S6+/J1 at scale: two tables bucketed on the join key by the same
    bucket count sort-merge-join with NO Exchange — the co-location is
    paid once at write time."""
    from pyspark.sql import functions as F

    from sdg_big_data_spark.sources.writers import write_bucketed

    a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", 4, ["k"], sort_cols=["k"], path=str(tmp_path / "a"))
    write_bucketed(b, "bkt_b", 4, ["k"], sort_cols=["k"], path=str(tmp_path / "b"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle
        assert j.count() == 10_000
        # same join WITHOUT bucketing does shuffle both sides
        pa = spark.read.parquet(str(tmp_path / "a"))
        pb = spark.read.parquet(str(tmp_path / "b"))
        plain = pa.join(pb, "k")
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
