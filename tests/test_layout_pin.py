"""Regression tests for the two-branch materialization hazard (r4).

global_rank / grouped_prefix_sum feed one physical-layout-dependent
frame (__pid from the range exchange) into BOTH an offsets branch and
the output join. Without pinning that frame to a single materialization,
the two consumers can observe different sampled range boundaries / AQE
coalescing, attaching offsets to the wrong partitions — observed at the
100x fixture as a nondeterministically wrong AUC (sum(rank) !=
n(n+1)/2). The fix is a registered lazy cache (a localCheckpoint pin
was tried first, but under AQE eager=False still executes the whole
subtree at construction — 193 s of hidden jobs at the 100x fixture —
and its Scan ExistingRDD hid the subtree from plan audits); these
tests pin (a) the cache's presence in the default plan and (b) the
rank-permutation invariant under a many-partition layout.
"""

from pyspark.sql import functions as F

from sdg_big_data_spark.operators.windows import global_rank, grouped_prefix_sum


def test_global_rank_default_plan_is_layout_pinned(spark):
    df = spark.range(0, 1000).select((F.col("id") % 97).alias("s"))
    out = global_rank(df, ["s"], ascending=True, rank_col="r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # the lazy cache pin


def test_grouped_prefix_sum_default_plan_is_layout_pinned(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), 1) for i in range(100)],
        schema="id long, g string, v int",
    )
    out = grouped_prefix_sum(df, ["g"], [F.col("id").asc()], "v", cum_col="c")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_global_rank_is_permutation_across_many_partitions(spark):
    """sum(rank) == n(n+1)/2 and all ranks distinct — the invariant the
    100x probe saw violated before the pin. 53 range partitions with
    heavy ties exercises offsets across many partition boundaries."""
    n = 50_000
    df = spark.range(0, n).select((F.col("id") % 211).alias("s"))
    r = global_rank(df, ["s"], ascending=True, rank_col="r", num_partitions=53)
    row = r.agg(
        F.sum("r").alias("sum_r"),
        F.countDistinct("r").alias("dist"),
        F.min("r").alias("mn"),
        F.max("r").alias("mx"),
    ).collect()[0]
    assert row["sum_r"] == n * (n + 1) // 2
    assert row["dist"] == n and row["mn"] == 1 and row["mx"] == n


def test_grouped_prefix_sum_totals_match_group_sums(spark):
    """Final cumulative value per group must equal the plain group sum —
    cross-checks offsets attachment over a skewed many-partition layout."""
    rows = [(i, "hot" if i % 10 else "cold", float(i % 7)) for i in range(20_000)]
    df = spark.createDataFrame(rows, schema="id long, g string, v double")
    out = grouped_prefix_sum(df, ["g"], [F.col("id").asc()], "v", cum_col="c")
    finals = (
        out.groupBy("g").agg(F.max("c").alias("cum_total")).orderBy("g").collect()
    )
    expected = {
        r["g"]: r["tot"]
        for r in df.groupBy("g").agg(F.sum("v").alias("tot")).collect()
    }
    for r in finals:
        assert abs(r["cum_total"] - expected[r["g"]]) < 1e-6


def test_construction_runs_no_jobs(spark):
    """Building a rank/prefix-sum-backed frame must schedule ZERO Spark
    jobs — the localCheckpoint(eager=False) pin executed the whole
    subtree at construction under AQE (193 s of hidden jobs building
    pack_plan's frame at the 100x fixture; plan dumps and HOF audits
    silently ran full pipelines)."""
    from sdg_big_data_spark.operators.packing import pack_plan

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "alpha beta gamma " * 4) for i in range(200)],
        "doc_id long, source string, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    df = global_rank(docs.select("doc_id"), ["doc_id"], rank_col="r")
    df2 = grouped_prefix_sum(
        docs.selectExpr("source", "doc_id", "1 as v"),
        ["source"], [F.col("doc_id").asc()], "v", cum_col="c",
    )
    df3 = pack_plan(docs, 16)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, f"construction scheduled jobs: {after - before}"
    # and the frames still work when actually consumed
    assert df.count() == 200 and df2.count() == 200 and df3.count() == 200
