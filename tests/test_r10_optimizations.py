"""Round-10 optimization invariants.

Each r10 change that rewired an operator's internals gets a focused
gate here, so a future refactor can't silently reintroduce the cost:

- ``grouped_prefix_sum`` must stay pure-JVM (its mapInPandas stage was
  removed in r10 — guide §4: no Python boundary where built-ins exist);
- ``kmeans`` centroid updates must stay numerically identical to the
  explode-form reference (a per-dimension avg(element_at) rewrite was
  tried in r10, measured as a same-session A/B regression, and
  reverted — the gate keeps the equality contract either way);
- ``triangle_counts`` / ``common_neighbor_similarity`` must broadcast
  their |nodes|-sized degree frames below the edge-count gate instead
  of sort-merge-joining the edge/pair frame (guide §3.1; cached frames
  carry no size stats, so without the hint the planner exchanges and
  sorts the BIG side).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_grouped_prefix_sum_plans_no_python_eval(spark):
    """The r10 JVM form: no ArrowEvalPython/MapInPandas/BatchEvalPython
    node anywhere in the executed plan (pin disabled so the full
    subtree is visible)."""
    from sdg_big_data_spark.operators.windows import grouped_prefix_sum

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i % 7) for i in range(500)],
        schema="id long, g string, v int",
    )
    out = grouped_prefix_sum(
        df, ["g"], [F.col("id").asc()], "v", cum_col="c", pin_layout=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert node not in plan, f"Python stage reintroduced: {node}"
    # the scalable shape itself is still range-partitioned
    assert "rangepartitioning" in plan.lower()


def test_grouped_prefix_sum_multi_column_single_pass(spark):
    """The multi-value form still carries both running sums in one pass
    and matches independent single-column passes exactly."""
    from sdg_big_data_spark.operators.windows import grouped_prefix_sum

    df = spark.createDataFrame(
        [(i, i % 2, i % 5, (i * 7) % 11) for i in range(400)],
        schema="id long, g int, a int, b int",
    )
    both = grouped_prefix_sum(
        df, ["g"], [F.col("id").asc()], ["a", "b"], cum_col=["ca", "cb"]
    )
    only_a = grouped_prefix_sum(df, ["g"], [F.col("id").asc()], "a", cum_col="ca")
    only_b = grouped_prefix_sum(df, ["g"], [F.col("id").asc()], "b", cum_col="cb")
    got = {(r["id"], r["ca"], r["cb"]) for r in both.collect()}
    ref_a = {r["id"]: r["ca"] for r in only_a.collect()}
    ref_b = {r["id"]: r["cb"] for r in only_b.collect()}
    assert got == {(i, ref_a[i], ref_b[i]) for i in ref_a}


def test_kmeans_update_matches_explode_reference(spark):
    """The r10 per-dimension avg(element_at) centroid update must equal
    the posexplode+groupBy form it replaced, bit for bit, over a ragged
    multi-cluster fixture."""
    import math

    from sdg_big_data_spark.operators.clustering import assign_clusters, kmeans
    from sdg_big_data_spark.operators.sampling import hash_bucket

    rows = [
        (i, [float((i * 13 + j * 7) % 23) / 3.0 for j in range(6)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")

    # reference trajectory: the pre-r10 algorithm, reimplemented inline
    init = (
        df.orderBy(hash_bucket(F.col("vec_id")), F.col("vec_id"))
        .limit(3)
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in init]
    for _ in range(3):
        assigned = assign_clusters(df, cents, "embedding")
        got = (
            assigned.select("cluster_id", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("v"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in got:
            acc.setdefault(r["cluster_id"], {})[r["pos"]] = r["v"]
        new = [list(c) for c in cents]
        for cid, comps in acc.items():
            vals = [comps[p] for p in sorted(comps)]
            m = 10.0**6
            new[cid] = [math.floor(v * m + 0.5) / m for v in vals]
        cents = new

    _, fast_cents = kmeans(df, k=3, max_iter=3, tol=0.0, round_dp=6)
    assert fast_cents == cents


def test_graph_degree_joins_broadcast_below_gate(spark):
    """r10: below the edge-count gate, triangle_counts and
    common_neighbor_similarity must plan ZERO SortMergeJoins — the
    |nodes|-sized degree/is-edge frames broadcast, so the edge frame
    (triangles) and the wedge-pair frame (common neighbors) are never
    exchanged for them. Above the gate (threshold 0) the same code must
    fall back to shuffle joins without error."""
    from sdg_big_data_spark.operators.graph import (
        common_neighbor_similarity,
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40) for i in range(120)] + [(i, i + 1) for i in range(40)],
        schema="src long, dst long",
    )

    tri = triangle_counts(edges, "src", "dst")
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan

    cn = common_neighbor_similarity(edges, src="src", dst="dst", top_k=5)
    plan = cn._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    # above-gate fallback stays correct (same rows, any join strategy)
    small = {tuple(r) for r in tri.collect()}
    big = {
        tuple(r)
        for r in triangle_counts(edges, "src", "dst", broadcast_edges_max=0).collect()
    }
    assert small == big
