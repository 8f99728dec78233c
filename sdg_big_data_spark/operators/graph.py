"""Iterative graph operators — connected components over pair edges.

Why it exists: near-duplicate detection emits PAIRS (LSH candidates that
pass verify), but retention policy needs CLUSTERS — "keep one document
per group of mutual near-dups". The greedy drop-larger-id-of-each-pair
resolution (pipelines/dataprep.py) is one aggregation but not
transitive: in a chain a–b, b–c (a≁c) it keeps {a} where cluster
semantics keep {a, c}'s canonical... a true component labeling is the
correct operator, and the standard Spark formulation is an iterative
DataFrame loop (min-label propagation; Kiveris et al.'s star algorithms
are the constant-factor-tuned variant of the same fixpoint).

Scale notes: each iteration is one equi-join + one min-aggregation —
shuffle on node id; iterations ≈ graph diameter (near-dup clusters are
shallow — a handful). ``localCheckpoint`` every iteration truncates the
lineage so the plan doesn't grow exponentially (the classic iterative-
DataFrame trap); the convergence probe piggybacks on the aggregation
(max label change), one action per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _tracked_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """``localCheckpoint`` + the ids of the persistent RDDs it created,
    so superseded iteration state can be UNPERSISTED. Without this,
    every iteration's checkpoint blocks stay in storage memory for the
    session's lifetime (``spark.catalog.clearCache`` does not touch
    checkpointed RDDs) — measured as a 2x whole-suite slowdown once a
    few iterative queries had run."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint()
    return out, _persistent_ids(spark) - before


def _unpersist_ids(spark, ids: set[int]) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist()



def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    broadcast_nodes_max: int = 2_000_000,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it
    (= its component id). Returns (node, component).

    Deterministic: min-label fixpoint has a unique solution regardless of
    join order or partitioning. Physical strategy mirrors
    :func:`pagerank`: when the node set is ≤ ``broadcast_nodes_max`` the
    label frame is explicitly broadcast into each iteration's join —
    checkpointed inputs carry no size stats, so without the hint the
    planner sort-merge-joins (re-shuffles) the edge frame every round;
    above the threshold the same loop runs as shuffle joins on node id.

    Driver-memory interaction: every iteration re-broadcasts a fresh
    |nodes|-sized frame, and superseded broadcasts are only reclaimed
    by GC — with an 8 GB driver, ~25 iterations of multi-hundred-MB
    broadcasts can transiently exceed headroom between GC ticks. The
    2M-row default budgets ≈ 2M × (8 B key + 8 B value + ~2x JVM object
    overhead) ≈ 64 MB per broadcast — comfortably inside default
    driver/executor memory even with several un-collected generations
    in flight. Raise it only for wide-memory drivers; for STRING node
    ids (≈ 40-80 B/row vs 8) divide your budget accordingly — or
    pre-encode ids to longs as ``g_pagerank`` does.
    """
    spark = edges.sparkSession
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym, sym_ids = _tracked_checkpoint(sym.distinct())

    labels, label_ids = _tracked_checkpoint(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    small = labels.count() <= broadcast_nodes_max
    hint = F.broadcast if small else (lambda df: df)
    for _ in range(max_iter):
        # each node proposes its label to every neighbor; keep the min of
        # (own label, best neighbor proposal). The node's own row is
        # tagged so the PREVIOUS label rides through the same aggregation
        # — the convergence probe is then a narrow filter-count over the
        # checkpoint blocks instead of a second (new x old) join job.
        proposals = sym.join(
            hint(labels.withColumnRenamed("node", "u")), "u"
        ).select(F.col("v").alias("node"), "component", F.lit(0).alias("__own"))
        own = labels.select("node", "component", F.lit(1).alias("__own"))
        new_labels, new_ids = _tracked_checkpoint(
            proposals.unionByName(own)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("__own") == 1, F.col("component"))).alias(
                    "__old"
                ),
            )
        )
        # min-label propagation only ever lowers labels, so "changed" is
        # exactly "new < old"
        changed = new_labels.where(F.col("component") < F.col("__old")).count()
        _unpersist_ids(spark, label_ids)  # superseded iteration state
        labels, label_ids = new_labels.drop("__old"), new_ids
        if changed == 0:
            break
    _unpersist_ids(spark, sym_ids)
    # the final labels checkpoint must outlive this function (the caller
    # consumes it); register so release_caches()/cache_scope sweeps it
    from ..cachescope import register_checkpoint_ids

    register_checkpoint_ids(spark, label_ids)
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 3,
    round_dp: int = 10,
    assume_distinct: bool = False,
    assume_no_dangling: bool = False,
    broadcast_nodes_max: int = 2_000_000,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list → (node, rank).

    The iterative-DataFrame formulation (the same loop shape as
    :func:`connected_components`). Edge weights ``1/out_degree`` are
    joined ONCE before the loop, so each iteration is just

    - one (edge → rank) equi-join producing ``rank * w`` contributions,
    - one groupBy(dst) sum (map-side combined),
    - a 1-row broadcast of the dangling-node mass (nodes without
      out-edges donate their rank uniformly — the standard
      stochastic-matrix fix, so total rank stays 1). The dangling node
      SET is static, so it is computed once before the loop — and when
      it is empty (every node has out-edges, e.g. symmetrized graphs)
      the per-iteration mass aggregation is skipped entirely.

    Fixed ``n_iter`` (no convergence probe) keeps the computation a
    finite deterministic DAG — the DuckDB oracle replays it as
    ``n_iter`` unrolled CTEs (same pattern as the BPE trainer's exact
    oracle). Per-iteration ranks are rounded to ``round_dp`` decimals IN
    BOTH ENGINES, pinning the float trajectory so summation-order
    differences can't drift across iterations.

    Physical strategy: the rank frame is |nodes|-sized — orders of
    magnitude smaller than |edges| on real graphs. When |nodes| ≤
    ``broadcast_nodes_max`` the rank side of the per-iteration join is
    explicitly broadcast, so the EDGE frame never re-shuffles: each
    iteration is a map-side join over the stationary edge partitions
    plus one |nodes|-group aggregate. (The explicit hint matters
    because checkpointed inputs carry no size stats — without it the
    planner sort-merge-joins the edge frame every round.) Above the
    threshold the same loop runs as shuffle joins on node id —
    per-iteration cost linear in |edges|, skewed in-degree (a hub page)
    split by AQE. ``assume_distinct=True`` skips the edge-dedup shuffle
    when the caller already guarantees unique (src, dst) pairs.
    ``assume_no_dangling=True`` skips the dangling-set anti-join AND its
    materialization + probe when the caller guarantees every node has an
    out-edge (true by construction for symmetrized graphs: every node
    appears as a src).

    ``checkpoint_every`` sets the lineage-truncation cadence
    (iterative-plan blow-up guard). Default (None) = auto: for
    ``n_iter`` ≤ 4 the loop stays LAZY — all iterations fuse into the
    single job that consumes the result (each iteration's plan
    references the previous exactly once, so there is no recompute
    blow-up, just linear plan depth; measured 4.1→~2 s at sf0.1 from
    dropping the per-iteration materializations) — while longer runs
    checkpoint every 2 iterations. Explicit N = materialize every N
    iterations.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # ONE materialization of the edge set, already weighted: the dedup
    # exchange feeding both the out-degree aggregate and the join side is
    # computed once (ReusedExchange) inside a single checkpoint job, and
    # nodes/out-degrees below re-derive from the in-memory ew blocks —
    # checkpointing the raw edge frame separately paid a second full
    # materialization for nothing
    ew, ew_ids = _tracked_checkpoint(
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("__od")), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__od")).alias("__w"))
    )
    nodes, node_ids = _tracked_checkpoint(
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    small = n_nodes <= broadcast_nodes_max
    hint = F.broadcast if small else (lambda df: df)
    # the dangling-node SET is static; only its mass changes per round
    if assume_no_dangling:
        dang, dang_ids = None, set()
        has_dangling = False
    else:
        dang, dang_ids = _tracked_checkpoint(
            nodes.join(
                ew.select("src").distinct(),
                nodes["node"] == F.col("src"),
                "left_anti",
            )
        )
        has_dangling = dang.limit(1).count() > 0
    if checkpoint_every is None:
        checkpoint_every = n_iter + 1 if n_iter <= 4 else 2
    ranks = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank")
    )
    rank_ids: set[int] = set()
    for _i in range(n_iter):
        if has_dangling:
            dangling = ranks.join(hint(dang), "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__m")
            )
        else:
            dangling = spark.range(1).select(F.lit(0.0).alias("__m"))
        contribs = (
            ew.join(hint(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__c"))
            .withColumnRenamed("dst", "node")
        )
        stepped = (
            nodes.join(hint(contribs), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.lit(float(n_nodes))
                    + damping
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__m") / F.lit(float(n_nodes))
                    ),
                    round_dp,
                ).alias("rank"),
            )
        )
        if (_i + 1) % checkpoint_every == 0 and _i + 1 < n_iter:
            new_ranks, new_ids = _tracked_checkpoint(stepped)
            _unpersist_ids(spark, rank_ids)  # superseded iteration state
            ranks, rank_ids = new_ranks, new_ids
        else:
            # lazy step: the next iteration (or the consuming action)
            # extends this plan; any prior checkpoint stays persisted
            # because the plan still reads from its blocks
            ranks = stepped
    from ..cachescope import register_checkpoint_ids

    # the final frame is lazy (the last iteration never checkpoints) —
    # its plan still reads the ew/nodes (and possibly a mid-loop rank)
    # checkpoint blocks; keep them alive for the consuming action,
    # swept later by release_caches()
    register_checkpoint_ids(spark, node_ids)
    register_checkpoint_ids(spark, ew_ids)
    register_checkpoint_ids(spark, dang_ids)
    register_checkpoint_ids(spark, rank_ids)
    return ranks
