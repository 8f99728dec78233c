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


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it
    (= its component id). Returns (node, component).

    Deterministic: min-label fixpoint has a unique solution regardless of
    join order or partitioning.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each node proposes its label to every neighbor; keep the min of
        # (own label, best neighbor proposal)
        proposals = sym.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "component")
        new_labels = (
            proposals.unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
