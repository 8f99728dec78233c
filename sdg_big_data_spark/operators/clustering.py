"""Distributed k-means (Lloyd) over embedding columns — the codebook
trainer for the IVF similarity path (operators/similarity.ivf_topk) and
the engine's representative iterative algorithm.

Spark-first shape: the driver controls the (short, fixed) iteration loop;
each iteration is ONE distributed pass —

  assign:    broadcast the k×dim codebook, per-row argmin (codegen'd
             fold over the array column, no Python);
  recompute: posexplode → groupBy (cluster, pos) avg → k×dim rows
             collected to the driver (tiny by definition of k).

At 100 TB the corpus is never shuffled: assignment is a map-side pass,
and the only shuffle carries (cluster, pos, partial-sum) combiner output.
Initialization is deterministic (hash-ordered sample), so runs are
reproducible; exact float centroids still depend on partition-summation
order, as in every distributed k-means.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def _sq_dist_to(vec_col: Column, centroid: list[float]) -> Column:
    lits = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            F.transform(vec_col, lambda x: x.cast("double")),
            lits,
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid id (0..k-1) per row, as a single projection.

    Argmin = the k distances evaluated ONCE into an array (let-bound),
    then ``array_position(arr, array_min(arr)) - 1`` — first match =
    lowest id on ties. The folded ``when(d < best)`` chain references
    both subtrees twice per step, so its expression tree (and the
    interpreted aggregate folds inside) grows 2^k — measured 50x slower
    at k=10 on the PQ encoder before the same fix
    (operators/similarity.pq_encode)."""
    from ..functions.text import let

    v = F.col(vec_col)
    d_arr = F.array(*[_sq_dist_to(v, c) for c in centroids])
    best_id = let(
        d_arr,
        lambda a: (F.array_position(a, F.array_min(a)) - 1).cast("int"),
    )
    return df.withColumn("cluster_id", best_id)


def kmeans(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
    round_dp: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means. Returns (assignments frame with ``cluster_id``,
    final centroids). Deterministic init: the k rows with the smallest
    key hash (stable across partitionings/reruns — SURVEY §7.5.5).

    ``round_dp`` pins the float trajectory for exact cross-engine
    replay (the pagerank/EWMA discipline): each UPDATED centroid
    component is rounded to ``floor(v·10^dp + 0.5)/10^dp`` — the same
    formula a SQL oracle can state verbatim, so per-iteration
    summation-order differences between engines cannot compound across
    iterations. Initial centroids stay unrounded (float32→double is
    exact in both engines), as do carried-over centroids of emptied
    clusters."""
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(hash_bucket(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

    for _ in range(max_iter):
        assigned = assign_clusters(df, centroids, vec_col)
        new_rows = (
            assigned.select(
                "cluster_id", F.posexplode(vec_col).alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("v"))
            .collect()
        )
        new_cents = [list(c) for c in centroids]
        acc: dict[int, dict[int, float]] = {}
        for r in new_rows:
            acc.setdefault(r["cluster_id"], {})[r["pos"]] = r["v"]
        for cid, comps in acc.items():
            vals = [comps[p] for p in sorted(comps)]
            if round_dp is not None:
                m = 10.0 ** round_dp
                # floor(v*10^dp + 0.5)/10^dp — NOT Python round() (it is
                # half-even) — so the oracle can replay it verbatim
                vals = [math.floor(v * m + 0.5) / m for v in vals]
            new_cents[cid] = vals
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new)) ** 0.5
            for old, new in zip(centroids, new_cents)
        )
        centroids = new_cents
        if shift < tol:
            break

    return assign_clusters(df, centroids, vec_col), centroids
