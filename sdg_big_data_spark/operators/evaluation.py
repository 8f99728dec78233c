"""Model-evaluation operators — the reference's evaluation harness
(SURVEY.md §5.1.3) as distributed operators:

- AUROC (`12-model_training_eval.Rmd:19-35` evaluates BERT with AUROC):
  Mann-Whitney rank statistic with average-rank tie handling — exact,
  one sort, no sklearn;
- precision@k (`sample_tweets_to_validate_inference_on_random_set.py`):
  share of positives in the top-k by score;
- recall proxy on seeded positives (`estimate_recall.py:64-77`): share
  of known-positive ids the scorer recovers above a cutoff.

Scale: AUC ranks every row through ``windows.global_rank`` (one range
shuffle, no single-partition stage); precision@k prunes per-partition
(shuffle-free ``partition_local_rank``) before a global rank that sees
at most k × n_partitions rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import windows


def auc(df: DataFrame, label_col: str | Column, score_col: str) -> DataFrame:
    """AUROC via the Mann-Whitney U statistic:
    AUC = (Σ rank(positives) − n_pos(n_pos+1)/2) / (n_pos · n_neg),
    with tied scores assigned their average rank (the exact value
    sklearn's roc_auc_score returns). Returns a 1-row frame
    (n_pos, n_neg, auc)."""
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    ranked = windows.global_rank(
        df.select(label.cast("int").alias("__y"), F.col(score_col).alias("__s")),
        ["__s"],
        ascending=True,
        rank_col="__r",
    )
    # average rank within tied scores
    avg_r = ranked.withColumn("__ar", F.avg("__r").over(Window.partitionBy("__s")))
    return avg_r.agg(
        F.sum("__y").alias("n_pos"),
        F.sum(1 - F.col("__y")).alias("n_neg"),
        (
            (
                F.sum(F.col("__ar") * F.col("__y"))
                - F.sum("__y") * (F.sum("__y") + 1) / 2.0
            )
            / (F.sum("__y") * F.sum(1 - F.col("__y")))
        ).alias("auc"),
    )


def precision_at_k(
    df: DataFrame, label_col: str | Column, score_col: str, k: int, id_col: str
) -> DataFrame:
    """Share of positives among the top-k by (score desc, id) — the
    rank-evaluation metric behind the reference's log-spaced sampling.
    Per-partition prune before the global top-k (never a full global
    sort)."""
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(label.cast("int").alias("__y"), score_col, id_col)
    ordering = [F.col(score_col).desc(), F.col(id_col).asc()]
    pruned = (
        windows.partition_local_rank(base, ordering, rank_col="__pr")
        .where(F.col("__pr") <= k)
        .drop("__pr")
    )
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    top = pruned.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    return top.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__y").alias("n_pos"),
        (F.sum("__y") / F.count(F.lit(1))).alias("precision"),
    )


def recall_proxy(
    scores: DataFrame,
    seed_positives: DataFrame,
    id_col: str,
    score_col: str,
    cutoff: float,
) -> DataFrame:
    """Recall proxy (`estimate_recall.py:64-77`): of the known-positive
    seed ids, what share scores >= cutoff. Seed set is dimension-sized →
    broadcast semi/inner join."""
    hits = scores.join(F.broadcast(seed_positives.select(id_col)), id_col)
    return hits.agg(
        F.count(F.lit(1)).alias("n_seed"),
        F.sum((F.col(score_col) >= cutoff).cast("int")).alias("n_recovered"),
        (
            F.sum((F.col(score_col) >= cutoff).cast("int")) / F.count(F.lit(1))
        ).alias("recall"),
    )
