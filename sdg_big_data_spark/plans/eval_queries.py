"""Catalog queries — the reference's home/work-labeling quality gate
(`compiled-bookdown/08-optimization.Rmd:60-216`): macro-F1 over {H,W}
after filter_o, Cohen's κ against a validator, and the 100-resample
balanced bootstrap (resampled users with replacement within activity
buckets) that produces the fold_f1 / fold_f1_std model-selection
statistics.

The labeled-locations fixture is derived from ``events`` with pure
integer arithmetic (identical in Spark and DuckDB), and the bootstrap
draws come from deterministic LCG mixing instead of ``rand()`` — so all
three queries, including the resampling itself, have EXACT value-hash
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import evaluation
from .catalog import register, table

# --- deterministic labels fixture (same arithmetic in both engines) ---------
#
# locations = distinct (user_id, event_id % 5); per location:
#   h  -> true class (H 40% / W 30% / O 30%)
#   g1 -> algorithm agreement draw (80% agree, else rotated class)
#   g2 -> first-validator agreement draw (85% agree, else rotated)

_SQL_LABELS = """
    loc AS (
      SELECT DISTINCT user_id, event_id % 5 AS cluster_label FROM events
    ),
    lab AS (
      SELECT user_id, cluster_label,
             user_id % 4 AS act_buck,
             (user_id * 31 + cluster_label * 7) % 10 AS h,
             ((user_id % 1000003) * 2654435761 + cluster_label * 40503) % 100 AS g1,
             ((user_id % 1000003) * 1299709 + cluster_label * 7919) % 100 AS g2
      FROM loc
    ),
    labels AS (
      SELECT user_id, cluster_label, act_buck,
             CASE WHEN h < 4 THEN 'H' WHEN h < 7 THEN 'W' ELSE 'O' END
               AS final_op,
             CASE WHEN g1 < 80
                  THEN CASE WHEN h < 4 THEN 'H' WHEN h < 7 THEN 'W' ELSE 'O' END
                  ELSE CASE WHEN h < 4 THEN 'W' WHEN h < 7 THEN 'O' ELSE 'H' END
             END AS algo_op,
             CASE WHEN g2 < 85
                  THEN CASE WHEN h < 4 THEN 'H' WHEN h < 7 THEN 'W' ELSE 'O' END
                  ELSE CASE WHEN h < 4 THEN 'O' WHEN h < 7 THEN 'H' ELSE 'W' END
             END AS first_op
      FROM lab
    )
"""


def _hw_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    loc = ev.select(
        "user_id", (F.col("event_id") % 5).alias("cluster_label")
    ).distinct()
    h = (F.col("user_id") * 31 + F.col("cluster_label") * 7) % 10
    g1 = (F.pmod(F.col("user_id"), F.lit(1000003)) * F.lit(2654435761) + F.col("cluster_label") * 40503) % 100
    g2 = (F.pmod(F.col("user_id"), F.lit(1000003)) * F.lit(1299709) + F.col("cluster_label") * 7919) % 100
    truth = F.when(h < 4, "H").when(h < 7, "W").otherwise("O")
    rot1 = F.when(h < 4, "W").when(h < 7, "O").otherwise("H")
    rot2 = F.when(h < 4, "O").when(h < 7, "H").otherwise("W")
    return loc.select(
        "user_id",
        "cluster_label",
        (F.col("user_id") % 4).alias("act_buck"),
        truth.alias("final_op"),
        F.when(g1 < 80, truth).otherwise(rot1).alias("algo_op"),
        F.when(g2 < 85, truth).otherwise(rot2).alias("first_op"),
    )


@register(
    "ev_macro_f1",
    sql=f"""
    WITH {_SQL_LABELS},
    kept AS (
      SELECT * FROM labels WHERE final_op != 'O' OR algo_op != 'O'
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN final_op = algo_op THEN 1 ELSE 0 END) AS DOUBLE) AS hits,
             CAST(sum(CASE WHEN final_op = 'H' AND algo_op = 'H' THEN 1 ELSE 0 END) AS DOUBLE) AS tp_h,
             CAST(sum(CASE WHEN final_op != 'H' AND algo_op = 'H' THEN 1 ELSE 0 END) AS DOUBLE) AS fp_h,
             CAST(sum(CASE WHEN final_op = 'H' AND algo_op != 'H' THEN 1 ELSE 0 END) AS DOUBLE) AS fn_h,
             CAST(sum(CASE WHEN final_op = 'W' AND algo_op = 'W' THEN 1 ELSE 0 END) AS DOUBLE) AS tp_w,
             CAST(sum(CASE WHEN final_op != 'W' AND algo_op = 'W' THEN 1 ELSE 0 END) AS DOUBLE) AS fp_w,
             CAST(sum(CASE WHEN final_op = 'W' AND algo_op != 'W' THEN 1 ELSE 0 END) AS DOUBLE) AS fn_w
      FROM kept
    ),
    pr AS (
      SELECT n, hits / n AS accuracy,
             CASE WHEN tp_h + fp_h > 0 THEN tp_h / (tp_h + fp_h) ELSE 0 END AS p_h,
             CASE WHEN tp_h + fn_h > 0 THEN tp_h / (tp_h + fn_h) ELSE 0 END AS r_h,
             CASE WHEN tp_w + fp_w > 0 THEN tp_w / (tp_w + fp_w) ELSE 0 END AS p_w,
             CASE WHEN tp_w + fn_w > 0 THEN tp_w / (tp_w + fn_w) ELSE 0 END AS r_w
      FROM c
    ),
    f AS (
      SELECT n, accuracy,
             CASE WHEN p_h + r_h > 0 THEN 2 * p_h * r_h / (p_h + r_h) ELSE 0 END AS f1_h,
             CASE WHEN p_w + r_w > 0 THEN 2 * p_w * r_w / (p_w + r_w) ELSE 0 END AS f1_w
      FROM pr
    )
    SELECT n, round(accuracy, 6) AS accuracy,
           round(f1_h, 6) AS f1_h, round(f1_w, 6) AS f1_w,
           round((f1_h + f1_w) / 2, 6) AS macro_f1
    FROM f
    """,
    tags=("evaluation", "macro-f1"),
    doc="macro-F1 over {H,W} + accuracy after filter_o — the reference's "
    "home/work model-selection objective (08-optimization.Rmd:74-101, "
    "sklearn labels=['H','W'] average='macro' semantics incl. "
    "zero_division=0), as one conditional-aggregation pass",
)
def ev_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _hw_labels(spark, sf_dir)
    out = evaluation.classification_metrics(labels, "final_op", "algo_op")
    return out.select(
        "n",
        F.round("accuracy", 6).alias("accuracy"),
        F.round("f1_H", 6).alias("f1_h"),
        F.round("f1_W", 6).alias("f1_w"),
        F.round("macro_f1", 6).alias("macro_f1"),
    )


@register(
    "ev_cohens_kappa",
    sql=f"""
    WITH {_SQL_LABELS},
    kept AS (
      SELECT first_op AS a, algo_op AS b FROM labels
      WHERE first_op IN ('H', 'W') AND algo_op IN ('H', 'W')
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS DOUBLE) AS agree,
             CAST(sum(CASE WHEN a = 'H' THEN 1 ELSE 0 END) AS DOUBLE) AS ma_h,
             CAST(sum(CASE WHEN b = 'H' THEN 1 ELSE 0 END) AS DOUBLE) AS mb_h,
             CAST(sum(CASE WHEN a = 'W' THEN 1 ELSE 0 END) AS DOUBLE) AS ma_w,
             CAST(sum(CASE WHEN b = 'W' THEN 1 ELSE 0 END) AS DOUBLE) AS mb_w
      FROM kept
    ),
    k AS (
      SELECT n, agree / n AS p_o,
             (ma_h / n) * (mb_h / n) + (ma_w / n) * (mb_w / n) AS p_e
      FROM c
    )
    SELECT n, round(p_o, 6) AS p_o, round(p_e, 6) AS p_e,
           round(CASE WHEN p_e < 1 THEN (p_o - p_e) / (1 - p_e) ELSE 1 END, 6)
             AS kappa
    FROM k
    """,
    tags=("evaluation", "kappa"),
    doc="Cohen's κ between validator and algorithm restricted to labels "
    "{H,W} (08-optimization.Rmd:85-88, sklearn cohen_kappa_score "
    "labels=['H','W'] semantics: rows with O in either rater dropped)",
)
def ev_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _hw_labels(spark, sf_dir)
    out = evaluation.cohen_kappa(labels, "first_op", "algo_op")
    return out.select(
        "n",
        F.round("p_o", 6).alias("p_o"),
        F.round("p_e", 6).alias("p_e"),
        F.round("kappa", 6).alias("kappa"),
    )


_BOOT_N = 20
_BOOT_SEED = 7


@register(
    "ev_bootstrap_f1",
    sql=f"""
    WITH {_SQL_LABELS},
    base AS (
      SELECT user_id AS u, act_buck AS bk, final_op AS t, algo_op AS p
      FROM labels WHERE final_op != 'O' OR algo_op != 'O'
    ),
    users AS (SELECT DISTINCT bk, u FROM base),
    indexed AS (
      SELECT bk, u, row_number() OVER (PARTITION BY bk ORDER BY u) AS idx
      FROM users
    ),
    sizes AS (SELECT bk, max(idx) AS nb FROM indexed GROUP BY bk),
    reps AS (
      SELECT bk, nb, unnest(range(1, {_BOOT_N} + 1)) AS i FROM sizes
    ),
    draws AS (
      SELECT bk, i,
             ((i * {evaluation._BOOT_A} + unnest(range(1, nb + 1)) * {evaluation._BOOT_B}
               + {_BOOT_SEED} + bk * 997) % {evaluation._BOOT_MOD}
              * {evaluation._BOOT_MULT} % {evaluation._BOOT_MOD}
              * {evaluation._BOOT_MULT} % {evaluation._BOOT_MOD}) % nb + 1 AS idx
      FROM reps
    ),
    mult AS (
      SELECT i, u, CAST(count(*) AS BIGINT) AS m
      FROM draws JOIN indexed USING (bk, idx)
      GROUP BY i, u
    ),
    per_rep AS (
      SELECT i,
             CAST(sum(m) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN t = p THEN m ELSE 0 END) AS DOUBLE) AS hits,
             CAST(sum(CASE WHEN t = 'H' AND p = 'H' THEN m ELSE 0 END) AS DOUBLE) AS tp_h,
             CAST(sum(CASE WHEN t != 'H' AND p = 'H' THEN m ELSE 0 END) AS DOUBLE) AS fp_h,
             CAST(sum(CASE WHEN t = 'H' AND p != 'H' THEN m ELSE 0 END) AS DOUBLE) AS fn_h,
             CAST(sum(CASE WHEN t = 'W' AND p = 'W' THEN m ELSE 0 END) AS DOUBLE) AS tp_w,
             CAST(sum(CASE WHEN t != 'W' AND p = 'W' THEN m ELSE 0 END) AS DOUBLE) AS fp_w,
             CAST(sum(CASE WHEN t = 'W' AND p != 'W' THEN m ELSE 0 END) AS DOUBLE) AS fn_w
      FROM base JOIN mult USING (u)
      GROUP BY i
    ),
    scored AS (
      SELECT i, hits / n AS accuracy,
             (CASE WHEN (CASE WHEN tp_h + fp_h > 0 THEN tp_h / (tp_h + fp_h) ELSE 0 END)
                        + (CASE WHEN tp_h + fn_h > 0 THEN tp_h / (tp_h + fn_h) ELSE 0 END) > 0
                   THEN 2 * (CASE WHEN tp_h + fp_h > 0 THEN tp_h / (tp_h + fp_h) ELSE 0 END)
                          * (CASE WHEN tp_h + fn_h > 0 THEN tp_h / (tp_h + fn_h) ELSE 0 END)
                          / ((CASE WHEN tp_h + fp_h > 0 THEN tp_h / (tp_h + fp_h) ELSE 0 END)
                             + (CASE WHEN tp_h + fn_h > 0 THEN tp_h / (tp_h + fn_h) ELSE 0 END))
                   ELSE 0 END
              + CASE WHEN (CASE WHEN tp_w + fp_w > 0 THEN tp_w / (tp_w + fp_w) ELSE 0 END)
                          + (CASE WHEN tp_w + fn_w > 0 THEN tp_w / (tp_w + fn_w) ELSE 0 END) > 0
                   THEN 2 * (CASE WHEN tp_w + fp_w > 0 THEN tp_w / (tp_w + fp_w) ELSE 0 END)
                          * (CASE WHEN tp_w + fn_w > 0 THEN tp_w / (tp_w + fn_w) ELSE 0 END)
                          / ((CASE WHEN tp_w + fp_w > 0 THEN tp_w / (tp_w + fp_w) ELSE 0 END)
                             + (CASE WHEN tp_w + fn_w > 0 THEN tp_w / (tp_w + fn_w) ELSE 0 END))
                   ELSE 0 END) / 2 AS macro_f1
      FROM per_rep
    )
    SELECT CAST(count(*) AS BIGINT) AS n_samples,
           round(avg(macro_f1), 6) AS f1_mean,
           round(stddev_samp(macro_f1), 6) AS f1_std,
           round(quantile_cont(macro_f1, 0.025), 6) AS f1_lo,
           round(quantile_cont(macro_f1, 0.975), 6) AS f1_hi,
           round(avg(accuracy), 6) AS acc_mean,
           round(stddev_samp(accuracy), 6) AS acc_std
    FROM scored
    """,
    tags=("evaluation", "bootstrap"),
    doc="balanced bootstrap of the macro-F1 gate "
    "(08-optimization.Rmd:104-125): users resampled with replacement "
    "within activity buckets via deterministic LCG draws (not rand()) — "
    "partition-invariant, retry-safe, and exactly oracle-replayable; "
    "fully distributed (windowed index + equi-joins + weighted "
    "conditional aggregation, nothing collected)",
)
def ev_bootstrap_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _hw_labels(spark, sf_dir)
    out = evaluation.balanced_bootstrap_metrics(
        labels,
        "final_op",
        "algo_op",
        "user_id",
        "act_buck",
        n_samples=_BOOT_N,
        seed=_BOOT_SEED,
    )
    return out.select(
        "n_samples",
        F.round("f1_mean", 6).alias("f1_mean"),
        F.round("f1_std", 6).alias("f1_std"),
        F.round("f1_lo", 6).alias("f1_lo"),
        F.round("f1_hi", 6).alias("f1_hi"),
        F.round("acc_mean", 6).alias("acc_mean"),
        F.round("acc_std", 6).alias("acc_std"),
    )


@register(
    "ev_calibration",
    sql="""
    WITH s AS (
      SELECT CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000
                       < ((event_id % 1000003) * 2654435761) % 1000
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    bins AS (
      SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             avg(p) AS conf,
             avg(CAST(y AS DOUBLE)) AS acc,
             sum((p - y) * (p - y)) AS se
      FROM s GROUP BY 1
    ),
    g AS (
      SELECT sum(se) / sum(n) AS brier,
             sum(n * abs(conf - acc)) / sum(n) AS ece
      FROM bins
    )
    SELECT bin, n, round(conf, 6) AS conf, round(acc, 6) AS acc,
           round(brier, 4) AS brier, round(ece, 4) AS ece
    FROM bins, g
    """,
    tags=("evaluation", "calibration"),
    doc="probability-calibration diagnostics (evaluation.calibration): "
    "10-bin reliability table + Brier score + ECE in ONE corpus pass "
    "(k-row bin aggregate; global scores derived from the same tiny frame "
    "and broadcast back). Scores/labels are deterministic integer hashes "
    "of event_id so the resampling-free fixture is exactly "
    "oracle-replayable",
)
def ev_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < h1).cast("int").alias("y"),
    )
    out = evaluation.calibration(scores, "y", "p", n_bins=10)
    return out.select(
        "bin",
        "n",
        F.round("conf", 6).alias("conf"),
        F.round("acc", 6).alias("acc"),
        # brier/ece are corpus-sized float sums: engines disagree in the
        # last ulp under different summation orders, so gate at 4 decimals.
        F.round("brier", 4).alias("brier"),
        F.round("ece", 4).alias("ece"),
    )


@register(
    "ev_roc_points",
    sql="""
    WITH s AS (
      SELECT CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000
                       < ((event_id % 1000003) * 2654435761) % 1000
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per AS (
      SELECT p AS score,
             CAST(sum(y) AS BIGINT) AS p_cnt,
             CAST(count(*) - sum(y) AS BIGINT) AS n_cnt
      FROM s GROUP BY p
    ),
    c AS (
      SELECT score,
             CAST(sum(p_cnt) OVER (ORDER BY score DESC) AS BIGINT) AS cum_tp,
             CAST(sum(n_cnt) OVER (ORDER BY score DESC) AS BIGINT) AS cum_fp
      FROM per
    ),
    t AS (
      SELECT CAST(sum(p_cnt) AS BIGINT) AS tp,
             CAST(sum(n_cnt) AS BIGINT) AS tn
      FROM per
    )
    SELECT score, cum_tp, cum_fp,
           CAST(cum_tp AS DOUBLE) / tp AS tpr,
           CAST(cum_fp AS DOUBLE) / tn AS fpr
    FROM c, t
    """,
    tags=("evaluation", "roc"),
    doc="ROC curve materialization (evaluation.roc_points): per distinct "
    "score threshold the cumulative TP/FP and TPR/FPR — the curve the "
    "AUC scalar integrates, used for cutoff selection. One groupBy(score) "
    "corpus collapse + both running sums on one scalable prefix-sum pass "
    "(no single-partition sort at any score cardinality); TPR/FPR are "
    "exact-integer ratios, bit-identical across engines",
)
def ev_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < h1).cast("int").alias("y"),
    )
    return evaluation.roc_points(scores, "y", "p").select(
        "score", "cum_tp", "cum_fp", "tpr", "fpr"
    )


@register(
    "dq_ks_drift",
    sql="""
    WITH t AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    g AS (
      SELECT v, CAST(sum(a) AS BIGINT) AS ca, CAST(count(*) AS BIGINT) AS ct
      FROM t GROUP BY v
    ),
    c AS (
      SELECT CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
             CAST(sum(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
      FROM g
    ),
    n AS (
      SELECT CAST(sum(a) AS BIGINT) AS na,
             CAST(count(*) - sum(a) AS BIGINT) AS nb
      FROM t
    )
    SELECT n.na AS n_a, n.nb AS n_b,
           round(max(abs(CAST(cum_a AS DOUBLE) / na
                         - CAST(cum_t - cum_a AS DOUBLE) / nb)), 6) AS ks
    FROM c, n GROUP BY n.na, n.nb
    """,
    tags=("data-quality", "drift"),
    doc="two-sample Kolmogorov-Smirnov drift statistic between event-type "
    "value distributions (quality.ks_statistic): exact sup|ECDF_a-ECDF_b| "
    "via distinct-value grouping + the scalable prefix sum — no sampling "
    "cap, no single-partition sort; integer counts until the final "
    "division, so the oracle replays it exactly",
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import ks_statistic

    ev = table(spark, sf_dir, "events")
    out = ks_statistic(ev, "value", "event_type", "click", "purchase")
    return out.select("n_a", "n_b", F.round("ks", 6).alias("ks"))


@register(
    "ev_mrr",
    sql="""
    WITH s AS (
      SELECT event_id,
             event_id % 97 AS qid,
             CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000 < 20
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    ranked AS (
      SELECT qid, y,
             row_number() OVER (PARTITION BY qid
                                ORDER BY p DESC, event_id ASC) AS rk
      FROM s
    ),
    per_q AS (
      SELECT qid, min(CASE WHEN y = 1 THEN rk END) AS first_rel
      FROM ranked GROUP BY qid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count(first_rel) AS BIGINT) AS n_with_relevant,
           round(avg(coalesce(CAST(1 AS DOUBLE) / first_rel, 0.0)), 6) AS mrr
    FROM per_q
    """,
    tags=("evaluation", "ranking"),
    doc="mean reciprocal rank over per-query rankings "
    "(evaluation.mean_reciprocal_rank): 1/rank of each query's first "
    "relevant item, empty-relevance queries count 0 in the mean; one "
    "query-keyed window + one aggregate, nothing global",
)
def ev_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        "event_id",
        (F.col("event_id") % 97).alias("qid"),
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < 20).cast("int").alias("y"),
    )
    out = evaluation.mean_reciprocal_rank(scores, "y", "p", "qid", "event_id")
    return out.select(
        "n_queries", "n_with_relevant", F.round("mrr", 6).alias("mrr")
    )


@register(
    "ev_ndcg",
    sql="""
    WITH s AS (
      SELECT event_id,
             CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000
                       < ((event_id % 1000003) * 2654435761) % 1000
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    ranked AS (
      SELECT y, row_number() OVER (ORDER BY p DESC, event_id ASC) AS rk
      FROM s
    ),
    d AS (
      SELECT sum(CAST(y AS DOUBLE) / log2(rk + 1)) AS dcg
      FROM ranked WHERE rk <= 100
    ),
    np AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos FROM s),
    ideal AS (
      SELECT CAST(COALESCE(sum(CAST(1 AS DOUBLE) / log2(i + 1)), 0) AS DOUBLE)
               AS idcg
      FROM (SELECT unnest(range(1, (SELECT least(100, n_pos) FROM np) + 1)) AS i)
    )
    SELECT 100 AS k, n_pos, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
           round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg
    FROM d, np, ideal
    """,
    tags=("evaluation", "ranking"),
    doc="nDCG@100 for binary relevance (evaluation.ndcg_at_k): top-k is "
    "a TakeOrdered (per-partition heap + k-row driver merge, never a "
    "global sort); ideal DCG is a closed-form harmonic sum over "
    "sequence(1, min(k, n_pos)) — no second ranking pass",
)
def ev_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        "event_id",
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < h1).cast("int").alias("y"),
    )
    out = evaluation.ndcg_at_k(scores, "y", "p", "event_id", k=100)
    return out.select(
        "k",
        "n_pos",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round("ndcg", 6).alias("ndcg"),
    )


@register(
    "ev_auc_by_group",
    sql="""
    WITH s AS (
      SELECT event_type AS grp,
             CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000
                       < ((event_id % 1000003) * 2654435761) % 1000
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    r AS (
      SELECT grp, y,
             avg(rn) OVER (PARTITION BY grp, p) AS ar
      FROM (
        SELECT grp, p, y,
               row_number() OVER (PARTITION BY grp ORDER BY p ASC) AS rn
        FROM s
      )
    )
    SELECT grp,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
           round(
             (sum(ar * y) - CAST(sum(y) AS DOUBLE) * (sum(y) + 1) / 2.0)
               / (CAST(sum(y) AS DOUBLE) * (count(*) - sum(y))),
             9
           ) AS auc
    FROM r GROUP BY grp
    """,
    tags=("evaluation", "auc", "grouped"),
    doc="per-segment AUROC (evaluation.grouped_auc): Mann-Whitney with "
    "average-rank ties per event_type slice — one keyed window shuffle "
    "+ a #groups-row aggregate; the reference's per-country evaluation "
    "shape. Deterministic: tied ranks are averaged per (group, score), "
    "so row_number's arbitrary tie order cancels",
)
def ev_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        F.col("event_type").alias("grp"),
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < h1).cast("int").alias("y"),
    )
    out = evaluation.grouped_auc(scores, ["grp"], "y", "p")
    return out.select("grp", "n_pos", "n_neg", F.round("auc", 9).alias("auc"))


@register(
    "ev_ab_test",
    sql="""
    WITH s AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             value + CASE WHEN user_id % 2 = 0 THEN 0.5 ELSE 0.0 END AS v
      FROM events
    ),
    g AS (
      -- n counts NON-NULL metric values (count over v, not 1), matching
      -- the operator's F.count(when(arm=…, v)) contract: rows whose
      -- metric is null are excluded from n just as they are from
      -- mean/var, so t/dof never mix a larger n with a smaller sample
      SELECT CAST(count(CASE WHEN arm = 'A' THEN v END) AS BIGINT) AS n_a,
             CAST(count(CASE WHEN arm = 'B' THEN v END) AS BIGINT) AS n_b,
             avg(CASE WHEN arm = 'A' THEN v END) AS mean_a,
             avg(CASE WHEN arm = 'B' THEN v END) AS mean_b,
             var_samp(CASE WHEN arm = 'A' THEN v END) AS var_a,
             var_samp(CASE WHEN arm = 'B' THEN v END) AS var_b
      FROM s
    )
    SELECT n_a, n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
           round((mean_a - mean_b)
                   / sqrt(var_a / n_a + var_b / n_b), 4) AS t_welch,
           round(pow(var_a / n_a + var_b / n_b, 2)
                   / (pow(var_a / n_a, 2) / (n_a - 1)
                      + pow(var_b / n_b, 2) / (n_b - 1)), 2) AS dof
    FROM g
    """,
    tags=("evaluation", "ab-test"),
    doc="two-sample A/B readout (evaluation.ab_test): per-arm n/mean/var "
    "+ Welch t + Welch-Satterthwaite dof in ONE conditional-aggregation "
    "pass (map-side combined, 1-row output); arms and a planted +0.5 "
    "lift derive deterministically from user_id so the t is genuinely "
    "nonzero and oracle-replayable",
)
def ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        (
            F.col("value")
            + F.when(F.col("user_id") % 2 == 0, 0.5).otherwise(0.0)
        ).alias("v"),
    )
    out = evaluation.ab_test(s, "arm", "A", "B", "v")
    return out.select(
        "n_a", "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("var_a", 6).alias("var_a"),
        F.round("var_b", 6).alias("var_b"),
        F.round("t_welch", 4).alias("t_welch"),
        F.round("dof", 2).alias("dof"),
    )


# --- dq_benford --------------------------------------------------------------

# Benford first-digit expectation log10(1 + 1/d), rounded once so both
# engines consume identical literals.
_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_VALUES = ", ".join(
    f"({d}, {p!r})" for d, p in _BENFORD_P.items()
)


@register(
    "dq_benford",
    sql=f"""
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY digit
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM obs),
    exp_p(digit, p) AS (VALUES {_BENFORD_VALUES})
    SELECT e.digit, COALESCE(o.n, 0) AS n,
           round(COALESCE(o.n, 0) / t.t, 6) AS obs_frac,
           round(CAST(e.p AS DOUBLE), 6) AS benford_p,
           round(t.t * pow(COALESCE(o.n, 0) / t.t - CAST(e.p AS DOUBLE), 2)
                 / CAST(e.p AS DOUBLE), 4)
             AS chi2_term
    FROM exp_p e
    LEFT JOIN obs o USING (digit)
    CROSS JOIN tot t
    """,
    tags=("data-quality", "benford"),
    doc="Benford first-digit drift gate: observed first-significant-digit "
    "distribution of a monetary column vs log10(1+1/d), with per-digit "
    "chi-square terms — the classic fabricated-/corrupted-data detector "
    "for numeric feeds; one map-side-combined 9-row aggregate at any "
    "corpus size",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") >= 1)
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").cast("double").alias("t"))
    exp_df = obs.sparkSession.createDataFrame(
        sorted(_BENFORD_P.items()), "digit long, p double"
    )
    j = (
        exp_df.join(obs, "digit", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    frac = F.col("n") / F.col("t")
    return j.select(
        "digit",
        "n",
        F.round(frac, 6).alias("obs_frac"),
        F.round(F.col("p"), 6).alias("benford_p"),
        F.round(F.col("t") * F.pow(frac - F.col("p"), 2) / F.col("p"), 4).alias(
            "chi2_term"
        ),
    )


@register(
    "ev_diversity",
    sql="""
    WITH sel AS (
      SELECT vec_id AS i,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 17 = 0
    ),
    pairs AS (
      SELECT a.i,
             CAST(round(
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) * 1000000
             ) AS BIGINT) AS cu
      FROM sel a CROSS JOIN sel b
    ),
    per_i AS (
      SELECT i, max(-cu) AS mx, CAST(sum(cu) AS BIGINT) AS s
      FROM pairs GROUP BY i
    )
    SELECT CAST(count(*) AS BIGINT) AS n_selected,
           round(CAST(-sum(s) AS DOUBLE)
                 / (1000000.0 * count(*) * count(*)), 6) AS mean_diversity,
           round(CAST(sum(mx) AS DOUBLE)
                 / (1000000.0 * count(*)), 6) AS mean_max_diversity
    FROM per_i
    """,
    tags=("evaluation", "diversity", "embeddings"),
    doc="embedding-diversity of a selected set "
    "(evaluation.selection_diversity — the reference's mean / mean-max "
    "pairwise-cosine diversity, compute_diversity.py:34-39,163-166): "
    "every 17th vector stands in for an active-learning top-k batch; "
    "k-sized broadcast x k-sized scan, per-pair cosines pinned to "
    "integer 1e-6 units before the exact long summation",
)
def ev_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    sel = emb.where(F.col("vec_id") % 17 == 0)
    return evaluation.selection_diversity(sel)


@register(
    "ev_pr_auc",
    sql="""
    WITH s AS (
      SELECT CAST(((event_id % 1000003) * 2654435761) % 1000 AS DOUBLE)
               / CAST(1000 AS DOUBLE) AS p,
             CASE WHEN ((event_id % 1000003) * 1299709 + 7) % 1000
                       < ((event_id % 1000003) * 2654435761) % 1000
                  THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per AS (
      SELECT p AS score,
             CAST(sum(y) AS BIGINT) AS p_cnt,
             CAST(count(*) - sum(y) AS BIGINT) AS n_cnt
      FROM s GROUP BY p
    ),
    c AS (
      SELECT score, p_cnt,
             CAST(sum(p_cnt) OVER (ORDER BY score DESC) AS BIGINT) AS cum_tp,
             CAST(sum(n_cnt) OVER (ORDER BY score DESC) AS BIGINT) AS cum_fp
      FROM per
    ),
    t AS (
      SELECT CAST(sum(p_cnt) AS BIGINT) AS n_pos,
             CAST(sum(n_cnt) AS BIGINT) AS n_neg
      FROM per
    )
    SELECT t.n_pos, t.n_neg,
           round(sum((CAST(p_cnt AS DOUBLE) / t.n_pos)
                     * (CAST(cum_tp AS DOUBLE) / (cum_tp + cum_fp))), 6)
             AS avg_precision
    FROM c, t GROUP BY t.n_pos, t.n_neg
    """,
    tags=("evaluation", "pr-auc"),
    doc="average precision / PR-AUC by the step integral "
    "(evaluation.average_precision, sklearn average_precision_score "
    "semantics) — the class-imbalance-robust companion to ev_auc, over "
    "the SAME deterministic score/label fixture as ev_roc_points. "
    "Delta-TP at a threshold is the positive count AT that score, so "
    "the whole metric is one groupBy(score) collapse + the scalable "
    "prefix-sum pass + a 1-row aggregate — no lag window, no "
    "percentile approximation",
)
def ev_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h1 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(2654435761)) % 1000
    h2 = (F.pmod(F.col("event_id"), F.lit(1000003)) * F.lit(1299709) + 7) % 1000
    scores = ev.select(
        (h1.cast("double") / F.lit(1000.0)).alias("p"),
        (h2 < h1).cast("int").alias("y"),
    )
    return evaluation.average_precision(scores, "y", "p")


@register(
    "ev_krippendorff",
    sql="""
    WITH uv AS (
      SELECT user_id AS u, event_type AS v, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    pu AS (
      SELECT u, CAST(sum(c) AS BIGINT) AS m,
             CAST(sum(c * (c - 1)) AS BIGINT) AS agree
      FROM uv GROUP BY u HAVING sum(c) >= 2
    ),
    us AS (
      SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(m) AS BIGINT) AS n_ratings,
             CAST(sum(CAST(round(1000000000.0 * (m * (m - 1) - agree)
                                 / (m - 1)) AS BIGINT)) AS BIGINT) AS p_units
      FROM pu
    ),
    mg AS (
      SELECT CAST(sum(nc * nc) AS BIGINT) AS sq FROM (
        SELECT CAST(sum(c) AS BIGINT) AS nc
        FROM uv JOIN pu USING (u) GROUP BY v
      )
    )
    SELECT n_units, n_ratings,
           round(CASE WHEN CAST(n_ratings AS DOUBLE) * n_ratings - sq > 0
                 THEN 1 - (CAST(p_units AS DOUBLE) / 1000000000.0)
                          * (CAST(n_ratings AS DOUBLE) - 1)
                          / (CAST(n_ratings AS DOUBLE)
                             * CAST(n_ratings AS DOUBLE)
                             - CAST(sq AS DOUBLE))
                 END, 6) AS alpha
    FROM us, mg
    """,
    tags=("evaluation", "agreement", "krippendorff"),
    doc="Krippendorff's alpha, nominal (evaluation.krippendorff_alpha "
    "— Krippendorff 2004 §11.3 coincidence form): multi-rater/"
    "missing-data agreement, generalizing ev_cohens_kappa; the "
    "labeling-QA gate for multi-annotator training data. Fixture: do a "
    "user's events agree on event_type (unit=user, value=type). One "
    "corpus-collapsing (unit, value) histogram, then key-sized "
    "aggregates; per-unit fractions pinned to integer 1e-9 units so "
    "the cross-unit sum is exact long arithmetic in both engines",
)
def ev_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return evaluation.krippendorff_alpha(ev, "user_id", "event_type")


@register(
    "ev_spearman",
    sql="""
    WITH b AS (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    r AS (
      SELECT CAST(rank() OVER (ORDER BY x) AS DOUBLE)
               + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
             CAST(rank() OVER (ORDER BY y) AS DOUBLE)
               + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM b
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(corr(rx, ry), 5) AS spearman
    FROM r
    """,
    tags=("eval", "rank-correlation"),
    doc="exact Spearman rank correlation with average-rank ties "
    "(evaluation.spearman_corr — scipy.stats.spearmanr value) between "
    "quantity and price: rank-free distinct-value prefix-sum ranking "
    "(the AUC machinery), never a per-row global window; the oracle's "
    "rank()+tie-count window form is the textbook equivalent",
)
def ev_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return evaluation.spearman_corr(li, "l_quantity", "l_extendedprice")
