"""Labor-market pipeline — the twitter-analytics workload end to end.

Reference chain (`SURVEY.md` §3.2): ORC corpus → normalize/dedup/sample →
n-gram labeling sets → (SLURM+ONNX BERT scoring, outside Spark) → ranked
retrieval / evaluation → monthly indicators. The out-of-Spark scoring loop
is replaced by the ``mapInPandas`` scoring operator — file sharding,
resume, and merge come free from Spark's task model.

Scale design: corpus passes are single-scan narrow pipelines (normalize +
filter + hash-dedup); candidate retrieval is a pushed-down rlike filter;
the only shuffles are the dedup groupBy and the final indicator groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..operators import sampling, scoring
from ..operators.joins import rank_join
from ..operators.panel import monthly_indicator
from ..operators.windows import global_topk


def build_corpus(
    tweets: DataFrame,
    text_col: str = "text",
    id_col: str = "tweet_id",
    lang: str | None = None,
    lang_col: str = "tweet_lang",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Corpus construction (`build_random_sets.py:31-63`): language
    filter → drop retweets → normalize (URL-strip, lowercase, accent
    fold) → exact-dedup on normalized text → optional deterministic
    sample.

    Dedup keeps the minimum id per normalized text (deterministic, unlike
    the reference's partition-order-dependent ``drop_duplicates``)."""
    t = tweets
    if lang is not None:
        t = t.where(F.col(lang_col) == lang)
    t = t.where(~F.col(text_col).contains("RT "))
    t = t.withColumn("text_norm", text.normalize_text(F.col(text_col)))
    keep = t.groupBy("text_norm").agg(F.min(id_col).alias(id_col))
    t = t.join(keep, [id_col, "text_norm"], "left_semi")
    if sample_fraction is not None:
        t = sampling.hash_sample(t, id_col, sample_fraction)
    return t


def ngram_labeling_sets(
    corpus: DataFrame,
    ngrams: list[str],
    n_per_ngram: int = 1000,
    text_col: str = "text_norm",
    id_col: str = "tweet_id",
) -> DataFrame:
    """Stratified n-gram retrieval (`select_tweets_containing_ngrams.py:
    117-146`): per pattern, tag matching tweets and sample ``n_per_ngram``
    deterministically. One scan with an OR-folded predicate; the
    per-stratum fraction table is broadcast-joined (never collected)."""
    conds: list[Column] = [F.col(text_col).rlike(p) for p in ngrams]
    tagged = corpus.select(
        id_col,
        text_col,
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(c, F.lit(p)).otherwise(F.lit(None))
                        for c, p in zip(conds, ngrams)
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("ngram"),
    )
    return sampling.stratified_hash_sample(tagged, "ngram", id_col, n_per_ngram)


def score_corpus(
    corpus: DataFrame,
    classes: list[str],
    text_col: str = "text_norm",
    id_col: str = "tweet_id",
    model_fn=None,
) -> DataFrame:
    """F6 — batch scoring via mapInPandas (replaces the reference's
    SLURM+ONNX loop, `deployment_ONNX_bert.py`); model pluggable, the
    deterministic logistic stub keeps tests exact."""
    return scoring.score_documents(corpus, text_col, id_col, classes, model_fn)


def top_tweets(scores: DataFrame, cls: str, k: int = 100) -> DataFrame:
    """O2 — ranked retrieval for active learning
    (`retrieve_top_tweets_peel.py:56`)."""
    return global_topk(scores, [cls], k, ascending=False)


def peel_retrieval(
    scores: DataFrame,
    labeled: DataFrame,
    cls: str,
    k: int = 100,
    id_col: str = "tweet_id",
) -> DataFrame:
    """Exploitation retrieval with peeling
    (`retrieve_top_tweets_peel.py:46-56`): anti-join out already-labeled
    ids (broadcast — label sets are small), then top-k by score. Each
    active-learning round peels the previous rounds' labels away."""
    fresh = scores.join(
        F.broadcast(labeled.select(id_col)), id_col, "left_anti"
    )
    return global_topk(fresh, [cls, id_col], k, ascending=False)


def uncertainty_sample(
    scores: DataFrame,
    cls: str,
    k_per_side: int = 25,
    pivot: float = 0.5,
    id_col: str = "tweet_id",
) -> DataFrame:
    """O4 — uncertainty sampling around the decision boundary
    (`retrieve_tweets_around_threshold.py:46-53`): k nearest scores on
    each side of ``pivot``."""
    d = (F.col(cls) - pivot).alias("__d")
    scored = scores.withColumn("__d", d)
    lo = global_topk(
        scored.where(F.col("__d") < 0), ["__d", id_col], k_per_side, ascending=False
    )
    hi = global_topk(
        scored.where(F.col("__d") >= 0), ["__d", id_col], k_per_side, ascending=True
    )
    return lo.unionByName(hi).drop("__d")


def rank_eval_sample(
    scores: DataFrame,
    cls: str,
    ranks: list[int],
    id_col: str = "tweet_id",
) -> DataFrame:
    """O5/J7 — log-spaced rank sampling for precision-at-rank evaluation
    (`sample_tweets_to_validate_inference_on_random_set.py:21-33,62-66`)."""
    return rank_join(scores, ranks=ranks, order_by=[cls, id_col], ascending=False)


def indicator(
    scores_dated: DataFrame,
    cls: str,
    cutoff: float,
    date_col: str = "created_at",
    group_cols: list[str] | None = None,
    id_col: str = "user_id",
) -> DataFrame:
    """A11 — the flagship monthly indicator
    (`13-indicator_time_series.Rmd:12-13` + `1_import.py:104-213`)."""
    return monthly_indicator(
        scores_dated, cls, cutoff, date_col, group_cols or [], id_col
    )


def run(
    tweets: DataFrame,
    classes: list[str],
    ngrams: list[str],
    cutoff: float = 0.5,
    lang: str | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline on a tweets frame with (tweet_id, user_id, text,
    tweet_lang, created_at)."""
    corpus = build_corpus(tweets, lang=lang)
    labeling = ngram_labeling_sets(corpus, ngrams)
    scored = score_corpus(corpus, classes)
    dated = scored.join(
        tweets.select("tweet_id", "user_id", "created_at"), "tweet_id"
    )
    return {
        "corpus": corpus,
        "labeling_sets": labeling,
        "scores": scored,
        "top": top_tweets(scored, classes[0]),
        "indicator": indicator(dated, classes[0], cutoff),
    }
