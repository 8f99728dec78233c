"""News-sentiment pipeline — the news-analytics workload end to end.

Reference chain (`SURVEY.md` §3.3): pandas article ingest → dictionary
TF sentiment (mp.Pool) → regions explode/geocode → Stata daily collapse →
z-scores → dynamic-factor global index. Everything through the daily
country panel distributes as DataFrame work; the factor extraction is a
driver-side numerical routine on the collected ≤25-column panel —
explicitly out of distributed scope (`SURVEY.md` §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..operators.relational import collapse, zscore_by_group

# Compact builtin lexicons for tests; production swaps the 7,217-negative /
# 3,250-positive word lists the reference uses (`news-analytics/README.md:35`).
POSITIVE_WORDS = ["good", "great", "gain", "growth", "improve", "strong", "up"]
NEGATIVE_WORDS = ["bad", "loss", "decline", "weak", "crisis", "down", "fear"]


def article_sentiment(
    articles: DataFrame,
    text_col: str = "full_text",
    id_col: str = "an",
    positive: list[str] | None = None,
    negative: list[str] | None = None,
) -> DataFrame:
    """F8 — bag-of-words dictionary sentiment TF per article (news
    notebook cell 15): (pos hits − neg hits) / total tokens. One
    let-bound tokenizer pass; distributes what the reference ran through
    mp.Pool on one node."""
    pos_arr = F.array(*[F.lit(w) for w in (positive or POSITIVE_WORDS)])
    neg_arr = F.array(*[F.lit(w) for w in (negative or NEGATIVE_WORDS)])
    counts = text.let(
        text.tokenize(F.col(text_col)),
        lambda toks: F.struct(
            F.size(F.filter(toks, lambda x: F.array_contains(pos_arr, x))).alias("p"),
            F.size(F.filter(toks, lambda x: F.array_contains(neg_arr, x))).alias("n"),
            F.size(toks).alias("t"),
        ),
    )
    c = F.col("__c")
    return (
        articles.withColumn("__c", counts)
        .where(c["t"] > 0)
        .withColumn(
            "sentiment", (c["p"] - c["n"]).cast("double") / c["t"]
        )
        .drop("__c")
    )


def explode_countries(
    scored: DataFrame, regions_col: str = "regions"
) -> DataFrame:
    """A12 — article → one row per tagged country (news notebook cells
    19-23)."""
    return scored.withColumn("country", F.explode(F.col(regions_col)))


def daily_panel(by_country: DataFrame, date_col: str = "date") -> DataFrame:
    """A14 — Stata collapse (`1_sentiment_country.do:22`): per (country,
    day) mean sentiment + article count."""
    day = F.date_trunc("day", F.col(date_col)).cast("date").alias("day")
    out = collapse(
        by_country.select("country", day, "sentiment"),
        ["country", "day"],
        means=["sentiment"],
    )
    n = by_country.select("country", day).groupBy("country", "day").count()
    return out.join(n, ["country", "day"]).withColumnRenamed("count", "n_articles")


def standardized_panel(panel: DataFrame) -> DataFrame:
    """A15 — within-country z-scores (`news-analytics/README.md:39`)."""
    return zscore_by_group(panel, "sentiment_mean", ["country"], "sentiment_z")


def global_factor(panel: DataFrame) -> pd.DataFrame:
    """The dynamic-factor global index (`3_sentiment_global.do:15-38`:
    dfactor AR single-factor MLE), replaced by the first principal
    component of the (day × country) z-score matrix — a driver-side numpy
    SVD on the collected panel (≤25 countries × ~10k days ≈ 2 MB;
    distributing this would be slower than collecting it).

    Returns a pandas frame (day, factor)."""
    pdf = (
        panel.select("country", "day", "sentiment_z")
        .toPandas()
        .pivot_table(index="day", columns="country", values="sentiment_z")
        .sort_index()
    )
    filled = pdf.fillna(0.0)
    mat = filled.to_numpy(dtype=float)
    # First principal component via SVD; sign fixed so the factor
    # correlates positively with the cross-country mean.
    u, s, _ = np.linalg.svd(mat - mat.mean(axis=0), full_matrices=False)
    factor = u[:, 0] * s[0]
    if np.corrcoef(factor, np.nan_to_num(mat).mean(axis=1))[0, 1] < 0:
        factor = -factor
    return pd.DataFrame({"day": filled.index, "factor": factor})


def global_factor_dfm(
    panel: DataFrame, ar_order: int = 8, n_iter: int = 50
) -> pd.DataFrame:
    """The reference's ACTUAL estimator (`3_sentiment_global.do:33-38`):
    single-factor dynamic-factor model with AR(``ar_order``) factor
    dynamics, fit by EM/Kalman MLE on the (day × country) panel with
    missing days filled as 0 (the .do file's ``replace vv = 0 if
    mi(vv)`` after ``tsfill``), reporting the FILTERED factor
    (``smethod(filter)``). :func:`global_factor` (SVD PC1) remains as
    the cheap static approximation.

    Returns a pandas frame (day, factor, factor_smoothed)."""
    from ..operators.dfactor import fit_dynamic_factor

    pdf = (
        panel.select("country", "day", "sentiment_z")
        .toPandas()
        .pivot_table(index="day", columns="country", values="sentiment_z")
        .sort_index()
    )
    filled = pdf.fillna(0.0)
    fit = fit_dynamic_factor(
        filled.to_numpy(dtype=float), ar_order=ar_order, n_iter=n_iter
    )
    return pd.DataFrame(
        {
            "day": filled.index,
            "factor": fit["factor_filtered"],
            "factor_smoothed": fit["factor_smoothed"],
        }
    )


def run(articles: DataFrame, ar_order: int = 8) -> dict[str, object]:
    """Full pipeline on an articles frame with (an, date,
    regions array<string>, full_text)."""
    scored = article_sentiment(articles)
    by_country = explode_countries(scored)
    panel = daily_panel(by_country)
    std = standardized_panel(panel)
    return {
        "scored": scored,
        "panel": panel,
        "standardized": std,
        "global_factor": global_factor(std),
        "global_factor_dfm": global_factor_dfm(std, ar_order=ar_order),
    }
