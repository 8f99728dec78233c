"""Distribution-drift operators — two-sample Kolmogorov-Smirnov.

A training-data pipeline needs drift detection: did this crawl's quality
scores / document lengths / model scores shift against the reference
corpus? The two-sample KS statistic — max |ECDF_a(x) − ECDF_b(x)| — is
the standard nonparametric answer.

Exact and scalable: group both samples by value (ties collapse to one
row), then ONE ordered prefix sum over the distinct-value frame gives
both ECDFs (cum_b = cum_total − cum_a, so a single
:func:`~.windows.grouped_prefix_sum` pass suffices), and the statistic
is a max-aggregate. No single-partition sort anywhere — the prefix sum
range-partitions — and no sample-size cap: the exact statistic over
billions of rows. Pure integer counts until the final division, so a
SQL oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import grouped_prefix_sum


def ks_statistic(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
) -> DataFrame:
    """Two-sample KS over ``value_col``, comparing rows where
    ``side_col == side_a`` against ``side_col == side_b``. Returns one
    row: (n_a, n_b, ks).

    The sup over x of |ECDF_a − ECDF_b| is attained at a sample point,
    and with ties grouped the right-limit ECDFs at each distinct value
    are exactly the cumulative counts / n — so the grouped max IS the
    exact statistic.
    """
    tagged = df.where(F.col(side_col).isin(side_a, side_b)).select(
        F.col(value_col).alias("__v"),
        (F.col(side_col) == side_a).cast("long").alias("__a"),
    )
    per_value = tagged.groupBy("__v").agg(
        F.sum("__a").alias("__ca"),
        F.count(F.lit(1)).alias("__ct"),
    )
    cum = grouped_prefix_sum(
        per_value.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("__v").asc()],
        "__ct",
        cum_col="__cum_t",
    )
    # second prefix over the SAME ordered frame for the a-side counts —
    # piggybacked as one more narrow pass (the frame is already
    # range-partitioned by __v; reuse of the operator keeps the code
    # declarative and both passes scale identically)
    cum = grouped_prefix_sum(
        cum,
        ["__g"],
        [F.col("__v").asc()],
        "__ca",
        cum_col="__cum_a",
    )
    totals = tagged.agg(
        F.sum("__a").alias("__na"),
        (F.count(F.lit(1)) - F.sum("__a")).alias("__nb"),
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "__na",
        "__nb",
        (
            F.abs(
                F.col("__cum_a") / F.col("__na")
                - (F.col("__cum_t") - F.col("__cum_a")) / F.col("__nb")
            )
        ).alias("__d"),
    )
    return scored.agg(
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.max("__d").alias("ks"),
    )
