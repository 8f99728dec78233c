"""Runtime data-quality assertions — SURVEY.md §5.1.1: the reference
validates inside every stop-detection call (`wbgps/stops.py:40-45`:
timestamp ordering, lat/lon ranges) and hard-fails on violations.

Engine form: cheap DataFrame checks that either RAISE with a row count
(fail-fast pipelines) or RETURN the violations frame (quarantine flows).
Each check is one aggregate over a narrow projection — at 100 TB these
are filter+count map-side passes, not sorts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class DataAssertionError(AssertionError):
    def __init__(self, name: str, n_bad: int, sample: list):
        self.name, self.n_bad, self.sample = name, n_bad, sample
        super().__init__(f"{name}: {n_bad} violating rows; sample: {sample[:3]}")


def _enforce(df: DataFrame, bad: Column, name: str, raise_on_fail: bool) -> DataFrame:
    viol = df.where(bad)
    if raise_on_fail:
        n = viol.count()
        if n:
            raise DataAssertionError(name, n, viol.limit(3).collect())
        return df
    return viol


def expect_in_range(
    df: DataFrame, col: str, lo, hi, raise_on_fail: bool = True
) -> DataFrame:
    """Range check (lat/lon/accuracy bounds, `stops.py:42-45`). Returns
    ``df`` on success; raises (or returns violations) otherwise."""
    bad = ~F.col(col).between(lo, hi) | F.col(col).isNull()
    return _enforce(df, bad, f"expect_in_range({col},[{lo},{hi}])", raise_on_fail)


def expect_not_null(
    df: DataFrame, cols: Sequence[str], raise_on_fail: bool = True
) -> DataFrame:
    bad = None
    for c in cols:
        b = F.col(c).isNull()
        bad = b if bad is None else (bad | b)
    return _enforce(df, bad, f"expect_not_null({list(cols)})", raise_on_fail)


def expect_unique(
    df: DataFrame, cols: Sequence[str], raise_on_fail: bool = True
) -> DataFrame:
    """Key-uniqueness check: one groupBy, violations = keys with count>1."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
    )
    if raise_on_fail:
        n = dupes.count()
        if n:
            raise DataAssertionError(
                f"expect_unique({list(cols)})", n, dupes.limit(3).collect()
            )
        return df
    return dupes


def expect_ordered(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    strictly: bool = False,
    raise_on_fail: bool = True,
) -> DataFrame:
    """Per-key monotonicity (`stops.py:40-41` requires sorted timestamps):
    violations are rows where ``order_col`` decreases vs the previous row
    within the key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    out = df.withColumn("__prev", F.lag(order_col).over(w))
    prev = F.col("__prev")
    bad = (
        (prev > F.col(order_col))
        if not strictly
        else (prev >= F.col(order_col))
    )
    name = f"expect_ordered({list(key_cols)},{order_col})"
    viol = out.where(prev.isNotNull() & bad).drop("__prev")
    if raise_on_fail:
        n = viol.count()
        if n:
            raise DataAssertionError(name, n, viol.limit(3).collect())
        return df
    return viol
