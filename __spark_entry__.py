"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`sdg_big_data_spark.plans` — the engine's declared
query catalog. Each catalog entry pairs a Spark implementation with the
equivalent DuckDB-runnable ANSI SQL (see plans/catalog.py for the
hash-stability conventions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sdg_big_data_spark import plans  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.3 — the threshold indicator A11,
    `13-indicator_time_series.Rmd:12-13`) on sf0.001."""
    return plans.queries()["a11_threshold_indicator"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (exact-match contract)."""
    return plans.oracle_sql()
