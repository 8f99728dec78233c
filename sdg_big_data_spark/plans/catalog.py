"""The declared query catalog — one entry per implemented operator from
SURVEY.md §2 (plus the LLM-pipeline operator families).

Each :class:`QuerySpec` pairs a Spark implementation (a callable taking
``(spark, sf_dir)``) with the equivalent ANSI SQL that DuckDB runs on the
same parquet tables — the driver's correctness gate. Conventions that keep
the value-hashes matching:

- every computed column is aliased IDENTICALLY in both forms;
- floating aggregates are rounded (sums→2dp, means/ratios→4dp+) so the
  double summation-order difference between engines cannot flip a hash;
- every ordering/rank/argmax carries a deterministic unique-key tiebreak;
- engine-specific dialect differences (DuckDB ``regexp_replace`` needing
  the ``'g'`` flag, ``sum(int)``→HUGEINT, ``dayofweek`` origin) are
  normalized on the SQL side.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a catalog query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, tags=tags, doc=doc)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _load_all() -> None:
    # Import side effects populate REGISTRY.
    from . import cdc_queries  # noqa: F401
    from . import coverage_queries  # noqa: F401
    from . import curation_queries  # noqa: F401
    from . import eval_queries  # noqa: F401
    from . import extra_queries  # noqa: F401
    from . import llm_queries  # noqa: F401
    from . import relational_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import window_queries  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
