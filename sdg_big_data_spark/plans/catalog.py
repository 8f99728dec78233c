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
    from . import streaming_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import window_queries  # noqa: F401


def _driver_staleness() -> dict[str, tuple[int, int]]:
    """Sort key per catalog query from the committed driver records:
    ``(last_status_rank, last_sampled_round)`` where rank 0 = the last
    driver sample was NOT a pass (stale error/mismatch — re-verify
    first), rank 1 = never sampled, rank 2 = passing (oldest round
    first). Derived by scanning ``CORRECTNESS_r*.json`` at the repo
    root — generated ordering, never hand-kept, so driver freshness
    keeps rotating through the catalog as rounds land. Records missing
    (fresh clone without them, or the driver running from elsewhere)
    → empty dict and the registry order stands; purely an ordering
    hint — every entry is present either way, and local tests always
    run all of them."""
    import json
    import re
    from pathlib import Path

    last: dict[str, tuple[int, bool]] = {}  # name -> (round, passed)
    root = Path(__file__).resolve().parents[2]
    try:
        records = sorted(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        return {}
    for path in records:
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = bool(rec.get("hash_match")) or (
                not rec.get("err")
                and rec.get("rows_match")
                and rec.get("schema_match")
            )
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                last[name] = (rnd, ok)
    out: dict[str, tuple[int, int]] = {}
    for name, (rnd, ok) in last.items():
        out[name] = (0 if not ok else 2, rnd)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    staleness = _driver_staleness()
    names = sorted(
        REGISTRY,
        key=lambda n: (*staleness.get(n, (1, 0)), n),
    )
    return {name: REGISTRY[name].fn for name in names}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
