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
import re as _re
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
    from . import labor_queries  # noqa: F401
    from . import llm_queries  # noqa: F401
    from . import mobility_queries  # noqa: F401
    from . import relational_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import window_queries  # noqa: F401


# Package dirs whose module files count as hash-relevant dependencies of
# a query block that references their stem; infra modules (catalog
# itself, session, cachescope) are excluded — every block references
# them, so including them would poison the whole catalog on any
# ordering-logic edit and defeat the changed-first tier.
_HASH_SRC_DIRS = ("operators", "streaming", "functions", "sources",
                  "pipelines", "plans")
_HASH_EXCLUDE_STEMS = {"catalog", "session", "cachescope", "__init__"}


def _extract_block(text: str, name: str) -> str | None:
    """The ``@register(...) def name(...)`` block of ``name`` in a plans
    module, extracted TEXTUALLY (decorator incl. the inline oracle SQL +
    the fn body, ending at the next column-0 statement) so the identical
    extraction runs against a historical tree via ``git show`` without
    importing it."""
    m = _re.search(rf"^def {_re.escape(name)}\(", text, _re.M)
    if not m:
        return None
    dec = text.rfind("\n@register(", 0, m.start())
    start = dec + 1 if dec != -1 else m.start()
    tail = text[m.end():]
    # block ends at the next top-level STATEMENT — letter/underscore/
    # decorator/comment at column 0, anchored on an EXPLICIT newline: a
    # multiline ^-anchor also matches the tail's position 0 (the rest of
    # the def line) and a bare ^\S additionally stops at the column-0
    # ``)`` closing a multi-line signature — both silently dropped the
    # whole body from the hash (caught by the t_tfidf probe: its r8
    # body rewrite hashed identical).
    e = _re.search(r"\n[A-Za-z_@#]", tail)
    end = m.end() + (e.start() + 1 if e else len(tail))
    return text[start:end]


def _top_level_blocks(text: str) -> dict[str, str]:
    """Every top-level ``def name(...)`` / ``NAME = ...`` /
    ``_name = ...`` block of a module, by identifier (block runs to the
    next column-0 statement)."""
    blocks: dict[str, str] = {}
    for hm in _re.finditer(
        r"^(?:def (\w+)\(|(_?[A-Z][A-Z0-9_]+|_[a-z]\w*) *=)", text, _re.M
    ):
        name = hm.group(1) or hm.group(2)
        tail = text[hm.end():]
        # see _extract_block: explicit-newline anchor, no column-0 ``)``
        e = _re.search(r"\n[A-Za-z_@#]", tail)
        blocks[name] = text[
            hm.start(): hm.end() + (e.start() + 1 if e else len(tail))
        ]
    return blocks


_STR_LIT = _re.compile(
    r"""(?s)([A-Za-z]{0,2})("{3}|'{3}|"|')((?:\\.|(?!\2).)*?)\2"""
)


def _code_refs(text: str) -> set[str]:
    """Identifiers referenced by CODE in ``text``: comments and string
    literals are stripped first (register ``doc=`` prose and docstrings
    name operators they do not depend on — scanning raw text connected
    102 defs to a minhash query and made every hash flip on any edit),
    except f-string interpolations, whose ``{...}`` contents are real
    references (generated-SQL oracles interpolate their fragments)."""
    parts: list[str] = []
    pos = 0
    for m in _STR_LIT.finditer(text):
        parts.append(text[pos: m.start()])
        if "f" in m.group(1).lower():
            parts.extend(_re.findall(r"\{([^{}]+)", m.group(3)))
        pos = m.end()
    parts.append(text[pos:])
    code = "\n".join(parts)
    code = _re.sub(r"#[^\n]*", "", code)
    return set(_re.findall(r"\w+", code))


def _source_hashes_from_files(files: dict[str, str]) -> dict[str, str]:
    """name -> content hash for every ``@register``-ed query found in
    ``files`` (repo-relative ``sdg_big_data_spark/...`` path -> text).

    The hash covers the query's register block (decorator, inline
    oracle SQL, fn body) plus the TRANSITIVE CLOSURE of every top-level
    package definition (function or constant, any module under
    ``_HASH_SRC_DIRS``) the block references by name — each included
    def's block is itself scanned, so an edit to a helper two calls
    deep (e.g. ``simhash_band_pairs`` under ``payload_near_dup_pairs``)
    still flips the hash of the queries whose behavior it carries.
    Def-level granularity on purpose: hashing whole referenced MODULES
    marked 82/211 queries changed after a normal round (any edit to
    operators/relational.py would poison every aggregate query), which
    overflows the driver's ~50-query sample and defeats the
    changed-first tier. Name matching is textual (same-named defs in
    two modules both count — conservative); dynamic dispatch the text
    doesn't name is the accepted blind spot. Purely textual on purpose:
    tools/query_hashes.py replays the identical extraction on the tree
    of an earlier round from git history without importing old code."""
    import hashlib

    # identifier -> [block, ...] in SORTED file order: same-named defs
    # in two modules (def run in every pipeline) hash in a stable
    # sequence regardless of how the caller enumerated files (glob vs
    # git ls-tree order differed — every query reaching `run` flipped)
    defs: dict[str, list[str]] = {}
    for path, text in sorted(files.items()):
        parts = path.split("/")
        if len(parts) >= 2 and parts[-2] in _HASH_SRC_DIRS:
            if parts[-1][:-3] in _HASH_EXCLUDE_STEMS:
                continue
            for ident, block in _top_level_blocks(text).items():
                defs.setdefault(ident, []).append(block)
    # pre-scan each def block's outbound references once
    refs: dict[str, set[str]] = {}
    for ident, blocks in defs.items():
        out_names: set[str] = set()
        for b in blocks:
            out_names |= _code_refs(b) & defs.keys()
        out_names.discard(ident)
        refs[ident] = out_names
    out: dict[str, str] = {}
    for path, text in sorted(files.items()):
        if not path.endswith("_queries.py"):
            continue
        for rm in _re.finditer(r'@register\(\s*\n?\s*"([^"]+)"', text):
            name = rm.group(1)
            block = _extract_block(text, name)
            if block is None:
                continue
            reach: set[str] = set()
            work = list((_code_refs(block) & defs.keys()) - {name})
            while work:
                ident = work.pop()
                if ident in reach:
                    continue
                reach.add(ident)
                work.extend(refs[ident] - reach)
            h = hashlib.sha256(block.encode())
            for ident in sorted(reach):
                for b in defs[ident]:
                    h.update(b.encode())
            out[name] = h.hexdigest()[:16]
    return out


def current_query_hashes() -> dict[str, str]:
    """:func:`_source_hashes_from_files` over the on-disk tree."""
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1]
    files = {
        f"sdg_big_data_spark/{p.relative_to(pkg)}": p.read_text()
        for d in _HASH_SRC_DIRS
        for p in (pkg / d).glob("*.py")
    }
    return _source_hashes_from_files(files)


def _driver_staleness() -> dict[str, tuple[int, int]]:
    """Sort key per catalog query from the committed driver records:
    ``(last_status_rank, last_sampled_round)`` where rank 0 = the last
    driver sample was NOT a pass (stale error/mismatch — re-verify
    first), rank 1 = passing but the query's SOURCE HASH changed since
    the round that sampled it (its green status describes old code —
    re-verify before rotating through untouched queries; r8 judge ask),
    rank 2 = never sampled, rank 3 = passing and unchanged (oldest
    round first). Hashes live in ``QUERY_HASHES.json`` (regenerated by
    ``tools/query_hashes.py`` at round close); a sampled query with no
    recorded hash counts as changed — unknown provenance re-verifies.
    Derived by scanning ``CORRECTNESS_r*.json`` at the repo root —
    generated ordering, never hand-kept, so driver freshness keeps
    rotating through the catalog as rounds land. Records missing (fresh
    clone without them, or the driver running from elsewhere) → empty
    dict and the registry order stands; purely an ordering hint —
    every entry is present either way, and local tests always run all
    of them."""
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
    recorded: dict[str, dict] = {}
    try:
        recorded = json.loads((root / "QUERY_HASHES.json").read_text())
    except (OSError, ValueError):
        pass
    current: dict[str, str] = {}
    if recorded:
        try:
            current = current_query_hashes()
        except Exception:  # noqa: BLE001 — ordering is a HINT: any
            # hashing failure (unreadable file, encoding, regex
            # pathology) must degrade to "no changed-tier" and never
            # break queries(), the driver's entry point
            recorded = {}
    return _staleness_ranks(last, recorded, current)


def _staleness_ranks(
    last: dict[str, tuple[int, bool]],
    recorded: dict[str, dict],
    current: dict[str, str],
) -> dict[str, tuple[int, int]]:
    """Pure ranking step of :func:`_driver_staleness`, split out so the
    degraded inputs (``recorded={}`` after a hashing failure, or a
    sampled name the seeder left unrecorded) are directly testable."""
    out: dict[str, tuple[int, int]] = {}
    for name, (rnd, ok) in last.items():
        if not ok:
            rank = 0
        else:
            rec = recorded.get(name)
            unchanged = (
                rec is not None
                and rec.get("hash") == current.get(name)
                and current.get(name) is not None
            )
            rank = 3 if unchanged else 1
        if rank == 1:
            # most recently CHANGED first: the seed records the round
            # whose tree first carried the current source; entries
            # stamped at round close and edited later imply a change in
            # some round after the stamp — approximate with rnd + 1
            # (same relative order, exact value refined on re-seed)
            # rec can be None here: hashing failure set recorded={}, or
            # the seeder intentionally left this name unrecorded ("ranks
            # as changed") — both must rank, never crash queries()
            out[name] = (1, -int((rec or {}).get("changed_in", rnd + 1)))
        else:
            out[name] = (rank, rnd)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    staleness = _driver_staleness()
    names = sorted(
        REGISTRY,
        key=lambda n: (*staleness.get(n, (2, 0)), n),
    )
    return {name: REGISTRY[name].fn for name in names}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
