#!/usr/bin/env python
"""Higher-order-function audit over every catalog plan.

Spark evaluates array higher-order functions (``filter`` / ``transform``
/ ``aggregate`` / ``zip_with`` / ``exists`` / ``forall``) INTERPRETED —
outside whole-stage codegen. That is fine (and unavoidable) when the
array IS the data, e.g. a token array per document; it is a silent
10-50x tax when the array is a dimension-sized constant that could ride
as literal codegen expressions instead. ``dq_psi_drift`` shipped with
exactly that bug: ONE ``size(filter(edges, e -> e < v))`` over a
broadcast 9-element array was 81 of its 96 s at the 100x universe;
rewritten to unrolled literal comparisons it fell to 7.2 s.

Worse, the OPTIMIZER can multiply interpreted sites the source never
wrote: ``PushDownPredicates`` substitutes let-bound aliases into Filter
nodes (the curation gates evaluated their tokenizer 25x per row before
the pushdown_barrier), ``CollapseProject`` inlines multi-referenced
aliases, and ``InferFiltersFromGenerate`` plants extra copies under
explodes. So the audit counts each query's HOF sites THREE ways:

- ``analyzed``   — what the source wrote (pre-optimization plan);
- ``optimized``  — what will actually run, post-Catalyst;
- ``in_filter``  — optimized sites sitting inside Filter nodes, the
  signature of pushdown re-inlining.

``dup_factor`` = optimized / analyzed, counted on RAW ``lambdafunction(``
occurrences — the named-function regex undercounts deeply-nested lambdas
(its argument matcher only spans one paren level), which manufactured
fake 2x "duplication" on the PQ plans in the first plan-diff sweep. A
factor > 1, or any ``in_filter`` count on an expensive lambda, is the
smell worth a decomposition probe; a factor of 1 with sites on token
arrays is the workload, not a bug. Known benign inflation: a cached
subtree (InMemoryRelation) renders its PHYSICAL plan inside the
optimized string, so a query whose cache body contains lambdas can show
a small spurious uplift (d_semantic_dedup: 12 -> 14, both branches
execute once).

    python tools/hof_audit.py            # writes HOF_AUDIT.json
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sdg_big_data_spark.plans import catalog  # noqa: E402
from sdg_big_data_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Expression-level markers of interpreted array lambdas in plan strings:
# the nearest function name whose argument list contains a
# lambdafunction(...) — e.g. ``transform(toks#12, lambdafunction(...``.
_HOF = re.compile(r"\b(\w+)\((?:[^()]|\([^()]*\))*?lambdafunction")


def _strip_initial_plans(plan: str) -> str:
    """Drop every ``== Initial Plan ==`` section from an AQE render.

    A MATERIALIZED InMemoryRelation prints its cachedPlan as
    ``AdaptiveSparkPlan isFinalPlan=true`` with BOTH the Final and the
    Initial plan bodies — the same single-execution build rendered
    twice — so raw ``lambdafunction(`` counts double for every query
    reading a cached/pinned subtree (all 20 tokenize-once consumers
    flagged spuriously the first time the audit ran after the shared
    corpus materialized before plan rendering). Only the Final body
    describes work that runs."""
    out: list[str] = []
    skip_indent: int | None = None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip())
        if skip_indent is not None:
            if line.strip() and indent <= skip_indent:
                skip_indent = None
            else:
                continue
        if "== Initial Plan ==" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def _counts(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for h in _HOF.findall(plan):
        counts[h] = counts.get(h, 0) + 1
    return counts


def _filter_sites(plan: str) -> int:
    n = 0
    for line in plan.splitlines():
        if line.lstrip("+-: ").startswith("Filter"):
            n += len(_HOF.findall(line))
    return n


def main() -> None:
    spark = get_spark(app_name="hof-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    from sdg_big_data_spark.cachescope import cache_scope

    qs = catalog.queries()
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        # Each plan is built in its own cache scope: a cache left live by
        # an EARLIER query's plan construction changes how a later plan
        # renders (InMemoryRelation substitution), which made the counts
        # depend on catalog ordering — the audit must measure each query
        # as a cold session would run it.
        try:
            with cache_scope():
                qe = fn(spark, SF_DIR)._jdf.queryExecution()
                an_plan = qe.analyzed().toString()
                opt_plan = qe.optimizedPlan().toString()
        except Exception as e:  # noqa: BLE001 — record and continue
            report[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            continue
        opt_plan = _strip_initial_plans(opt_plan)
        n_an = an_plan.count("lambdafunction(")
        n_opt = opt_plan.count("lambdafunction(")
        if n_an or n_opt:
            report[name] = {
                "analyzed_sites": n_an,
                "optimized_sites": n_opt,
                "dup_factor": round(n_opt / n_an, 2) if n_an else None,
                "in_filter": _filter_sites(opt_plan),
                "by_fn_optimized": _counts(opt_plan),
            }
    dup = [
        n for n, r in report.items()
        if "error" not in r
        and (r["in_filter"] or (r["dup_factor"] or 0) > 1.0)
    ]
    out = {
        "sf_dir": SF_DIR,
        "queries_with_hofs": len(report),
        "queries_total": len(qs),
        "duplication_suspects": sorted(dup),
        "report": dict(sorted(report.items())),
    }
    Path(__file__).resolve().parent.parent.joinpath("HOF_AUDIT.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(
        f"{len(report)}/{len(qs)} catalog plans contain interpreted HOF "
        f"sites; {len(dup)} with optimizer duplication (factor>1 or "
        "in-Filter sites) -> HOF_AUDIT.json"
    )
    for n in sorted(dup):
        r = report[n]
        print(
            f"  {n}: analyzed={r['analyzed_sites']} "
            f"optimized={r['optimized_sites']} in_filter={r['in_filter']}"
        )


if __name__ == "__main__":
    main()
