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

This tool renders every catalog query's executed plan at sf0.001 and
counts HOF call sites, so the class of bug is visible per round instead
of rediscovered by profiling:

    python tools/hof_audit.py            # writes HOF_AUDIT.json

Interpretation guide (reflected in COVERAGE.md): entries in the text /
dedup / similarity / multimodal families operate ON array columns —
their HOF sites are the workload. A NEW site appearing in a scan-heavy
relational/window/aggregation plan is the smell worth a decomposition
probe (tools pattern: time each stage separately, then check whether
the array is dimension-sized and can become literals).
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


def main() -> None:
    spark = get_spark(app_name="hof-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    qs = catalog.queries()
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — record and continue
            report[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            continue
        hits = _HOF.findall(plan)
        if hits:
            counts: dict[str, int] = {}
            for h in hits:
                counts[h] = counts.get(h, 0) + 1
            report[name] = {"hof_sites": sum(counts.values()), "by_fn": counts}
    out = {
        "sf_dir": SF_DIR,
        "queries_with_hofs": len(report),
        "queries_total": len(qs),
        "report": dict(sorted(report.items())),
    }
    Path(__file__).resolve().parent.parent.joinpath("HOF_AUDIT.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(
        f"{len(report)}/{len(qs)} catalog plans contain interpreted HOF "
        "sites -> HOF_AUDIT.json"
    )


if __name__ == "__main__":
    main()
