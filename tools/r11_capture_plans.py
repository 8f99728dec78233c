#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named catalog queries into
plans/r11/<query>_<suffix>.txt — the before/after evidence files for the
round-11 optimization record.

Run: python tools/r11_capture_plans.py <suffix> <query> [<query> ...]
     python tools/r11_capture_plans.py <suffix> --top N   (N most expensive
     queries by the latest BENCH_FULL.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sdg_big_data_spark.plans import catalog  # noqa: E402
from sdg_big_data_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.1"
OUT = REPO / "plans" / "r11"


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    qs = catalog.queries()
    if args and args[0] == "--top":
        n = int(args[1])
        bench = json.loads((REPO / "BENCH_FULL.json").read_text())
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names = [k for k, _ in ranked[:n]]
        names += [q for q in qs if q not in bench["queries"]]
    else:
        names = args
    unknown = [q for q in names if q not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="r11-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        (OUT / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
