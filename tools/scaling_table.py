#!/usr/bin/env python
"""Render the measured scale-up table for COVERAGE.md from two bench
JSON records (the sf0.1 anchor and a scaled fixture run produced by
``tools/scale_up.py`` + ``bench.py``).

Groups catalog queries into operator families by name prefix and
reports per-family wall-time totals and the scaling ratio. A ratio
near the data factor means work scales linearly with input; well below
it means the query is overhead-dominated at this size (both are
healthy); far ABOVE it flags super-linear work — the thing the 100x
design claims say cannot happen.

Usage:
    python tools/scaling_table.py /tmp/bench_cg.json /tmp/bench_sfx1.json 10
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

FAMILIES = [
    ("TPC-H aggs/joins", ("a1", "a2", "a3", "a4", "a5", "a6", "a7", "a8",
                          "a9", "a10", "a11", "a12", "a13", "a14", "a15",
                          "tpch", "j2", "j3", "j4", "j5", "j7", "j8", "u1",
                          "u2", "u3", "o2", "o4", "o_", "p_", "p14")),
    ("analytics extras", ("a_", "dq_", "w1", "w2", "w3", "w4", "w5", "w6",
                          "w7", "w8", "w_", "f_datetime")),
    ("joins beyond ref", ("j_",)),
    ("sampling", ("r1", "r2", "r3", "r4", "r5", "r6", "r7")),
    ("dedup", ("d_",)),
    ("embeddings/ANN", ("e_", "sim_")),
    ("text/quality", ("t_", "f7", "f8", "f_string", "f_json", "f_array")),
    ("GPS/spatial", ("sp_", "f1", "f2", "f3", "f4", "f5", "g_sessionize")),
    ("graph/sequence", ("g_",)),
    ("model scoring", ("f6", "m_")),
    ("evaluation", ("ev_",)),
    ("CDC/incremental", ("s_", "s5", "inc_")),
]


def family(name: str) -> str:
    for fam, prefixes in FAMILIES:
        if any(name.startswith(p) for p in prefixes):
            return fam
    return "other"


def main() -> None:
    base_p, scaled_p, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base = json.load(open(base_p))["queries"]
    scaled = json.load(open(scaled_p))["queries"]
    fam_base: dict[str, float] = defaultdict(float)
    fam_scaled: dict[str, float] = defaultdict(float)
    fam_n: dict[str, int] = defaultdict(int)
    worst: dict[str, tuple[str, float]] = {}
    for name, t in base.items():
        if name not in scaled:
            continue
        f = family(name)
        fam_base[f] += t
        fam_scaled[f] += scaled[name]
        fam_n[f] += 1
        r = scaled[name] / t if t else float("inf")
        if f not in worst or r > worst[f][1]:
            worst[f] = (name, r)
    print(f"| family | queries | sf0.1 total (s) | {factor:g}x total (s) "
          f"| ratio | worst query (ratio) |")
    print("|---|---|---|---|---|---|")
    tb = ts = 0.0
    for fam, _ in FAMILIES + [("other", ())]:
        if fam not in fam_base:
            continue
        b, s = fam_base[fam], fam_scaled[fam]
        tb += b
        ts += s
        wq, wr = worst[fam]
        print(f"| {fam} | {fam_n[fam]} | {b:.1f} | {s:.1f} | {s / b:.1f}x "
              f"| {wq} ({wr:.1f}x) |")
    print(f"| **all** | {sum(fam_n.values())} | {tb:.1f} | {ts:.1f} "
          f"| {ts / tb:.1f}x | |")


if __name__ == "__main__":
    main()
