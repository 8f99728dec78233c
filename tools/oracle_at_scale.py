#!/usr/bin/env python
"""Oracle parity at arbitrary scale — the driver's sf0.01 value-hash
check, re-run against a scaled fixture dir (e.g. the 100x universe
built by ``tools/scale_up.py``).

Correctness at test scale does not automatically survive a scale-up:
overflow (the r4 ev_* Knuth-multiply crash class), accumulation-order
float drift, sampling-threshold edge cases, and partition-coupling bugs
all appear only when ids and row counts grow.  This tool proves the
engine's answers — not merely its ability to complete — at scale:

    python tools/oracle_at_scale.py /tmp/sfx10 a1_pricing_summary ...

For each named catalog query it runs the Spark plan AND the registered
DuckDB oracle SQL on the SAME parquet dir, canonicalizes both result
sets identically (doubles rounded to 9 places, NaN sentinel, columns
sorted by name), and compares an order-insensitive 64-bit aggregate
hash computed INSIDE DuckDB (`sum(hash(cols))`) — so a multi-million-row
result never becomes a Python-side tuple sort.

Prints one JSON line per query and a summary; exit 1 on any mismatch.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_hash(con, source_sql: str, tag: str):
    """(rowcount, order-insensitive hash) of a DuckDB-visible relation,
    doubles rounded to 9 places and NaN/NULL collapsed to a sentinel."""
    cols = con.execute(f"SELECT * FROM ({source_sql}) LIMIT 0").description
    parts = []
    for name, dtype, *_ in cols:
        q = f'"{name}"'
        if dtype in ("NUMBER",):  # duckdb float/double/decimal
            parts.append(
                f"CASE WHEN {q} IS NULL OR isnan(CAST({q} AS DOUBLE)) "
                f"THEN -9.87654e300 ELSE round(CAST({q} AS DOUBLE), 9) END"
            )
        else:
            parts.append(f"CAST({q} AS VARCHAR)")
    expr = ", ".join(parts)
    n, h = con.execute(
        f"SELECT count(*), sum(hash({expr})) FROM ({source_sql}) {tag}"
    ).fetchone()
    return n, h


def main() -> int:
    data_dir = sys.argv[1]
    names = sys.argv[2:]
    import duckdb

    from sdg_big_data_spark.plans import catalog
    from sdg_big_data_spark.session import get_spark

    spark = get_spark(app_name="oracle_at_scale")
    spark.sparkContext.setLogLevel("FATAL")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(data_dir) / f"{t}.parquet"
        pat = f"{p}/**/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    qs, oracles = catalog.queries(), catalog.oracle_sql()
    if not names:
        names = [n for n in qs if n in oracles]
    failures, report = [], {}
    for name in names:
        if name not in oracles:
            report[name] = {"status": "no-oracle"}
            continue
        t0 = time.perf_counter()
        sdf = qs[name](spark, data_dir)
        pdf = sdf.toPandas()
        t_spark = round(time.perf_counter() - t0, 2)
        con.register("__spark_res", pdf)
        # identical canonicalization on both sides; column order fixed
        # by sorting names so SELECT * ordering differences are moot
        order = ", ".join(f'"{c}"' for c in sorted(pdf.columns))
        t1 = time.perf_counter()
        sn, sh = canon_hash(con, f"SELECT {order} FROM __spark_res", "s")
        on, oh = canon_hash(con, f"SELECT {order} FROM ({oracles[name]}) o", "o")
        t_oracle = round(time.perf_counter() - t1, 2)
        ok = (sn == on) and (sh == oh)
        report[name] = {
            "rows": sn, "oracle_rows": on, "hash_match": bool(ok),
            "spark_sec": t_spark, "oracle_sec": t_oracle,
        }
        if not ok:
            failures.append(name)
        print(json.dumps({name: report[name]}), flush=True)
        con.unregister("__spark_res")
    print(json.dumps({
        "data_dir": data_dir, "checked": len(report),
        "failures": failures,
    }))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
