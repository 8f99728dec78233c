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


def close_check(con, spark_src: str, oracle_sql: str, rtol: float = 1e-6):
    """Fallback for hash mismatches on float-bearing results: at scale,
    a sum over tens of millions of doubles legitimately drifts by
    ~n*eps relative between engines (different reduction orders), which
    a fixed 9-decimal rounding cannot absorb once the magnitude passes
    ~1e9.  Pull both sides (bounded — caller checks row count), align
    rows by sorting on every column, and compare float columns with a
    relative tolerance while all other columns must match exactly.
    Returns (close: bool, max_rel_err: float)."""
    import numpy as np

    a = con.execute(spark_src).df()
    b = con.execute(oracle_sql).df()
    b = b[[c for c in a.columns]] if set(a.columns) == set(b.columns) else b
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False, float("inf")
    a = a.sort_values(list(a.columns), ignore_index=True)
    b = b.sort_values(list(b.columns), ignore_index=True)
    max_rel = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            x = av.astype(float).to_numpy()
            y = bv.astype(float).to_numpy()
            both_nan = np.isnan(x) & np.isnan(y)
            x, y = x[~both_nan], y[~both_nan]
            if not np.allclose(x, y, rtol=rtol, atol=1e-12, equal_nan=False):
                return False, float("inf")
            denom = np.maximum(np.abs(x), np.abs(y))
            nz = denom > 0
            if nz.any():
                max_rel = max(max_rel, float(np.max(np.abs(x - y)[nz] / denom[nz])))
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                return False, float("inf")
    return True, max_rel


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
        # parquet handoff, not toPandas: a 100x result can be tens of
        # millions of rows — spill it and let DuckDB scan the files, so
        # nothing result-sized ever materializes on the Python driver
        out = f"/tmp/oracle_at_scale/{name}"
        sdf.write.mode("overwrite").parquet(out)
        t_spark = round(time.perf_counter() - t0, 2)
        # identical canonicalization on both sides; column order fixed
        # by sorting names so SELECT * ordering differences are moot
        order = ", ".join(f'"{c}"' for c in sorted(sdf.columns))
        spark_src = f"SELECT {order} FROM read_parquet('{out}/*.parquet')"
        t1 = time.perf_counter()
        sn, sh = canon_hash(con, spark_src, "s")
        on, oh = canon_hash(con, f"SELECT {order} FROM ({oracles[name]}) o", "o")
        t_oracle = round(time.perf_counter() - t1, 2)
        ok = (sn == on) and (sh == oh)
        report[name] = {
            "rows": sn, "oracle_rows": on, "hash_match": bool(ok),
            "spark_sec": t_spark, "oracle_sec": t_oracle,
        }
        if not ok and sn == on and sn <= 2_000_000:
            close, max_rel = close_check(con, spark_src, oracles[name])
            report[name]["close_match"] = bool(close)
            if close:
                report[name]["max_rel_err"] = max_rel
            ok = close
        if not ok:
            failures.append(name)
        print(json.dumps({name: report[name]}), flush=True)
    print(json.dumps({
        "data_dir": data_dir, "checked": len(report),
        "failures": failures,
    }))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
