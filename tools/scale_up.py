#!/usr/bin/env python
"""Synthesize an N-x scale factor of the driver fixture tables.

The driver ships sf0.001/0.01/0.1 only; the 100x-scale claims need a
measured point beyond sf0.1 (r3 judge task 1). This tool builds a
``factor``-times-larger copy of a fixture dir by unioning key-shifted
copies — referential integrity is preserved (copy i shifts every key
family by ``i * stride``, and fact tables shift their foreign keys by
the same stride), fixed dimensions (region, nation) stay fixed, exactly
as TPC-H scaling does.

Content columns are varied per copy so content-addressed operators see
a genuinely larger problem, not ``factor`` exact duplicates:

- ``documents.text``: every token gets a per-copy prefix (``c3x…``) —
  all shingles/minhashes/simhashes differ across copies, so dedup
  workloads scale linearly instead of quadratically exploding on
  artificial full-corpus duplicate groups;
- ``embeddings.embedding``: rotated by ``i`` positions — norm-preserving,
  direction-changing, so ANN work scales with real, distinct vectors.

Output is written with several files per table so Spark's split
planning parallelizes the scans the way a real multi-file dataset
would.

Usage:
    python tools/scale_up.py --src /root/testdata/sf0.1 \
        --out /tmp/sfx1 --factor 10
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sdg_big_data_spark.session import get_spark  # noqa: E402
from sdg_big_data_spark.sources.readers import read_table  # noqa: E402

# Key stride must exceed any key value at any plausible factor.
STRIDE = 1_000_000_000

# key columns to shift per table (foreign keys shift with their family
# because every copy is a self-contained sub-universe: copy i's lineitem
# only references copy i's orders/parts/suppliers)
KEY_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id", "event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ("region", "nation")


def _copy(df: DataFrame, table: str, i: int) -> DataFrame:
    out = df
    for k in KEY_SHIFTS.get(table, []):
        if k in out.columns:
            out = out.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
    if table == "documents" and i > 0 and "text" in out.columns:
        tag = F.lit(f"c{i}x")
        out = out.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), r"\s+"), lambda t: F.concat(tag, t)
                ),
            ),
        )
    if table == "embeddings" and i > 0 and "embedding" in out.columns:
        # rotate by i positions: norm-preserving, direction-changing
        n = F.size("embedding")
        r = F.lit(i) % n
        out = out.withColumn(
            "embedding",
            F.when(r == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), r + 1, n - r),
                    F.slice(F.col("embedding"), 1, r),
                )
            ),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--files-per-copy", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="scale-up")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    tables = [
        p[: -len(".parquet")]
        for p in sorted(os.listdir(args.src))
        if p.endswith(".parquet")
    ]
    for t in tables:
        src_df = read_table(spark, args.src, t)
        dst = os.path.join(args.out, f"{t}.parquet")
        if t in FIXED_DIMS:
            src_df.write.mode("overwrite").parquet(dst)
            print(f"{t}: fixed dim, copied once")
            continue
        for i in range(args.factor):
            _copy(src_df, t, i).repartition(args.files_per_copy).write.mode(
                "overwrite" if i == 0 else "append"
            ).parquet(dst)
        print(f"{t}: x{args.factor} written")
    spark.stop()


if __name__ == "__main__":
    main()
