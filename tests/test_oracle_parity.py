"""Mirror of the driver's t2 gate: every catalog query's Spark result must
match its DuckDB oracle — row count, column names, and values (order
insensitive; exact after the catalog's declared rounding).
"""

from __future__ import annotations

import math

import pytest

from sdg_big_data_spark.plans import catalog


def _normalize(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        vals = []
        for k in sorted(r):
            v = r[k]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            else:
                # type-sensitive: a DuckDB Decimal vs a Spark double must
                # FAIL here (a stringifying driver harness would see
                # different value hashes even when numerically equal)
                v = (type(v).__name__, str(v))
            vals.append((k, v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def all_specs() -> list[catalog.QuerySpec]:
    catalog._load_all()
    return [s for s in catalog.REGISTRY.values() if s.sql is not None]


@pytest.mark.parametrize("spec", all_specs(), ids=lambda s: s.name)
def test_query_matches_oracle(spec, spark, ddb, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    oracle = ddb.execute(spec.sql).fetch_arrow_table().to_pylist()

    assert len(spark_rows) == len(oracle), (
        f"{spec.name}: row count {len(spark_rows)} != oracle {len(oracle)}"
    )
    if not oracle:
        return
    assert sorted(spark_rows[0].keys()) == sorted(oracle[0].keys()), (
        f"{spec.name}: columns {sorted(spark_rows[0])} != {sorted(oracle[0])}"
    )
    sn, on = _normalize(spark_rows), _normalize(oracle)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
    )


def test_no_complex_result_columns(spark, sf_dir):
    """The driver's comparison harness canonicalizes results with a pandas
    sort over every column — array/map/struct values are unhashable there,
    so the check ERRORS instead of comparing (r4: e_pq_encode, e_prototypes
    and e_quantize were recorded as failures for exactly this). Every
    catalog query must therefore emit atomic columns only; list-shaped
    results are exploded to rows instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    catalog._load_all()
    offenders = []
    for name, spec in sorted(catalog.REGISTRY.items()):
        df = spec.fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"complex-typed result columns: {offenders}"
