"""Unit tests for the flavor-proof epoch helpers (the round-2
TIMESTAMP_NTZ regression's permanent fix): identical epochs whether a
column arrives as TIMESTAMP, TIMESTAMP_NTZ, or string, and the reader
normalizes NTZ away entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sdg_big_data_spark.functions.timeutil import epoch_micros, epoch_seconds


def _frame(spark):
    rows = [
        ("2021-01-01 00:00:00",),
        ("2021-06-15 12:34:56",),
        ("1999-12-31 23:59:59",),
    ]
    return spark.createDataFrame(rows, schema="s string")


def test_epoch_same_for_ltz_and_ntz(spark):
    df = _frame(spark).select(
        F.col("s").cast("timestamp").alias("ltz"),
        F.col("s").cast("timestamp_ntz").alias("ntz"),
    )
    out = df.select(
        epoch_seconds("ltz").alias("a"),
        epoch_seconds("ntz").alias("b"),
        epoch_micros("ltz").alias("am"),
        epoch_micros("ntz").alias("bm"),
    ).collect()
    for r in out:
        assert r["a"] == r["b"]
        assert r["am"] == r["bm"]
        assert r["am"] == r["a"] * 1_000_000


def test_epoch_known_value(spark):
    # 2021-01-01T00:00:00Z == 1609459200 under the enforced-UTC session
    df = _frame(spark).limit(1).select(F.col("s").cast("timestamp_ntz").alias("t"))
    r = df.select(epoch_seconds("t").alias("e")).collect()[0]
    assert r["e"] == 1609459200


def test_cast_ntz_to_bigint_directly_still_fails(spark):
    """The raw cast the round-2 regression used must STILL be an analysis
    error in Spark — proving the helpers are load-bearing, not vestigial."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    df = _frame(spark).select(F.col("s").cast("timestamp_ntz").alias("t"))
    with pytest.raises(AnalysisException):
        df.select(F.col("t").cast("long")).collect()


def test_read_table_leaves_no_ntz(spark, sf_dir):
    from sdg_big_data_spark.sources.readers import read_table

    for name in ("events", "orders", "lineitem"):
        df = read_table(spark, sf_dir, name)
        assert all(dt != "timestamp_ntz" for _, dt in df.dtypes), name
