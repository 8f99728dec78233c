"""IO-layer round-trips — SURVEY.md §2.1 S1-S14.

Every format the reference reads/writes (parquet, ORC, JSON, CSV with
options, partitioned layouts, single-file CSV, metastore tables, temp
views) round-trips through the engine's readers/writers with values
intact.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sdg_big_data_spark.sources import readers, writers


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5, "2024-01-01"), (2, "b", 2.5, "2024-01-02"),
         (3, "c,with,commas", 3.5, "2024-01-02"), (4, 'd "quoted"\nmultiline', 4.5, "2024-01-03")],
        schema="id long, name string, val double, date string",
    )


def _sorted_rows(df):
    return sorted([tuple(r) for r in df.select("id", "name", "val").collect()])


def test_parquet_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "pq")
    writers.write_parquet(small, p)
    back = readers.read_parquet(spark, p)
    assert _sorted_rows(back) == _sorted_rows(small)


def test_parquet_append(spark, small, tmp_path):
    p = str(tmp_path / "pq_append")
    writers.write_parquet(small, p)
    writers.write_parquet(small, p, mode="append")  # S7 append mode
    assert readers.read_parquet(spark, p).count() == 2 * small.count()


def test_orc_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "orc")
    small.write.mode("overwrite").orc(p)
    back = readers.read_orc(spark, p)
    assert _sorted_rows(back) == _sorted_rows(small)


def test_json_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "json")
    small.write.mode("overwrite").json(p)
    back = readers.read_json(spark, p)
    assert _sorted_rows(back) == _sorted_rows(small)


def test_csv_options_roundtrip(spark, small, tmp_path):
    """S4 — header/multiLine/FAILFAST options (geocode_stop_locations
    .scala:26): the multiline quoted value survives."""
    p = str(tmp_path / "csv")
    small.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(p)
    back = readers.read_csv(spark, p, multi_line=True)
    got = {r["name"] for r in back.collect()}
    assert 'd "quoted"\nmultiline' in got


def test_csv_failfast(spark, tmp_path):
    p = str(tmp_path / "bad_csv")
    os.makedirs(p)
    with open(os.path.join(p, "part.csv"), "w") as f:
        f.write("id,val\n1,2\nnot_a_number,xxx\n")
    bad = readers.read_csv(
        spark, p, schema="id int, val int", multi_line=False
    )
    with pytest.raises(Exception):
        bad.collect()


def test_partitioned_write_prunes(spark, small, tmp_path):
    """S6 — partition layout exists on disk and partition filters prune
    (the plan's file listing only touches the matching directory)."""
    p = str(tmp_path / "parts")
    writers.write_partitioned(small, p, ["date"])
    assert (tmp_path / "parts" / "date=2024-01-02").exists()
    pruned = readers.read_parquet(spark, p).where(F.col("date") == "2024-01-02")
    assert pruned.count() == 2
    plan = pruned.queryExecution if hasattr(pruned, "queryExecution") else None
    explained = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explained or "date=2024-01-02" in explained


def test_single_file_csv(spark, small, tmp_path):
    p = str(tmp_path / "single")
    writers.write_single_csv(small.select("id", "val"), p)
    files = [f for f in os.listdir(p) if f.endswith(".csv")]
    assert len(files) == 1  # exactly one part file (S9 coalesce(1))


def test_convert_format(spark, small, tmp_path):
    src, dst = str(tmp_path / "src_orc"), str(tmp_path / "dst_pq")
    small.write.mode("overwrite").orc(src)
    writers.convert_format(spark, src, dst, "orc", "parquet")
    assert _sorted_rows(readers.read_parquet(spark, dst)) == _sorted_rows(small)


def test_save_as_table_and_view(spark, small, tmp_path):
    """S12 — temp view registration + SQL/table scans (S8 saveAsTable
    uses the same writer path against a metastore; the warehouse dir is a
    static conf, so only the view form is exercised here)."""
    small.createOrReplaceTempView("small_view")
    assert spark.sql("SELECT count(*) AS n FROM small_view").collect()[0]["n"] == 4
    assert spark.table("small_view").count() == 4


def test_load_tables(spark, sf_dir):
    """S1 over the driver tables through the normalizing reader."""
    tables = readers.load_tables(spark, sf_dir, ["region", "nation", "events"])
    assert tables["region"].count() > 0
    # nanos timestamp normalized to a usable timestamp type
    assert dict(tables["events"].dtypes)["ts"].startswith("timestamp")
