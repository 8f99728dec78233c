"""Streaming drift monitor: per-micro-batch chi-square vs the batch
gate (stream-batch parity), retry idempotence, and the alert flag."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sdg_big_data_spark.streaming.monitor import (
    drift_monitor_batch,
    streaming_drift_monitor,
)


def _ref(spark):
    # reference mix: a x6, b x3, c x1
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    return spark.createDataFrame(rows, "cat string")


def test_stream_matches_batch_gate(spark, tmp_path):
    from sdg_big_data_spark.operators.quality import chi2_categorical_drift

    ref = _ref(spark)
    t0 = dt.datetime(2021, 1, 1)
    batch_rows = [(1, t0, "a")] * 2 + [(2, t0, "b")] * 5 + [(3, t0, "d")] * 3
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    bdf = spark.createDataFrame(batch_rows, "id long, ts timestamp, cat string")
    bdf.coalesce(1).write.mode("overwrite").parquet(src)

    q = streaming_drift_monitor(
        spark.readStream.schema("id long, ts timestamp, cat string").parquet(src),
        ref,
        "cat",
        out,
        ckpt,
        alert_chi2=5.0,
    )
    q.awaitTermination()

    got = {
        r["category"]: r
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["category"]: r
        for r in chi2_categorical_drift(ref, bdf, "cat").collect()
    }
    assert set(got) == set(want)  # categories from BOTH sides survive
    for c in want:
        assert got[c]["n_ref"] == want[c]["n_ref"]
        assert got[c]["n_cur"] == want[c]["n_cur"]
        assert got[c]["chi2_term"] == want[c]["chi2_term"]
    # total = sum of terms, alert flag consistent with the threshold
    tot = round(sum(r["chi2_term"] for r in want.values()), 6)
    for r in got.values():
        assert abs(r["chi2_total"] - tot) < 1e-6
        assert r["alert"] == (tot > 5.0)


def test_batch_retry_is_idempotent(spark, tmp_path):
    ref = _ref(spark)
    out = str(tmp_path / "out")
    b = spark.createDataFrame([("a",)] * 4 + [("b",)] * 1, "cat string")
    drift_monitor_batch(b, 0, ref, "cat", out)
    first = sorted(map(tuple, spark.read.parquet(out).collect()))
    drift_monitor_batch(b, 0, ref, "cat", out)  # foreachBatch retry
    second = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert first == second
    # a LATER batch appends its own partition without touching batch 0
    b1 = spark.createDataFrame([("c",)] * 5, "cat string")
    drift_monitor_batch(b1, 1, ref, "cat", out)
    ids = {r["batch_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {0, 1}


def test_no_drift_scores_near_zero(spark, tmp_path):
    ref = _ref(spark)
    out = str(tmp_path / "out")
    # current mix proportional to the reference -> tiny chi2 (only the
    # Laplace smoothing perturbs expected counts)
    cur = spark.createDataFrame(
        [("a",)] * 12 + [("b",)] * 6 + [("c",)] * 2, "cat string"
    )
    drift_monitor_batch(cur, 0, ref, "cat", out, alert_chi2=1.0)
    rows = spark.read.parquet(out).collect()
    assert all(not r["alert"] for r in rows)
    assert rows[0]["chi2_total"] < 0.2


def test_psi_stream_matches_batch_gate(spark, tmp_path):
    """streaming_psi_monitor scores each micro-batch with the EXACT
    batch psi_drift gate (stream-batch parity), carries the total and
    the alert flag."""
    from sdg_big_data_spark.operators.quality import psi_drift
    from sdg_big_data_spark.streaming.monitor import streaming_psi_monitor

    ref = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    )
    t0 = dt.datetime(2021, 1, 1)
    batch_rows = [(i, t0, float(60 + i % 50)) for i in range(80)]
    src = str(tmp_path / "psrc")
    out = str(tmp_path / "pout")
    ckpt = str(tmp_path / "pckpt")
    bdf = spark.createDataFrame(batch_rows, "id long, ts timestamp, v double")
    bdf.coalesce(1).write.mode("overwrite").parquet(src)

    q = streaming_psi_monitor(
        spark.readStream.schema("id long, ts timestamp, v double").parquet(src),
        ref,
        "v",
        out,
        ckpt,
        alert_psi=0.25,
    )
    q.awaitTermination()

    got = {r["bin"]: r for r in spark.read.parquet(out).collect()}
    want = {r["bin"]: r for r in psi_drift(ref, bdf, "v").collect()}
    assert set(got) == set(want)
    for b in want:
        assert got[b]["n_ref"] == want[b]["n_ref"]
        assert got[b]["n_cur"] == want[b]["n_cur"]
        assert got[b]["psi_term"] == want[b]["psi_term"]
    tot = round(sum(r["psi_term"] for r in want.values()), 6)
    for r in got.values():
        assert abs(r["psi_total"] - tot) < 1e-6
        # shifted-right batch vs uniform ref must page at 0.25
        assert r["alert"] is True


def test_psi_monitor_batch_retry_idempotent(spark, tmp_path):
    """Re-running the same batch id (foreachBatch retry) overwrites its
    own partition only — the sink state is identical after the rerun."""
    from sdg_big_data_spark.streaming.monitor import psi_monitor_batch

    ref = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    b0 = spark.createDataFrame([(float(i % 10),) for i in range(30)], "v double")
    out = str(tmp_path / "ridem")
    psi_monitor_batch(b0, 0, ref, "v", out)
    first = sorted(map(tuple, spark.read.parquet(out).collect()))
    psi_monitor_batch(b0, 0, ref, "v", out)  # retry
    again = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert first == again


def test_psi_reference_model_releases_everything(spark):
    """The model pass must leave NOTHING persisted behind — the first
    monitor form leaked one rank localCheckpoint + cache registration
    per micro-batch on a continuous stream (never swept by any scope)."""
    from sdg_big_data_spark.cachescope import live_cache_count
    from sdg_big_data_spark.operators.quality import psi_reference_model

    ref = spark.range(0, 2000).selectExpr("cast(id % 97 as double) as v")
    jsc = spark.sparkContext._jsc
    caches0 = live_cache_count()
    rdds0 = set(jsc.getPersistentRDDs().keySet().toArray())
    edges, hist = psi_reference_model(ref, "v")
    assert len(edges) == 9 and sum(c for _, c in hist) == 2000
    assert live_cache_count() == caches0
    assert set(jsc.getPersistentRDDs().keySet().toArray()) <= rdds0


_SUITE = [
    ("completeness", "v", 1.0),
    ("min", "v", 0),
    ("row_count", 1, 100),
]


def test_constraint_stream_matches_batch_gate(spark, tmp_path):
    from sdg_big_data_spark.operators.quality import constraint_suite
    from sdg_big_data_spark.streaming.monitor import (
        streaming_constraint_monitor,
    )

    rows = [(1, 5.0), (2, -1.0), (3, None)]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    bdf = spark.createDataFrame(rows, "id long, v double")
    bdf.coalesce(1).write.mode("overwrite").parquet(src)

    q = streaming_constraint_monitor(
        spark.readStream.schema("id long, v double").parquet(src),
        _SUITE, out, ckpt,
    )
    q.awaitTermination(120)

    got = {
        r["constraint"]: r for r in spark.read.parquet(out).collect()
    }
    want = {
        r["constraint"]: r
        for r in constraint_suite(bdf, _SUITE).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["metric"] == want[k]["metric"]
        assert got[k]["passed"] == want[k]["passed"]
    # completeness and min both fail -> batch-level gate trips
    assert all(r["all_passed"] == 0 for r in got.values())


def test_constraint_monitor_batch_retry_idempotent(spark, tmp_path):
    from sdg_big_data_spark.streaming.monitor import constraint_monitor_batch

    out = str(tmp_path / "out")
    bdf = spark.createDataFrame([(1, 2.0)], "id long, v double")
    constraint_monitor_batch(bdf, 7, _SUITE, out)
    constraint_monitor_batch(bdf, 7, _SUITE, out)  # retry, same id
    res = spark.read.parquet(out)
    assert res.count() == len(_SUITE)
    assert set(r["batch_id"] for r in res.collect()) == {7}
    assert all(r["all_passed"] == 1 for r in res.collect())
