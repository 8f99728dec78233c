"""Stream-static enrichment joins and the idempotent foreachBatch
key-merge sink: micro-batch results must match the batch join, and
replaying input must not duplicate target keys."""

from __future__ import annotations

import datetime as dt

import pytest

from sdg_big_data_spark.streaming import enrich


@pytest.fixture(scope="module")
def ev(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "click", "geoA"),
        (2, t0 + dt.timedelta(minutes=1), "view", "geoB"),
        (3, t0 + dt.timedelta(minutes=2), "click", "geoC"),  # geoC not in dim
    ]
    return spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, event_type string, geom_id string"
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("geoA", "metro", 1000), ("geoB", "rural", 10)],
        schema="geom_id string, kind string, pop long",
    )


def test_stream_static_enrich_matches_batch_join(spark, ev, dim, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = enrich.stream_static_enrich(stream, dim, "geom_id")
    q = (
        out.writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["event_id"], r["kind"], r["pop"]) for r in spark.read.parquet(dst).collect()
    }
    want = {
        (r["event_id"], r["kind"], r["pop"])
        for r in ev.join(dim, "geom_id", "left").collect()
    }
    assert got == want  # includes the left-retained geoC row with nulls


def test_foreach_batch_key_merge_is_idempotent(spark, ev, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "tgt")
    ev.write.mode("overwrite").parquet(src)

    # pre-seed the target with key 1 — the merge must not re-append it
    ev.where("event_id = 1").write.mode("overwrite").parquet(dst)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    enrich.foreach_batch_key_merge(
        stream, dst, ["event_id"], str(tmp_path / "ck1")
    )
    ids = sorted(r["event_id"] for r in spark.read.parquet(dst).collect())
    assert ids == [1, 2, 3]  # no duplicate for the pre-seeded key

    # replay the SAME input under a fresh checkpoint (simulated redelivery):
    # every key already exists, so nothing is appended
    stream2 = spark.readStream.schema(ev.schema).parquet(src)
    enrich.foreach_batch_key_merge(
        stream2, dst, ["event_id"], str(tmp_path / "ck2")
    )
    ids2 = sorted(r["event_id"] for r in spark.read.parquet(dst).collect())
    assert ids2 == [1, 2, 3]
