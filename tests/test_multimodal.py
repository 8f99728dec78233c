"""Multimodal binary-column plumbing: metadata stays JVM-side, decode
stub runs through real mapInPandas with the declared schema."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1"),
        (2, "image", b"\x89PNG fake bytes 22"),
        (3, "audio", b"RIFF fake wave"),
        (4, "video", b"\x00\x00ftyp fake mp4"),
        (5, "image", None),
    ]
    return spark.createDataFrame(rows, "item_id long, modality string, payload binary")


def test_metadata_jvm_side(spark, media):
    from sdg_big_data_spark.operators.multimodal import attach_binary_metadata

    out = attach_binary_metadata(media)
    rows = {r.item_id: r for r in out.collect()}
    assert rows[1].n_bytes == len(b"\x89PNG fake bytes 1")
    assert rows[5].n_bytes is None  # null payload stays null
    # filter on metadata never decodes
    assert out.where(F.col("n_bytes") > 15).count() == 2


def test_extract_features_schema_and_determinism(spark, media):
    from sdg_big_data_spark.operators.multimodal import extract_features

    out = extract_features(media, dim=8)
    assert out.schema.simpleString() == (
        "struct<item_id:bigint,modality:string,n_bytes:int,feature:array<float>>"
    )
    a = {r.item_id: r.feature for r in out.collect()}
    b = {r.item_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert a == b  # deterministic stub
    assert all(len(v) == 8 for v in a.values())
    # distinct payloads → distinct features
    assert a[1] != a[2]


def test_unknown_modality_raises(spark):
    from sdg_big_data_spark.operators.multimodal import extract_features

    bad = spark.createDataFrame(
        [(9, "hologram", b"xx")], "item_id long, modality string, payload binary"
    )
    with pytest.raises(Exception, match="hologram"):
        extract_features(bad).collect()


def test_frame_sample_plan(spark):
    from sdg_big_data_spark.operators.multimodal import frame_sample_plan

    vids = spark.createDataFrame(
        [(1, 3.5, 30.0), (2, 0.4, 30.0)], "item_id long, duration_s double, fps double"
    )
    plan = frame_sample_plan(vids, every_s=1.0)
    counts = {r.item_id: r["cnt"] for r in plan.groupBy("item_id").agg(F.count("*").alias("cnt")).collect()}
    assert counts[1] == 3  # frames at 0,1,2
    assert counts[2] == 1  # clamped to at least one frame


def test_resize_images_plumbing(spark, media):
    from sdg_big_data_spark.operators.multimodal import resize_images

    imgs = media.where(F.col("modality") == "image")
    out = resize_images(imgs, 4, 3)
    assert out.schema.simpleString() == (
        "struct<item_id:bigint,modality:string,payload:binary,width:int,height:int>"
    )
    rows = {r.item_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 5}
    for r in rows.values():
        assert len(r.payload) == 12 and r.width == 4 and r.height == 3
    # deterministic: same input -> same bytes
    again = {r.item_id: r.payload for r in resize_images(imgs, 4, 3).collect()}
    assert all(again[i] == rows[i].payload for i in rows)
    # content-sensitive: different payloads resize to different bytes
    assert rows[1].payload != rows[2].payload


def test_resize_rejects_non_image(spark, media):
    from sdg_big_data_spark.operators.multimodal import resize_images

    with pytest.raises(Exception, match="NotImplementedError|modality"):
        resize_images(media, 4, 3).collect()


class TestPayloadNearDups:
    def test_variant_payloads_pair_up(self, spark):
        from sdg_big_data_spark.operators.multimodal import (
            payload_near_dup_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog " * 8
        rows = [
            (1, bytearray(base.encode())),
            (2, bytearray((base + " v41").encode())),   # near-dup of 1
            (3, bytearray(("completely different payload bytes " * 10).encode())),
        ]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in payload_near_dup_pairs(df, max_hamming=3).collect()
        }
        assert (1, 2) in pairs
        assert all(k == (1, 2) for k in pairs)

    def test_identical_payloads_hamming_zero(self, spark):
        from sdg_big_data_spark.operators.multimodal import (
            payload_near_dup_pairs,
        )

        blob = bytearray(b"same bytes everywhere, truly identical payload")
        df = spark.createDataFrame(
            [(10, blob), (20, blob)], "item_id long, payload binary"
        )
        out = payload_near_dup_pairs(df).collect()
        assert len(out) == 1 and out[0]["hamming"] == 0

    def test_empty_payloads_never_pair(self, spark):
        # a zero-byte payload hex-encodes to '' whose single clamped gram
        # is the empty string; the oracle filters empty grams, so two
        # empty payloads must NOT share a fingerprint here (ADVICE r8)
        from sdg_big_data_spark.operators.multimodal import (
            payload_near_dup_pairs,
        )

        rows = [
            (1, bytearray(b"")),
            (2, bytearray(b"")),
            (3, bytearray(b"real payload bytes, long enough for grams")),
        ]
        df = spark.createDataFrame(rows, "item_id long, payload binary")
        assert payload_near_dup_pairs(df).collect() == []
