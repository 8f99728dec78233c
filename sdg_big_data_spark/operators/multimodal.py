"""Multimodal columns — opaque binary payloads (image/audio/video) with
typed metadata, processed through Arrow-batched pandas UDFs.

The pattern for 100 TB multimodal training data:

- payloads live in a ``binary`` column (or as object-store URIs in a
  string column with lazy fetch inside the UDF);
- typed metadata (width/height/sample_rate/duration) travels in sibling
  columns so filters/pruning stay in the JVM — NEVER decode to filter;
- decode / feature-extract / resize / frame-sample run in
  ``mapInPandas`` so one Arrow batch amortizes Python crossing costs and
  the decoder library loads once per task.

The decode step itself is STUBBED here (image/audio libraries are not in
this container): ``decode=None`` uses a deterministic fake that derives
pseudo-features from the payload bytes, keeping schema, partitioning,
batch shape, and UDF signature real and tested. Swap ``decode`` for a
PIL/libsndfile call in production — nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "item_id long, modality string, n_bytes int, feature array<float>"
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata over a binary column: size + content fingerprint.
    Filters on these never touch Python."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )


def _stub_decode(payload: bytes, modality: str, dim: int = 8) -> np.ndarray:
    """Deterministic fake feature vector from payload bytes (md5-seeded).
    Replace with a real decoder in production.

    raises NotImplementedError for modalities the stub doesn't model.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    digest = hashlib.md5(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    decode: Callable[[bytes, str], np.ndarray] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Decode + featurize binary payloads via ``mapInPandas``.

    Only (id, modality, payload) cross the Arrow boundary. Batch shape:
    one pandas frame per Arrow batch (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
    batch_rows × payload_size fits the Python worker's memory).
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    dec = decode or (lambda b, m: _stub_decode(b, m, dim))
    narrow = df.select(id_col, modality_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                dec(p if p is not None else b"", m).tolist()
                for p, m in zip(pdf[payload_col], pdf[modality_col])
            ]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].values,
                    "modality": pdf[modality_col].values,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "feature": feats,
                }
            )

    return narrow.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_s",
    fps_col: str = "fps",
    every_s: float = 1.0,
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index, derived
    ENTIRELY from metadata (sequence + explode in the JVM) — the decode
    UDF then receives (payload, frame_index) pairs. Demonstrates the
    rule: do the combinatorics natively, cross to Python only for codec
    work."""
    n_frames = F.floor(F.col(duration_col) / F.lit(every_s)).cast("int")
    return df.withColumn(
        "frame_index",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))),
    ).withColumn("frame_ts", F.col("frame_index") * F.lit(every_s))


RESIZE_SCHEMA = (
    "item_id long, modality string, payload binary, width int, height int"
)


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: stretch/truncate the byte stream to the
    target pixel count (md5-keyed stream cipher style, so output bytes
    depend on the full input). Replace with a PIL ``Image.resize`` in
    production — the Spark-side contract (bytes in, bytes out, new dims)
    is identical."""
    target = max(width * height, 1)
    digest = hashlib.md5(payload or b"").digest()
    reps = target // len(digest) + 1
    return bytes((digest * reps)[:target])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Batch image resize via ``mapInPandas`` — payload in, payload out,
    with the new dimensions as JVM-filterable metadata columns.

    Non-image modalities raise ``NotImplementedError`` (fail loudly, not
    silently pass-through): route by modality BEFORE this operator with a
    JVM-side filter. Same Arrow batch-sizing rule as
    :func:`extract_features` — payload bytes dominate batch memory, so
    cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly.
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    rs = resize or _stub_resize
    narrow = df.select(id_col, modality_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf[payload_col], pdf[modality_col]):
                if m != "image":
                    raise NotImplementedError(
                        f"resize_images got modality {m!r}; filter to images first"
                    )
                out.append(rs(p if p is not None else b"", width, height))
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].values,
                    "modality": pdf[modality_col].values,
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return narrow.mapInPandas(run, schema=RESIZE_SCHEMA)


def payload_near_dup_pairs(
    df: "DataFrame",
    id_col: str = "item_id",
    payload_col: str = "payload",
    gram_bytes: int = 4,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> "DataFrame":
    """Byte-level near-duplicate pairs over binary payloads: hex-encode,
    roll byte-aligned ``gram_bytes``-byte windows (stride one byte), and
    pipe the gram rows through the EXACT token-SimHash ladder
    (``dedup.simhash_of_tokens`` majority fingerprint + banded Hamming
    equi-join) — one linear fingerprint pass, hash-join candidates,
    never an all-pairs comparison. Catches re-encoded image variants,
    re-muxed audio, appended metadata — no decoder needed. Same scale
    knobs as ``simhash_near_dup_pairs`` (bits/band_bits).

    The DEFAULT is the scale-safe setting: ``bits=32, band_bits=8``
    gives 4 bands x 256 chunk values = 1024 distinct band keys (still
    bands > max_hamming, so the pigeonhole guarantee holds), vs the
    16/4 setting's 64 keys whose buckets hold n/64 rows each and make
    candidate volume quadratic once the corpus saturates them
    (measured 19x wall for 10x data at 100x scale before this
    default flipped).

    The gram pass here emits one TOKEN ROW per byte-gram directly —
    ``explode(sequence(starts))`` + ``substr`` — instead of building a
    space-joined gram string and re-tokenizing it. Same grams, but zero
    interpreted array lambdas in the plan (``transform``/``filter`` HOFs
    evaluate outside whole-stage codegen) and no document-sized
    intermediate string."""
    from .dedup import simhash_band_pairs, simhash_of_tokens
    from ..cachescope import scoped_cache

    width = 2 * gram_bytes
    toks = (
        df.select(
            F.col(id_col), F.lower(F.hex(F.col(payload_col))).alias("__h")
        )
        .select(
            F.col(id_col),
            F.col("__h"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.lit(1), F.length("__h") - F.lit(width - 1)),
                    F.lit(2),
                )
            ).alias("__i"),
        )
        .select(
            F.col(id_col),
            F.col("__h").substr(F.col("__i"), F.lit(width)).alias("tok"),
        )
        # a zero-byte payload hex-encodes to '' -> sequence [1] -> one
        # empty-string gram; the oracle's list_filter(x <> '') drops it,
        # so drop it here too or two empty payloads would share a
        # fingerprint the oracle never emits (ADVICE r8)
        .where(F.length("tok") > 0)
    )
    fp = scoped_cache(simhash_of_tokens(toks, id_col, bits))
    return simhash_band_pairs(fp, id_col, bits, band_bits, max_hamming)
