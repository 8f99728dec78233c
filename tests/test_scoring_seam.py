"""F6 real-model seam — the boundary `deployment_ONNX_bert.py:62-128`
hides behind SLURM/ONNX: a genuinely non-trivial model (numpy logistic
over hashed bag-of-words features, loaded lazily once per task) pushed
through ``score_documents``, proving

1. batch-boundary invariance: scores are bitwise identical whether the
   Arrow stream delivers 16-row or 1000-row batches;
2. partitioning invariance: identical across 1 vs 7 input partitions;
3. memory-bounded batching: ``spark.sql.execution.arrow.maxRecordsPerBatch``
   actually caps the pandas frames the model sees (the knob the operator
   docstring names as the 100 TB memory bound).

The stub scorer exercised elsewhere is a closed-form formula; this model
has real state (a weight matrix materialized on first batch — the
load-once-per-task contract), a real feature pipeline (crc32-hashed
token buckets), and enough width (256 features x 3 classes) that a
batching bug (state bleeding across batches, per-batch renormalization,
dropped remainder rows) cannot cancel out.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pytest


def _hashed_logistic_scorer(classes: list[str], dim: int = 256):
    """Deterministic 'trained model': per-class logistic over crc32
    bag-of-words counts. Weights derive arithmetically from (bucket,
    class) so every worker builds the identical matrix with no file or
    broadcast dependency."""
    state: dict = {}

    def fn(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        if "W" not in state:  # once-per-task model load (the ONNX seam)
            j = np.arange(dim, dtype=np.float64)
            state["W"] = np.stack(
                [np.cos(j * (c + 1) * 0.37) / dim for c in range(len(classes))]
            )  # (n_classes, dim)
        W = state["W"]
        X = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts.fillna("")):
            for tok in t.split():
                X[i, zlib.crc32(tok.encode()) % dim] += 1.0
        logits = X @ W.T - 0.5  # (n, n_classes)
        scores = 1.0 / (1.0 + np.exp(-logits))
        return pd.DataFrame({c: scores[:, k] for k, c in enumerate(classes)})

    return fn


CLASSES = ["c_a", "c_b", "c_c"]


def _score(spark, df, batch_size: int):
    from sdg_big_data_spark.operators.scoring import score_documents

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    try:
        out = score_documents(
            df, "text", "doc_id", CLASSES, model_fn=_hashed_logistic_scorer(CLASSES)
        )
        rows = {r["doc_id"]: (r["c_a"], r["c_b"], r["c_c"]) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return rows


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from sdg_big_data_spark.sources.readers import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_scores_invariant_to_arrow_batch_size(spark, docs):
    tiny = _score(spark, docs, 16)
    big = _score(spark, docs, 1000)
    assert len(tiny) == docs.count()
    assert tiny == big  # bitwise: same rows, same float values


def test_scores_invariant_to_partitioning(spark, docs):
    one = _score(spark, docs.coalesce(1), 128)
    many = _score(spark, docs.repartition(7), 128)
    assert one == many


def test_arrow_batch_cap_is_respected(spark, docs):
    """The model must never see a frame larger than maxRecordsPerBatch —
    this is the memory bound that lets a fixed-size executor score an
    unbounded partition."""
    from sdg_big_data_spark.operators.scoring import score_documents
    from sdg_big_data_spark.session import ship_package

    ship_package(spark)
    acc = spark.sparkContext.accumulator(0)

    base = _hashed_logistic_scorer(CLASSES)

    def spying(texts: pd.Series) -> pd.DataFrame:
        if len(texts) > 64:
            acc.add(1)  # count violations, not sizes: 0 must mean none
        return base(texts)

    cap_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(cap_key)
    spark.conf.set(cap_key, "64")
    try:
        out = score_documents(
            docs.coalesce(1), "text", "doc_id", CLASSES, model_fn=spying
        )
        n = out.count()
    finally:
        spark.conf.set(cap_key, old)
    assert n == docs.count()
    assert acc.value == 0, f"{acc.value} batches exceeded the 64-row cap"
