"""Similarity-search variants agree: the Arrow/numpy top-k matches the
expression-based exact baseline (modulo float-tie rank swaps)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(400)
    ]
    return spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")


def test_pandas_topk_matches_brute_force(spark, emb):
    from sdg_big_data_spark.operators.similarity import (
        brute_force_topk,
        pandas_cosine_topk,
    )

    queries = emb.where(F.col("vec_id") < 4)
    a = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pandas_cosine_topk(emb, queries, k=5).collect()
    }
    assert a == b  # random gaussian data: no near-exact ties


def test_pandas_topk_across_batches(spark, emb):
    """Per-batch top-k + global reduce must equal single-batch results."""
    from sdg_big_data_spark.operators.similarity import pandas_cosine_topk

    queries = emb.where(F.col("vec_id") < 2)
    one = pandas_cosine_topk(emb.coalesce(1), queries, k=3)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        many = pandas_cosine_topk(emb.repartition(13), queries, k=3)
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
