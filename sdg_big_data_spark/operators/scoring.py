"""Model-scoring operator — SURVEY.md §2.10 F6.

The reference scores 200M tweets OUTSIDE Spark: SLURM array jobs, each
reading parquet splits with pandas, running ONNX BERT, writing per-file
score parquet with by-hand resume bookkeeping
(`deployment_ONNX_bert.py:164-197,441-459`). The engine replaces all of
that with one ``mapInPandas`` operator: file sharding = Spark partitions,
resume = task retry, merge = the output DataFrame. The model is a
pluggable ``fn: pandas.Series[str] -> DataFrame[score columns]`` loaded
once per executor (not per batch).

At 100 TB: Arrow batch size tuned via
``spark.sql.execution.arrow.maxRecordsPerBatch``; scoring is embarrassingly
parallel so throughput scales linearly with executors — the reference's
43.5 tweets/s/core (BASELINE.md) is the per-core number to beat.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

ScoreFn = Callable[[pd.Series], pd.DataFrame]


def deterministic_stub_scorer(classes: list[str]) -> ScoreFn:
    """Test scorer: logistic over token count, shifted per class — fully
    deterministic arithmetic so the oracle can reproduce it in SQL:
    ``score_c = 1 / (1 + exp(-(n_tokens - 40 - 10*class_index) / 10))``."""

    def fn(texts: pd.Series) -> pd.DataFrame:
        n_tokens = texts.str.split().map(len)
        out = {}
        for i, cls in enumerate(classes):
            out[cls] = 1.0 / (1.0 + (-(n_tokens - 40 - 10 * i) / 10.0).map(math.exp))
        return pd.DataFrame(out)

    return fn


def score_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    classes: list[str],
    model_fn: ScoreFn | None = None,
) -> DataFrame:
    """Batch-score a document column into one score column per class.

    ``mapInPandas`` streams Arrow batches through the Python worker; the
    model loads lazily once per task (the closure materializes on first
    batch). Only (id, text) cross the Arrow boundary — select-early, the
    one pruning Catalyst cannot do for us inside the Python payload.
    """
    from ..session import ship_package

    ship_package(df.sparkSession)
    fn = model_fn or deterministic_stub_scorer(classes)
    schema = f"{id_col} long, " + ", ".join(f"{c} double" for c in classes)
    narrow = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = fn(pdf[text_col])
            scores.insert(0, id_col, pdf[id_col].values)
            yield scores

    return narrow.mapInPandas(run, schema=schema)
