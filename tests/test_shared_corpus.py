"""Session-pinned caches and the tokenize-once corpus materialization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdg_big_data_spark.cachescope import (
    pin_session_cache,
    release_caches,
    scoped_cache,
    sweep_unpinned,
)

SF_DIR = "/root/testdata/sf0.001"


def _persistent_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


class TestPinSessionCache:
    def test_pin_survives_sweep_and_release(self, spark):
        pinned = pin_session_cache(spark.range(100).withColumn("x", F.col("id") * 2))
        victim = scoped_cache(spark.range(50))
        victim.count()
        pinned_ids_before = _persistent_ids(spark)
        release_caches()
        sweep_unpinned(spark)
        remaining = _persistent_ids(spark)
        # the pinned frame's storage survives; the scoped cache is gone
        assert remaining  # at least the pinned ids
        assert remaining <= pinned_ids_before
        assert pinned.count() == 100  # still usable

    def test_unpinned_checkpoint_blocks_are_swept(self, spark):
        df = spark.range(30).localCheckpoint()  # unregistered, unpinned
        assert df.count() == 30
        before = _persistent_ids(spark)
        assert before
        sweep_unpinned(spark)
        # blocks released (pinned ids of other tests may linger; the
        # checkpoint's own ids must not)
        # Re-sweep is idempotent
        sweep_unpinned(spark)

    def test_pin_is_recompute_safe_after_clear_cache(self, spark):
        pinned = pin_session_cache(
            spark.range(10).withColumn("y", F.col("id") + 1)
        )
        spark.catalog.clearCache()  # external nuke: must degrade, not break
        assert pinned.agg(F.sum("y")).collect()[0][0] == 55


class TestTokenizedDocuments:
    def test_memoized_per_session_and_dir(self, spark):
        from sdg_big_data_spark.plans import shared_corpus

        a = shared_corpus.tokenized_documents(spark, SF_DIR)
        b = shared_corpus.tokenized_documents(spark, SF_DIR)
        assert a is b  # same pinned frame, not a rebuild
        assert set(a.columns) == {"doc_id", "lang", "source", "toks"}

    def test_tokens_match_inline_tokenize(self, spark):
        from sdg_big_data_spark.functions import text as T
        from sdg_big_data_spark.plans import shared_corpus
        from sdg_big_data_spark.sources.readers import read_table

        td = shared_corpus.tokenized_documents(spark, SF_DIR)
        docs = read_table(spark, SF_DIR, "documents")
        inline = docs.select(
            "doc_id", T.tokenize(F.col("text")).alias("toks")
        )
        diff = td.select("doc_id", "toks").exceptAll(inline)
        assert diff.count() == 0


class TestTokensOfSeam:
    def test_string_column_tokenizes(self, spark):
        from sdg_big_data_spark.functions.text import tokens_of

        df = spark.createDataFrame([(1, "Alpha BETA  gamma")], ["id", "text"])
        out = df.select(tokens_of(df, "text").alias("t")).collect()[0]["t"]
        assert out == ["alpha", "beta", "gamma"]

    def test_array_column_passes_through(self, spark):
        from sdg_big_data_spark.functions.text import tokens_of

        df = spark.createDataFrame(
            [(1, ["already", "tokenized"])], "id long, text array<string>"
        )
        out = df.select(tokens_of(df, "text").alias("t")).collect()[0]["t"]
        assert out == ["already", "tokenized"]

    def test_operators_agree_between_forms(self, spark):
        # the seam's contract: an operator fed raw text or the
        # pre-tokenized frame returns identical results
        from sdg_big_data_spark.operators.quality import repetition_signals
        from sdg_big_data_spark.functions import text as T

        docs = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "x y z w")], ["doc_id", "text"]
        )
        toks = docs.select("doc_id", T.tokenize(F.col("text")).alias("toks"))
        raw = {r["doc_id"]: r for r in repetition_signals(docs, "doc_id", "text").collect()}
        pre = {r["doc_id"]: r for r in repetition_signals(toks, "doc_id", "toks").collect()}
        assert raw.keys() == pre.keys()
        for k in raw:
            assert raw[k].asDict() == pre[k].asDict()


class TestPinnedIdHygiene:
    def test_stale_pins_of_dead_apps_do_not_shadow(self, spark):
        # RDD ids restart at 0 per SparkContext: a pin recorded under a
        # DEAD application id must not exempt a same-id RDD of the LIVE
        # session from the sweep (ADVICE r8)
        from sdg_big_data_spark import cachescope

        app_id = spark.sparkContext.applicationId
        before = _persistent_ids(spark)
        victim = spark.range(40).localCheckpoint()  # unpinned blocks
        assert victim.count() == 40
        victim_ids = _persistent_ids(spark) - before
        assert victim_ids
        # forge stale pins: the victim's ids, but under a dead app id
        stale = {("dead-app-0000", i) for i in victim_ids}
        cachescope._PINNED_IDS.update(stale)
        sweep_unpinned(spark)
        assert not (cachescope._PINNED_IDS & stale)  # pruned
        # genuinely pinned ids of THIS session survive the prune
        assert all(k[0] == app_id for k in cachescope._PINNED_IDS)
        # the victim's blocks were swept despite the id collision
        assert not (victim_ids & _persistent_ids(spark))

    def test_zero_new_ids_pin_warns(self, spark):
        import warnings

        df = spark.range(25).withColumn("z", F.col("id") * 3)
        pinned = pin_session_cache(df)  # first pin: records ids, silent
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            try:
                pin_session_cache(pinned)  # already materialized
                raise AssertionError("expected RuntimeWarning")
            except RuntimeWarning:
                pass
