"""CDC operators — merge_upsert and scd2_history hand-computed cases."""

from __future__ import annotations

from sdg_big_data_spark.operators import cdc


class TestMergeUpsert:
    def test_update_insert_delete_latest_wins(self, spark):
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        changes = spark.createDataFrame(
            [
                (1, "a1", "U", 1),   # superseded by seq 2
                (1, "a2", "U", 2),   # wins -> update
                (3, None, "D", 1),   # delete
                (4, "d", "U", 1),    # insert (new key)
            ],
            "k long, v string, op string, seq int",
        )
        out = cdc.merge_upsert(base, changes, ["k"], "seq", op_col="op")
        got = {(r["k"], r["v"]) for r in out.collect()}
        assert got == {(1, "a2"), (2, "b"), (4, "d")}

    def test_delete_then_reinsert_later_seq(self, spark):
        base = spark.createDataFrame([(1, "a")], "k long, v string")
        changes = spark.createDataFrame(
            [(1, None, "D", 1), (1, "a9", "U", 2)],
            "k long, v string, op string, seq int",
        )
        out = cdc.merge_upsert(base, changes, ["k"], "seq", op_col="op")
        assert {(r["k"], r["v"]) for r in out.collect()} == {(1, "a9")}

    def test_no_op_col_means_pure_upsert(self, spark):
        base = spark.createDataFrame([(1, "a")], "k long, v string")
        changes = spark.createDataFrame(
            [(1, "z", 1), (2, "y", 1)], "k long, v string, seq int"
        )
        out = cdc.merge_upsert(base, changes, ["k"], "seq")
        assert {(r["k"], r["v"]) for r in out.collect()} == {(1, "z"), (2, "y")}


class TestScd2History:
    def _hist(self, spark, rows):
        df = spark.createDataFrame(rows, "k long, t long, s string")
        out = cdc.scd2_history(df, ["k"], "t", ["s"], tiebreak=[])
        return sorted(
            (r["k"], r["version"], r["s"], r["valid_from"], r["valid_to"])
            for r in out.collect()
        )

    def test_runs_compress_and_revert_reopens(self, spark):
        # A A B A -> three episodes; revert to A opens a NEW episode
        got = self._hist(
            spark, [(1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A")]
        )
        assert got == [
            (1, 1, "A", 10, 30),
            (1, 2, "B", 30, 40),
            (1, 3, "A", 40, None),
        ]

    def test_null_attribute_is_a_real_state(self, spark):
        # A -> NULL -> A: null-safe comparison must open/close episodes
        got = self._hist(spark, [(1, 10, "A"), (1, 20, None), (1, 30, "A")])
        assert got == [
            (1, 1, "A", 10, 20),
            (1, 2, None, 20, 30),
            (1, 3, "A", 30, None),
        ]

    def test_keys_are_independent(self, spark):
        got = self._hist(spark, [(1, 10, "A"), (2, 10, "A"), (2, 20, "B")])
        assert got == [
            (1, 1, "A", 10, None),
            (2, 1, "A", 10, 20),
            (2, 2, "B", 20, None),
        ]

    def test_single_window_shuffle(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "A"), (1, 20, "B")], "k long, t long, s string"
        )
        out = cdc.scd2_history(df, ["k"], "t", ["s"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # lag + version-rank share one Exchange; valid_to's lead re-sorts
        # the (filtered) episodes but must not add a THIRD exchange
        assert plan.count("Exchange") <= 2


def test_bucketed_merge_upsert_has_no_shuffle(spark, tmp_path):
    """The cdc.merge_upsert docstring claims the base-side key shuffle
    'disappears with bucketed layout' (reference analogue: the Delta
    MERGE in tz_offset.scala runs against a clustered table). Prove it:
    base AND changes bucketed by the merge key with the same bucket
    count -> the change-set window, the anti-join, and the union all
    run with ZERO Exchange in the executed plan."""
    from pyspark.sql import functions as F

    from sdg_big_data_spark.sources.writers import write_bucketed

    base = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    changes = spark.range(0, 2_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("v"),
        F.lit(1).alias("seq"),
    )
    write_bucketed(base, "m_base", 4, ["k"], sort_cols=["k"], path=str(tmp_path / "b"))
    write_bucketed(
        changes, "m_changes", 4, ["k"], sort_cols=["k"], path=str(tmp_path / "c")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = cdc.merge_upsert(
            spark.table("m_base").select("k", "v"),
            spark.table("m_changes"),
            keys=["k"],
            seq_col="seq",
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # and the merge is still correct
        assert merged.count() == 10_000
        assert (
            merged.where(F.col("k") < 2_000).where(F.col("v") != F.col("k") * 7).count()
            == 0
        )
        # control: the same merge over plain (unbucketed) parquet scans
        # DOES pay key exchanges — the layout, not the operator, is
        # what removes them
        plain = cdc.merge_upsert(
            spark.read.parquet(str(tmp_path / "b")).select("k", "v"),
            spark.read.parquet(str(tmp_path / "c")),
            keys=["k"],
            seq_col="seq",
        )
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS m_base")
        spark.sql("DROP TABLE IF EXISTS m_changes")
