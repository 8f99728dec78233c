"""Sequence-packing plan invariants + the prefix-sum plan gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_big_data_spark.operators.packing import pack_plan
from sdg_big_data_spark.operators.windows import grouped_prefix_sum


def _docs(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(f"tok{j}" for j in range(7 + (i * 13) % 40)))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, schema="doc_id long, source string, text string")


def test_pack_plan_tiles_windows_exactly(spark):
    """Coordinates must tile each shard's token stream: doc k's start
    (bin*capacity + offset) equals doc k-1's end, windows are contiguous
    from 0, and every token position is covered exactly once."""
    cap = 64
    plan = pack_plan(_docs(spark), capacity=cap, shard_cols=["source"]).collect()
    by_shard: dict[str, list] = {}
    for r in plan:
        by_shard.setdefault(r["source"], []).append(r)
    assert len(by_shard) == 3
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["first_bin"] * cap + r["bin_offset"] == pos
            end = pos + r["n_tokens"] - 1
            assert r["last_bin"] == end // cap
            pos += r["n_tokens"]


def test_pack_plan_capacity_changes_only_bins(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["n_tokens"] for r in pack_plan(docs, 32).collect()}
    b = {r["doc_id"]: r["n_tokens"] for r in pack_plan(docs, 512).collect()}
    assert a == b  # token accounting independent of window size


def test_grouped_prefix_sum_plans_range_partition_not_group_window(spark):
    """The scalable prefix sum must range-partition on (group, order) and
    must NOT plan a hash-partitioned Window over the group columns (the
    whole-group sort the operator exists to avoid)."""
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), 1) for i in range(100)],
        schema="id long, g string, v int",
    )
    # pin_layout=False: the default single-materialization pin hides the
    # upstream plan behind a Scan ExistingRDD; the gate inspects the
    # unpinned form (same plan up to the checkpoint boundary)
    out = grouped_prefix_sum(
        df, ["g"], [F.col("id").asc()], "v", cum_col="c", pin_layout=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # the only Window allowed is the tiny per-(pid, group) offsets frame
    # (input = an aggregate over partition ids), never a Window whose
    # child is the full data exchange hashed on the group column alone
    import re

    win_parts = re.findall(r"hashpartitioning\((\w+)[#,]", plan)
    assert all(p != "g" for p in win_parts) or "__pid" in plan


# --- chunk_plan -------------------------------------------------------------


def test_chunk_plan_tiles_every_token(spark):
    """Chunk windows must cover [0, n) with exactly `overlap` shared
    tokens between consecutive chunks, and the final chunk must end at n."""
    from sdg_big_data_spark.operators.packing import chunk_plan

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(75))),  # 75 tokens -> 3 chunks
         (2, "one two three"),                        # n <= C -> 1 chunk
         (3, "")],                                    # empty -> no chunks
        schema="doc_id long, text string",
    )
    out = chunk_plan(docs, capacity=32, overlap=8)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["tok_start"], r["tok_end"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 0, 32), (1, 1, 24, 56), (1, 2, 48, 75),
        (2, 0, 0, 3),
    ]


def test_chunk_plan_rejects_bad_overlap(spark):
    import pytest as _pytest

    from sdg_big_data_spark.operators.packing import chunk_plan

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_plan(docs, capacity=8, overlap=8)


def test_shuffle_order_is_exact_permutation(spark):
    from sdg_big_data_spark.operators.packing import shuffle_order

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    out = shuffle_order(docs, id_col="doc_id", salt="e0")
    ranks = sorted(r["shuffle_rank"] for r in out.collect())
    assert ranks == list(range(1, 101))  # dense 1..N, no gaps/dupes


def test_shuffle_order_salt_changes_order_but_stays_deterministic(spark):
    from sdg_big_data_spark.operators.packing import shuffle_order

    docs = spark.createDataFrame(
        [(i, "t") for i in range(200)], "doc_id long, text string"
    )
    a1 = {r["doc_id"]: r["shuffle_rank"] for r in shuffle_order(docs, salt="e0").collect()}
    a2 = {r["doc_id"]: r["shuffle_rank"] for r in shuffle_order(docs, salt="e0").collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in shuffle_order(docs, salt="e1").collect()}
    assert a1 == a2  # reproducible
    assert a1 != b  # epoch re-randomizes
    # partition-count invariant (the scalable-rank contract)
    c = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_order(docs.repartition(7), salt="e0").collect()
    }
    assert a1 == c
