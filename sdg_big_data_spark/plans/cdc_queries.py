"""Catalog queries — CDC operators (operators/cdc.py): MERGE/upsert of a
keyed change set, and SCD type-2 validity-interval history.

Change sets are DERIVED deterministically from the fixture tables inside
both the Spark query and the DuckDB oracle, so the merge semantics
(latest-per-key wins, deletes drop, inserts land) are value-checked, not
just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds
from ..operators import cdc
from .catalog import register, table

# --- s_merge_upsert ---------------------------------------------------------
# Change set against `orders`:
#   batch 1: every 7th key re-prices x1.1 (update)
#   batch 2: every 14th key re-prices x1.2 (later version SUPERSEDES
#            batch 1), and every 21st key is a DELETE.
# Exercises: multi-version latest-wins, update, delete, and untouched
# base rows, all in one result.
#
# Re-pricing is INTEGER-CENTS arithmetic — round(price * 110) / 100, not
# round(price * 1.1, 2).  Prices are exact 2-decimal values, so
# price * 110 is a true integer and rounding it can never sit near a
# .5 boundary; round(price * 1.1, 2) rounds a binary double that CAN
# land epsilon-below .xx5, where Spark (HALF_UP on the shortest decimal
# repr) and DuckDB (binary value) disagree — measured: 700 of 14.6M
# rows flipped by exactly 0.01 at the 100x fixture before this change.

_MERGE_SQL = """
    WITH chg AS (
      SELECT o_orderkey, round(o_totalprice * 110) / 100
               AS o_totalprice,
             'U' AS op, 1 AS seq
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, round(o_totalprice * 120) / 100,
             CASE WHEN o_orderkey % 21 = 0 THEN 'D' ELSE 'U' END, 2
      FROM orders WHERE o_orderkey % 14 = 0
    ),
    latest AS (
      SELECT * FROM (
        SELECT chg.*, row_number() OVER (
          PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM chg
      ) WHERE rn = 1
    ),
    survivors AS (
      SELECT b.o_orderkey, b.o_totalprice
      FROM orders b ANTI JOIN latest l ON b.o_orderkey = l.o_orderkey
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM survivors
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM latest WHERE op <> 'D'
"""


@register(
    "s_merge_upsert",
    sql=_MERGE_SQL,
    tags=("cdc", "merge", "upsert"),
    doc="CDC MERGE (cdc.merge_upsert): apply a multi-version change set "
    "to a snapshot — latest seq per key wins, 'D' deletes, unmatched "
    "keys insert. One window shuffle over the CHANGE SET + one key "
    "anti-join of base: the engine-neutral MERGE INTO (drop-in for "
    "Delta/Iceberg MERGE when a lakehouse format is present)",
)
def s_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b1 = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 110, 0) / 100).alias("o_totalprice"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    b2 = orders.where(F.col("o_orderkey") % 14 == 0).select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 120, 0) / 100).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 21 == 0, "D").otherwise("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    merged = cdc.merge_upsert(
        orders, b1.unionByName(b2), keys=["o_orderkey"], seq_col="seq",
        op_col="op",
    )
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# --- s_scd2 -----------------------------------------------------------------
# Orders as a per-customer status change log: each customer's orders in
# date order are observations of o_orderstatus; SCD2 compresses runs of
# the same status into validity intervals.

_SCD2_SQL = """
    WITH log AS (
      SELECT o_custkey, o_orderstatus,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS t,
             o_orderkey
      FROM orders
    ),
    flagged AS (
      SELECT o_custkey, o_orderstatus, t, o_orderkey,
             CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM
                       o_orderstatus
                  THEN 1 ELSE 0 END AS chg
      FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY t, o_orderkey)
    ),
    versioned AS (
      SELECT o_custkey, o_orderstatus, t,
             sum(chg) OVER (PARTITION BY o_custkey ORDER BY t, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver,
             chg
      FROM flagged
    ),
    episodes AS (
      SELECT o_custkey, o_orderstatus, t AS valid_from,
             CAST(ver AS BIGINT) AS version
      FROM versioned WHERE chg = 1
    )
    SELECT o_custkey, o_orderstatus, valid_from, version,
           lead(valid_from) OVER (PARTITION BY o_custkey
             ORDER BY valid_from, version) AS valid_to
    FROM episodes
"""


@register(
    "s_scd2",
    sql=_SCD2_SQL,
    tags=("cdc", "scd2", "history"),
    doc="SCD type-2 history (cdc.scd2_history): compress a keyed change "
    "log into attribute-change episodes with [valid_from, valid_to) "
    "intervals and per-key version numbers — null-safe struct "
    "change-point detection, one window shuffle serving lag/rank/lead",
)
def s_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    log = orders.select(
        "o_custkey",
        "o_orderstatus",
        epoch_seconds("o_orderdate").alias("t"),
        "o_orderkey",
    )
    hist = cdc.scd2_history(
        log,
        keys=["o_custkey"],
        ts_col="t",
        attr_cols=["o_orderstatus"],
        tiebreak=["o_orderkey"],
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        F.col("valid_from"),
        F.col("version").cast("long").alias("version"),
        F.col("valid_to"),
    )


# --- inc_agg_state ----------------------------------------------------------
# Three "runs" of events (split by event_id % 3) each produce mergeable
# per-type aggregate state; merging + finalizing must equal the direct
# aggregate over the full table — proving a persisted rollup can absorb
# a new batch with one batch-sized pass, never a history rescan.

_AGG_STATE_SQL = """
    WITH st AS (
      SELECT event_type,
             count(value) AS cnt,
             sum(value) AS s,
             min(value) AS mn,
             max(value) AS mx,
             sum(value * value) AS ss
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           cnt AS n,
           round(CAST(s AS DOUBLE), 2) AS total,
           round(CAST(s / cnt AS DOUBLE), 6) AS mean,
           round(CAST(mn AS DOUBLE), 6) AS vmin,
           round(CAST(mx AS DOUBLE), 6) AS vmax,
           round(CAST(sqrt((ss - s * s / cnt) / (cnt - 1)) AS DOUBLE), 6)
             AS stddev
    FROM st
"""


@register(
    "inc_agg_state",
    sql=_AGG_STATE_SQL,
    tags=("incremental", "rollup", "state"),
    doc="incremental rollup maintenance (incremental.agg_state / "
    "merge_agg_states / finalize_agg): three event 'runs' each emit "
    "mergeable (cnt,sum,min,max,sumsq) state; merge + finalize equals "
    "the direct full-table aggregate — a persisted 100 TB rollup "
    "absorbs a nightly batch with one batch-sized pass + state-sized "
    "merge instead of a history rescan (the exact-aggregate sibling of "
    "the HLL/Theta/KLL sketch rollups)",
)
def inc_agg_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import incremental as inc

    events = table(spark, sf_dir, "events")
    runs = [
        events.where(F.col("event_id") % 3 == i).select("event_type", "value")
        for i in range(3)
    ]
    states = [inc.agg_state(r, ["event_type"], "value") for r in runs]
    merged = inc.merge_agg_states(*states, keys=["event_type"])
    fin = inc.finalize_agg(merged, ["event_type"])
    return fin.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
        F.round("mean", 6).alias("mean"),
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        F.round("stddev", 6).alias("stddev"),
    )
