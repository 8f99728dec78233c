"""Change-data-capture operators — MERGE/upsert and SCD2 history.

The reference's incremental protocol (SURVEY §2.11, `streaming/
incremental.py`) appends and rewinds whole partitions; these operators
cover the other half of a production table lifecycle: applying a keyed
CHANGE SET to a snapshot (the MERGE INTO of Delta/Iceberg, expressed
engine-neutrally as DataFrame ops) and compressing a change log into a
slowly-changing-dimension type-2 validity-interval history.

Both are pure DataFrame plans — no table-format dependency, so they run
on plain parquet here and are drop-in replacements for a `MERGE INTO`
when a lakehouse format is available (COVERAGE.md "Delta availability").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change set to a base snapshot → new snapshot.

    Semantics (the standard MERGE contract):

    - ``changes`` may carry MULTIPLE versions per key; the row with the
      highest ``seq_col`` wins (callers needing a tiebreak beyond seq
      include it in ``seq_col``'s ordering by pre-combining columns).
    - a winning change row REPLACES the base row of the same key
      (update), or inserts if the key is new;
    - if ``op_col`` is given, winning rows whose op equals ``delete_op``
      DELETE the key from the snapshot.

    Plan: one window shuffle over the CHANGE SET (change-set-sized, not
    base-sized) picks winners; one anti-join shuffle on ``keys`` drops
    replaced/deleted base rows; union appends surviving winners. The
    base table is never windowed — at 100 TB the dominant cost is the
    single key-shuffle of base for the anti-join, the theoretical
    minimum for keyed merge without a co-partitioned layout (with
    bucketed layout — ``writers.write_bucketed`` — even that shuffle
    disappears).

    Columns: the snapshot keeps ``base``'s schema; ``changes`` must
    carry ``keys`` + the payload columns of ``base`` it replaces (extra
    bookkeeping columns ``seq_col``/``op_col`` are dropped).
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(latest.select(*keys), keys, "left_anti")
    if op_col is not None:
        latest = latest.where(F.col(op_col) != delete_op)
    incoming = latest.select(*base.columns)
    return survivors.unionByName(incoming)


def scd2_history(
    log: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Compress a change log into an SCD type-2 history.

    Input: one row per observation (key, ts, attributes...), possibly
    with long runs of unchanged attributes. Output: one row per
    ATTRIBUTE-CHANGE EPISODE with validity interval —

    ``(keys…, attr_cols…, valid_from, valid_to, version)``

    where ``valid_from`` is the ts of the first observation of the
    state, ``valid_to`` the ts at which the next state begins (NULL for
    the current state), and ``version`` counts episodes per key from 1.

    Change-point detection compares the FULL attribute struct against
    its lag — a state that reverts (A → B → A) correctly opens a third
    episode (SCD2 history, not a distinct-states table).

    Plan: ONE window shuffle on ``keys`` serves all three window
    functions (lag struct, episode rank, lead valid_to) — Catalyst
    reuses the single sort+Exchange because every window shares the
    same partitioning and ordering.
    """
    keys = list(keys)
    attr_cols = list(attr_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*attr_cols)
    # null-safe struct comparison: a NULL attribute value must compare as
    # a real state (plain != returns NULL and would drop the episode);
    # eqNullSafe is also false for the first row's NULL lag, opening
    # episode 1 without a separate isNull branch.
    changed = (~F.lag(state).over(w).eqNullSafe(state)).cast("int")
    flagged = log.withColumn("__chg", changed).withColumn(
        "__ver",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    episodes = flagged.where(F.col("__chg") == 1).select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.col("__ver").alias("version"),
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc(), F.col("version").asc())
    return episodes.withColumn("valid_to", F.lead("valid_from").over(w2))
