"""Joins — SURVEY.md §2.3 (J1-J9).

Canonical forms for every join shape the reference executes. Scale rules
baked in:

- dimension tables (region/nation/admin/tz/label-lists) are broadcast —
  no shuffle of the fact side (`geocode_stop_locations.scala:82`,
  `tz_offset.scala:27`, `retrieve_top_tweets_peel.py:46`);
- anti/semi joins are expressed as ``left_anti`` / ``left_semi`` (one
  shuffle, no post-filter, no null-handling footguns) instead of the
  reference's outer-join-then-isNull and collect-then-isin spellings
  (`split_random.py:36`, `wbgps/analysis.py:354-356`);
- big-big joins shuffle on the key; AQE skew-join splits oversized
  partitions at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import windows
from ..cachescope import tracked_local_checkpoint


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """J4 — broadcast hash join for small dimensions. The hint is explicit
    (not left to autoBroadcastJoinThreshold) because dimension size is
    known by construction and the cost of a wrong shuffle at 100 TB
    dwarfs the cost of the hint."""
    return fact.join(F.broadcast(dim), on, how)


def anti_join(df: DataFrame, exclude: DataFrame, on: str | list[str]) -> DataFrame:
    """J3/U2 — rows of ``df`` whose key does NOT appear in ``exclude``.

    Canonical form of both reference spellings: ``left_outer`` + isNull
    (`split_random.py:36`) and broadcast ``left_anti``
    (`retrieve_top_tweets_peel.py:46`). Broadcast applied automatically
    when ``exclude`` is small (AQE); call sites with a known-small exclude
    list should pass ``F.broadcast(exclude)`` themselves.
    """
    return df.join(exclude, on, "left_anti")


def semi_join(df: DataFrame, keep: DataFrame, on: str | list[str]) -> DataFrame:
    """J5/U3 — rows of ``df`` whose key appears in ``keep``. Replaces the
    reference's driver-side ``collect()`` + ``isin(list)``
    (`wbgps/analysis.py:354-356`), which caps out at driver memory; the
    semi-join form scales to any key-list size and still broadcasts when
    small."""
    return df.join(keep, on, "left_semi")


def rank_join(
    df: DataFrame,
    ranks: Sequence[int],
    order_by: Sequence[str],
    ascending: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """J7/O5 — attach a global rank and keep only the requested ranks
    (log-spaced rank sampling, `sample_tweets_to_validate_inference_on_
    random_set.py:21-33,62-66`).

    The reference ranks 100M rows through a single-partition Window
    (`:65`). Here: filter-first via a top-k bound — only rows that can
    hold rank <= max(ranks) reach the final single-partition ranking, so
    the narrow stage does the heavy lifting. The prune itself is
    genuinely shuffle-free (`windows.partition_local_rank`; a window over
    ``spark_partition_id()`` would plan a full hash Exchange first).
    Deterministic: ties broken by the full ``order_by`` list (callers
    append a unique id).
    """
    kmax = max(ranks)
    cols = [F.col(c) for c in order_by]
    ordering = [c.desc() for c in cols] if not ascending else [c.asc() for c in cols]
    # Stage 1: per-partition top-kmax (narrow, no shuffle).
    pruned = (
        windows.partition_local_rank(df, ordering, rank_col="__pr")
        .where(F.col("__pr") <= kmax)
        .drop("__pr")
    )
    # Stage 2: global rank over the pruned (≤ kmax × n_partitions) rows.
    w = Window.orderBy(*ordering)
    ranked = pruned.withColumn(rank_col, F.row_number().over(w))
    wanted = F.array(*[F.lit(r) for r in ranks])
    return ranked.where(F.array_contains(wanted, F.col(rank_col)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the big side's key with a random
    shard in [0, salt), replicate the small side ``salt`` times, join on
    (key, shard).

    AQE's skew-join handles moderate skew automatically
    (``spark.sql.adaptive.skewJoin``); explicit salting is for the
    pathological case — one key holding a double-digit percentage of a
    100 TB table — where even a split post-shuffle partition overwhelms
    its tasks. Salting spreads that key across ``salt`` shuffle
    partitions at the cost of replicating the (dimension-sized) small
    side. Result equivalence: every (key, shard) pair sees the full small
    row set for that key, so the join output is identical to the unsalted
    join — for INNER and LEFT joins. Right/full outer are rejected: the
    small side exists ``salt`` times, so an unmatched small row would be
    null-extended once PER REPLICA (salt duplicate rows).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left-side joins, got {how!r}: the "
            f"replicated small side would null-extend {salt}x per unmatched row"
        )
    shard = F.floor(F.rand(seed=0) * salt).cast("int")
    b = big.withColumn("__shard", shard)
    s = small.withColumn(
        "__shard", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [on, "__shard"], how).drop("__shard")


def multiway_join(base: DataFrame, joins: Sequence[tuple[DataFrame, str | list[str], str]]) -> DataFrame:
    """J8 — chained join (`wbgps/analysis.py:184-188,241-251`). Catalyst
    reorders/plans each hop; callers wrap small sides in F.broadcast."""
    out = base
    for other, on, how in joins:
        out = out.join(other, on, how)
    return out


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    latest right row with the same keys and ``right.ts <= left.ts``
    (left rows with no prior right row keep nulls).

    The reference expresses nearest-in-time semantics with ``lag`` windows
    over a pre-unioned frame (SURVEY §2.3 note, `wbgps/analysis.py:
    392-397`); this operator is the general form. Implementation is the
    scalable union+window strategy, NOT a range join:

    1. tag both sides and union them (schema-aligned, payload nulled on
       the left);
    2. one window per key ordered by (ts, side) — right rows sort before
       left rows at equal timestamps, so "at or before" is inclusive;
    3. ``last(struct(payloads), ignorenulls=True)`` carries the latest
       right row's payload forward AS ONE STRUCT — never per-column, so a
       NULL inside one payload column of the latest right row stays NULL
       in the output instead of leaking an older row's value (the
       documented "payload of the latest right row" semantics hold even
       with nullable payloads); keep only left rows, unpack the struct.

    Cost: exactly ONE shuffle (the window partitioning), linear state —
    a range join materializes |left| x |right-in-range| pairs and then
    discards all but one per left row, which dies at 100 TB. Right rows
    must be unique per (keys, ts) for determinism; callers aggregate
    duplicates first (e.g. ``groupBy(keys, ts).agg(max(...))``).
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    rt = right.select(
        *keys,
        ts_col,
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__payload"),
    )
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(rt.schema["__payload"].dataType)
    )
    extra = [c for c in lt.columns if c not in rt.columns]
    for c in extra:
        rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__payload", F.last("__payload", ignorenulls=True).over(w))
    out_cols = [
        F.col(f"__payload.{c}").alias(c) if c in payload_cols else F.col(c)
        for c in lt.columns
        if c not in ("__side", "__payload", *payload_cols)
    ] + [F.col(f"__payload.{c}").alias(c) for c in payload_cols]
    return carried.where(F.col("__side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair sharing
    ``keys`` with ``start <= point < end`` (end-exclusive). ``point_col``
    / ``start_col`` / ``end_col`` are integer columns (epoch seconds,
    positions, …).

    Spark has no native band/interval join — the naive spelling
    ``points.join(intervals, (p >= s) & (p < e))`` plans a
    BroadcastNestedLoop/cartesian and dies at scale. This is the
    two-phase banding strategy (same pattern as the spatial grid join,
    `operators/spatial.py`):

    1. quantize: each point lands in ONE bucket of ``bucket_width``;
       each interval explodes to the buckets it covers
       (``sequence(s div w, (e-1) div w)``);
    2. equi-join on (keys, bucket) — a plain shuffled hash join Catalyst
       and AQE fully optimize — then refine with the exact range
       predicate.

    No dedup pass is needed: a point exists in exactly one bucket, so
    each qualifying pair is produced exactly once. Pick ``bucket_width``
    near the typical interval length: cost is
    |intervals| x (interval_len / bucket_width) exploded rows, and at
    most |points| + |exploded| join input — never the |points| x
    |intervals| blow-up. Degenerate intervals (end <= start) are dropped
    (they contain no point under end-exclusive semantics — and Spark's
    ``sequence`` would otherwise generate a DESCENDING range, silently
    joining buckets the interval does not cover).
    """
    keys = list(keys)
    p, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    w = F.lit(int(bucket_width))
    # FLOOR(x / w), not integer div: negative positions bucket correctly
    ipts = points.withColumn("__b", F.floor(p / w).cast("long"))
    iint = intervals.where(e > s).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(s / w).cast("long"),
                F.floor((e - 1) / w).cast("long"),
            )
        ),
    )
    joined = ipts.join(iint, [*keys, "__b"])
    return joined.where((p >= s) & (p < e)).drop("__b")


def auto_block_digits(n_rows: int, target_block_rows: int = 500) -> int:
    """Trailing-key width for :func:`fuzzy_join` blocking that keeps the
    expected block size ~``target_block_rows`` as the corpus grows — the
    ``similarity.auto_n_planes`` pattern applied to record linkage.

    Blocking on a FIXED number of trailing characters of a digit-tailed
    identifier ("Customer#000000001") caps the block count at 10^k, so
    per-block population — and refine cost Σ|L_b|·|R_b| — grows
    QUADRATICALLY with the corpus (measured: the last-3-chars key ran
    37.9x the wall for 10x the data at 100x scale). Returns the smallest
    ``k`` with ``10^k >= ceil(n_rows / target_block_rows)`` (floored at
    3 so test-scale fixtures keep their historical key), computed in
    PURE INTEGER arithmetic — digits of ``blocks_needed - 1`` — so a SQL
    oracle replays it exactly via ``length(CAST(... AS VARCHAR))`` with
    no float-log10 boundary risk."""
    t = max(1, int(target_block_rows))
    blocks = max(1, -(-max(0, int(n_rows)) // t))
    return max(3, len(str(blocks - 1)))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
    block_key=None,
    how: str = "inner",
    dist_col: str = "edit_dist",
    target_block_rows: int = 500,
) -> DataFrame:
    """Blocked fuzzy join — record linkage by edit distance.

    The naive spelling ``left.join(right, levenshtein(a, b) <= k)`` is a
    non-equi predicate: Catalyst plans BroadcastNestedLoop / cartesian
    and evaluates |left| x |right| Levenshtein calls — dead at scale.
    This is the standard two-phase record-linkage plan:

    1. **block**: ``block_key`` (a ``Column -> Column`` function, e.g.
       soundex, a prefix, a length bucket, the right-k digits of a
       code) maps each side's match column to a coarse key; candidate
       pairs are the equi-join on that key — a plain shuffled hash join.
    2. **refine**: exact ``levenshtein(left_col, right_col) <= max_dist``
       on candidates only.

    Recall contract (standard for blocking): pairs whose block keys
    differ are NEVER compared — choose a block function that true
    matches cannot disagree on (or union several blocking passes).
    Precision is exact: every emitted pair satisfies the distance bound.

    Scale: cost is sum over blocks of |L_b| x |R_b| refinements, never
    |L| x |R|; a hot block is an AQE skew-join split (or pre-salt with
    :func:`salted_join` semantics). Output carries both input schemas
    plus ``dist_col``.

    Two refine-cost details that matter when blocks are large:

    - the distance is computed ONCE (projected, then filtered on the
      projected column) — a ``where(dist <= k)`` + ``withColumn(dist)``
      spelling evaluates Levenshtein twice per candidate pair;
    - the bounded form ``levenshtein(l, r, k)`` is used, which the JVM
      evaluates with the banded early-exit algorithm — O(k·n) per pair
      instead of O(n·m), returning -1 past the bound.

    The blocking knob at scale: candidate pairs per block are
    |L_b|·|R_b|, so a FIXED-cardinality block key (e.g. 3 trailing
    chars = ≤1000 blocks) makes refine cost grow quadratically with
    corpus size. Grow block-key cardinality with the data (more chars,
    soundex+length, …) exactly as the LSH band knobs do
    (``dedup.simhash_pairs`` docstring) — recall permitting.

    ``block_key=None`` (the DEFAULT) does exactly that automatically
    for digit-tailed identifiers: both sides are counted (two
    column-pruned scans — the ``auto_n_planes`` discipline of paying a
    cheap count to size the plan) and the key is the last
    :func:`auto_block_digits` characters of the match column, so the
    expected block population stays ~``target_block_rows`` and refine
    cost scales LINEARLY with the corpus. Callers whose keys are not
    digit-tailed (free-text names) pass an explicit ``block_key``
    (soundex, length-bucketed prefix, …) — the auto key's 10^k
    cardinality estimate assumes a numeric tail. NOTE the recall
    contract above still applies: a wider auto key is a stricter
    blocking (true matches differing inside the trailing window are
    never compared).
    """
    if block_key is None:
        k = auto_block_digits(
            max(left.count(), right.count()), target_block_rows
        )
        block_key = lambda c: F.substring(c, -k, k)  # noqa: E731
    lk = left.withColumn("__blk", block_key(F.col(left_col)))
    rk = right.withColumn("__blk", block_key(F.col(right_col)))
    d = F.levenshtein(F.col(left_col), F.col(right_col), max_dist)
    if how == "inner":
        return (
            lk.join(rk, "__blk")
            .withColumn(dist_col, d)
            .where(F.col(dist_col) >= 0)
            .drop("__blk")
        )
    if how not in ("left", "left_outer", "leftouter"):
        # a naive `join(..., how)` + refine filter silently DROPS the
        # unmatched rows an outer join exists to keep (their distance is
        # null, and null >= 0 filters) — only spellings with correct
        # two-phase implementations are accepted
        raise ValueError(
            f"fuzzy_join supports how='inner' or left-outer, got {how!r}"
        )
    # left outer = inner matches + an anti-joined null-extension of the
    # unmatched left rows (refine must NOT filter them away). The
    # surrogate id exists only to anti-join duplicates-safely; it never
    # reaches the output.
    # the id frame is consumed TWICE (matched + the anti-join below) and
    # monotonically_increasing_id is nondeterministic across evaluations
    # (task retry, or a left input with nondeterministic intra-partition
    # order) — two independent evaluations could assign different ids
    # and the anti-join would drop or duplicate rows. Materialize once
    # so both consumers read the same ids.
    lid = tracked_local_checkpoint(
        lk.withColumn("__lid", F.monotonically_increasing_id())
    )
    matched = (
        lid.join(rk, "__blk")
        .withColumn(dist_col, d)
        .where(F.col(dist_col) >= 0)
    )
    missing = lid.join(
        matched.select("__lid").distinct(), "__lid", "left_anti"
    )
    return matched.unionByName(
        missing, allowMissingColumns=True
    ).drop("__lid", "__blk")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval-overlap join: every (left, right) interval pair sharing
    ``keys`` whose half-open ranges intersect —
    ``l_start < r_end AND r_start < l_end`` — the temporal-database /
    genomics classic (meeting-conflict detection, session overlap,
    variant-vs-gene-region intersection). Bounds are integer columns.

    Same two-phase banding as :func:`interval_join`, applied to BOTH
    sides: each interval explodes to the ``bucket_width`` buckets it
    covers, an equi-join on (keys, bucket) generates candidates, the
    exact predicate refines. A pair can share MANY buckets; rather than
    a distinct-pass over the matches (a second corpus-sized shuffle),
    each pair is emitted exactly once by construction: only in the
    FIRST bucket where both intervals are present,
    ``bucket == max(floor(l_start/w), floor(r_start/w))`` — a free
    per-row filter on the join output.

    Cost: |exploded left| + |exploded right| join inputs (each side
    linear in total interval length / bucket_width), never
    |left| x |right|. Pick ``bucket_width`` near the typical interval
    length. Degenerate intervals (end <= start) are dropped — empty
    ranges overlap nothing under half-open semantics.
    """
    keys = list(keys)
    w = F.lit(int(bucket_width))

    def explode_side(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        sc, ec = F.col(s), F.col(e)
        return (
            df.where(ec > sc)
            .withColumn(f"__fb_{tag}", F.floor(sc / w).cast("long"))
            .withColumn(
                "__b",
                F.explode(
                    F.sequence(
                        F.col(f"__fb_{tag}"),
                        F.floor((ec - 1) / w).cast("long"),
                    )
                ),
            )
        )

    lb = explode_side(left, l_start, l_end, "l")
    rb = explode_side(right, r_start, r_end, "r")
    joined = lb.join(rb, [*keys, "__b"])
    exact = (
        (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    )
    first_shared = F.col("__b") == F.greatest(
        F.col("__fb_l"), F.col("__fb_r")
    )
    return joined.where(exact & first_shared).drop(
        "__b", "__fb_l", "__fb_r"
    )
