"""Sampling — SURVEY.md §2.8 (R1-R3), a first-class operator family.

Two families:

1. **Spark-native seeded sampling** (``sample`` / ``sampleBy``) — parity
   with the reference (`build_random_sets.py:45-47`,
   `select_tweets_containing_ngrams.py:141-145`). Reproducible only for a
   fixed partitioning (SURVEY §7.5.5), which is why the engine also has:
2. **Deterministic hash sampling** — keyed by a column through a fixed
   integer mix, so membership is a pure row property: stable across
   partitionings, engines (same arithmetic runs in any SQL dialect),
   and reruns — the property a 100 TB incremental pipeline actually
   needs (re-running a failed partition must re-select the same rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative-hash constant (public domain, TAOCP §6.4).
_MIX = 2654435761
_MOD = 2**32


def hash_bucket(key: Column, buckets: int = _MOD) -> Column:
    """Deterministic bucket in [0, buckets) from a 64-bit key column.
    Pure arithmetic (``(key mod 2^32) * 2654435761 mod 2^32``) —
    expressible identically in Spark and any ANSI-SQL oracle.

    Overflow-safe for the FULL long domain: a naive ``key * MIX`` wraps
    signed-64 for |key| ≳ 3.5e9 (and throws under ANSI mode), and Spark's
    ``%`` keeps the dividend's sign — so buckets went negative and
    ``hash_sample`` kept every such row regardless of fraction. The fix
    reduces the key mod 2^32 first (a modular-arithmetic no-op) and does
    the multiply in 16-bit halves, so every intermediate stays < 2^48:
    ``k*MIX mod 2^32 = ((k_hi*MIX mod 2^16) << 16 + k_lo*MIX) mod 2^32``.
    Identical to the simple form for small positive keys (every oracle
    SQL keeps the one-line spelling at test scale).
    """
    k = F.pmod(key.cast("long"), F.lit(_MOD))
    k_hi = F.shiftright(k, 16)
    k_lo = k.bitwiseAND(F.lit((1 << 16) - 1))
    mixed = (
        F.pmod(k_hi * F.lit(_MIX), F.lit(1 << 16)) * F.lit(1 << 16)
        + k_lo * F.lit(_MIX)
    ) % F.lit(_MOD)
    return mixed % F.lit(buckets)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """R1 (deterministic form) — Bernoulli-style sample keeping rows whose
    hash bucket falls below ``fraction``. One narrow filter, pushed to the
    scan when ``key_col`` is a stored column."""
    threshold = int(fraction * _MOD)
    return df.where(hash_bucket(F.col(key_col)) < F.lit(threshold))


def seeded_sample(df: DataFrame, fraction: float, seed: int = 0) -> DataFrame:
    """R1 (reference-parity form) — `df.sample(False, frac, seed)`
    (`build_random_sets.py:45-47`)."""
    return df.sample(False, fraction, seed)


def stratified_hash_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """R2 (deterministic form) — per-stratum target of ``n_per_stratum``
    rows: fraction = min(1, n/count) per stratum (the reference's
    frac-dict rule, `select_tweets_containing_ngrams.py:141-145`), applied
    via the hash filter.

    Unlike the reference, the fraction table is NOT collected to the
    driver — it is broadcast-joined back, so a billion-stratum table
    works."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    fracs = counts.withColumn(
        "__frac",
        F.when(F.col("__n") <= n_per_stratum, F.lit(1.0)).otherwise(
            F.lit(float(n_per_stratum)) / F.col("__n")
        ),
    )
    return (
        df.join(F.broadcast(fracs), stratum_col)
        .where(hash_bucket(F.col(key_col)) < (F.col("__frac") * _MOD).cast("long"))
        .drop("__n", "__frac")
    )


def stratified_sample_by(
    df: DataFrame, stratum_col: str, n_per_stratum: int, seed: int = 0
) -> DataFrame:
    """R2 (reference-parity form) — computed fraction dict + ``sampleBy``.
    Keeps the driver-side dict (matches reference semantics exactly);
    use stratified_hash_sample when the stratum count is unbounded."""
    counts = dict(df.groupBy(stratum_col).count().collect())
    fracs = {k: min(1.0, n_per_stratum / v) for k, v in counts.items()}
    return df.sampleBy(stratum_col, fracs, seed)


def fixed_n_sample(df: DataFrame, n: int, key_col: str, oversample: float = 1.2) -> DataFrame:
    """R3 — fixed-size random sample (pandas ``sample(n=10**6)``,
    `count_kskipngrams.py:133`): deterministic hash-order + limit. The
    hash ordering is a full shuffle of the *keys only* at worst; limit is
    pushed down (CollectLimit with early termination)."""
    return df.orderBy(hash_bucket(F.col(key_col)), F.col(key_col)).limit(n)


def group_fixed_n(
    df: DataFrame, group_cols: list[str], n: int, key_col: str
) -> DataFrame:
    """Deterministic fixed-n sample PER GROUP (the reference samples
    fixed-size validation sets per activity bucket / per month): rank
    rows within each group by the portable multiplicative hash of
    ``key_col`` (id tiebreak) and keep the first ``n``.

    Two-phase at scale — a plain ``Window.partitionBy(group)`` sorts a
    whole group in one task, so a skewed group straggles:

      1. narrow per-PHYSICAL-partition head-n per group (sort within
         partitions + Arrow cumcount with cross-batch carry — no
         shuffle, cuts each partition's contribution to ≤ n per group);
      2. exact window rank over the survivors (≤ n × #partitions rows
         per group reach the exchange, independent of group size).

    Deterministic and engine-replayable: the hash order is pure integer
    arithmetic, so an oracle states the same ranking directly.
    """
    from pyspark.sql.window import Window

    from ..session import ship_package

    ship_package(df.sparkSession)
    gcols = list(group_cols)
    base = df.withColumn("__hk", hash_bucket(F.col(key_col)))
    ordering = (
        [F.col(c).asc() for c in gcols]
        + [F.col("__hk").asc(), F.col(key_col).asc()]
    )
    local = base.sortWithinPartitions(*ordering)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in local.schema.fields
    )

    def head_n(batches):
        import pandas as pd

        carry_key, carry_cnt = None, 0
        for pdf in batches:
            if not len(pdf):
                continue
            cnt = pdf.groupby(gcols, sort=False, dropna=False).cumcount()  # dropna=False: NULL groups still sample
            kf = pdf[gcols].astype(object).where(pdf[gcols].notna(), "\x00<null>")
            keys = pd.MultiIndex.from_frame(kf)
            if carry_key is not None:
                cnt = cnt + (keys == carry_key) * carry_cnt
            carry_key = keys[-1]
            carry_cnt = int(cnt.iloc[-1]) + 1
            yield pdf[cnt < n]

    pruned = local.mapInPandas(head_n, schema=schema)
    w = Window.partitionBy(*gcols).orderBy(F.col("__hk").asc(), F.col(key_col).asc())
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__hk", "__rn")
    )


def weighted_bernoulli_sample(
    df: DataFrame, key_col: str, weight_col: str, scale: float
) -> DataFrame:
    """Deterministic weighted Bernoulli sample — keep probability
    ``min(1, w/scale)`` per row. The data-mixing primitive ("keep
    documents proportionally to quality score"): a high-quality doc is
    kept with probability → 1, a low one proportionally down-weighted.

    Membership is a pure row property (portable hash uniform vs. the
    row's own weight), so it is stable across partitionings, reruns and
    engines — and the comparison is a single IEEE double divide on each
    side, bit-identical in Spark and any SQL oracle. One narrow filter;
    pushed to the scan when both columns are stored.
    """
    u = hash_bucket(F.col(key_col)) / F.lit(float(_MOD))
    return df.where(u < F.col(weight_col) / F.lit(float(scale)))


def weighted_fixed_k(
    df: DataFrame, k: int, key_col: str, weight_col: str
) -> DataFrame:
    """Deterministic weighted sample of EXACTLY ``k`` rows without
    replacement — exponential-race keys (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir", Inf. Proc. Letters
    97(5); equivalently the -ln(u)/w form of their u^(1/w) keys): row i
    draws ``e_i = -ln(u_i)/w_i ~ Exp(w_i)`` with ``u_i`` from the
    portable hash, and the k smallest keys are the weighted sample.

    Scale shape: ``orderBy().limit(k)`` plans TakeOrdered — a per-
    partition k-heap plus one k-row merge on the driver, never a global
    sort. Deterministic and oracle-replayable: hash + ln + divide are
    the same IEEE arithmetic in any engine; ``key_col`` tiebreak pins
    the order even under (astronomically unlikely) key collisions.
    Rows with weight <= 0 are excluded (they'd win with Inf keys under
    a sign flip and are semantically "never sample").
    """
    u = (hash_bucket(F.col(key_col)) + F.lit(1)) / F.lit(float(_MOD))
    ekey = -F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__ek", ekey)
        .orderBy(F.col("__ek").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__ek")
    )


def stratified_split(
    df: DataFrame,
    group_cols: list[str],
    fractions: dict[str, float],
    key_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic EXACT-proportion train/val/test assignment per
    stratum — the ML-data staple: within each group, rows are ordered by
    the portable multiplicative hash of ``key_col`` (id tiebreak) and the
    ordered prefix is cut at exact fractional boundaries, so an 80/10/10
    split of a 1000-row stratum is exactly 800/100/100 (a per-row
    Bernoulli hash split only approximates proportions and drifts on
    small strata).

    Scalable: the within-group rank rides
    :func:`~.windows.grouped_prefix_sum` (range shuffle + narrow cumsum),
    never a whole-group sort partition; group sizes broadcast back.
    Deterministic + engine-replayable: same hash order as
    :func:`group_fixed_n`, so an oracle can state the assignment exactly.
    ``fractions`` preserve insertion order; they must sum to 1.
    """
    from .windows import grouped_prefix_sum

    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    base = df.withColumn("__hk", hash_bucket(F.col(key_col))).withColumn(
        "__one", F.lit(1)
    )
    ranked = grouped_prefix_sum(
        base,
        group_cols,
        [F.col("__hk").asc(), F.col(key_col).asc()],
        "__one",
        cum_col="__rk",
    )
    sizes = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__nb"))
    lhs = ranked.alias("__ss_l")
    rhs = sizes.alias("__ss_r")
    cond = None
    for g in group_cols:
        c = F.col(f"__ss_l.{g}").eqNullSafe(F.col(f"__ss_r.{g}"))
        cond = c if cond is None else cond & c
    j = lhs.join(F.broadcast(rhs), cond).select(
        "__ss_l.*", F.col("__ss_r.__nb").alias("__nb")
    )
    # boundary b_i = floor(nb * cumulative_fraction); rank in (b_{i-1}, b_i]
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        bound = F.floor(F.col("__nb") * F.lit(cum))
        clause = F.col("__rk") <= bound
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return j.withColumn(split_col, expr).drop("__hk", "__one", "__rk", "__nb")
