"""Differential / property tests for the tricky semantics (SURVEY.md §5.2):

- W5 rolling day-range windows ≡ pandas ``rolling('Nd')`` (the hard
  equivalence the reference relies on inside its grouped-map labeler);
- W8 gap-fill ≡ pandas reindex+ffill+bfill;
- deterministic hash sampling: fraction within binomial bounds AND
  invariant under repartitioning (the property seeded ``sample()`` lacks);
- winsorize clips exactly to the group quantiles.
"""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def panel_pdf():
    rng = random.Random(7)
    rows = []
    d0 = dt.date(2020, 1, 1)
    for u in ["a", "b", "c"]:
        day = 0
        for _ in range(60):
            day += rng.randint(1, 4)  # irregular gaps
            rows.append((u, d0 + dt.timedelta(days=day), rng.uniform(0, 10)))
    return pd.DataFrame(rows, columns=["user_id", "date", "v"])


def test_rolling_days_matches_pandas(spark, panel_pdf):
    from sdg_big_data_spark.operators.windows import rolling_days

    days = 7
    sdf = spark.createDataFrame(panel_pdf)
    out = rolling_days(
        sdf,
        ["user_id"],
        "date",
        days,
        {"roll_sum": F.sum("v"), "roll_n": F.count(F.lit(1))},
        min_periods=2,
    ).toPandas()

    exp = []
    for u, grp in panel_pdf.groupby("user_id"):
        g = grp.set_index(pd.to_datetime(grp["date"])).sort_index()
        r = g["v"].rolling(f"{days}D", min_periods=2)
        exp.append(
            pd.DataFrame(
                {
                    "user_id": u,
                    "date": g["date"].values,
                    "exp_sum": r.sum().values,
                    "exp_n": r.count().values,  # same min_periods guard
                }
            )
        )
    expected = pd.concat(exp)
    m = out.merge(expected, on=["user_id", "date"], how="inner")
    assert len(m) == len(panel_pdf)
    # min_periods nulls line up
    assert (m["roll_sum"].isna() == m["exp_sum"].isna()).all()
    ok = m["roll_sum"].notna()
    assert np.allclose(m.loc[ok, "roll_sum"], m.loc[ok, "exp_sum"])
    assert (
        (m["roll_n"] == m["exp_n"]) | (m["roll_n"].isna() & m["exp_n"].isna())
    ).all()


def test_gap_fill_matches_pandas(spark):
    from sdg_big_data_spark.operators.windows import gap_fill

    rows = [
        ("u", dt.date(2020, 1, 1), 1.0),
        ("u", dt.date(2020, 1, 4), None),
        ("u", dt.date(2020, 1, 7), 7.0),
        ("v", dt.date(2020, 2, 1), None),
        ("v", dt.date(2020, 2, 3), 3.0),
    ]
    sdf = spark.createDataFrame(rows, schema="user_id string, date date, v double")
    out = (
        gap_fill(sdf, ["user_id"], "date", ["v"])
        .toPandas()
        .sort_values(["user_id", "date"])
        .reset_index(drop=True)
    )
    exp_frames = []
    pdf = pd.DataFrame(rows, columns=["user_id", "date", "v"])
    for u, grp in pdf.groupby("user_id"):
        g = grp.set_index(pd.to_datetime(grp["date"]))["v"]
        idx = pd.date_range(g.index.min(), g.index.max(), freq="D")
        filled = g.reindex(idx).ffill().bfill()
        exp_frames.append(
            pd.DataFrame({"user_id": u, "date": idx.date, "v_exp": filled.values})
        )
    expected = pd.concat(exp_frames).reset_index(drop=True)
    m = out.merge(expected, on=["user_id", "date"])
    assert len(m) == len(expected)
    assert np.allclose(m["v"], m["v_exp"])


def test_hash_sample_binomial_bounds_and_partition_invariance(spark):
    from sdg_big_data_spark.operators.sampling import hash_sample

    n, frac = 20_000, 0.1
    df = spark.range(n).withColumnRenamed("id", "k")
    s1 = hash_sample(df, "k", frac)
    got = s1.count()
    # binomial: mean 2000, sd ~42; allow 5 sd
    assert abs(got - n * frac) < 5 * (n * frac * (1 - frac)) ** 0.5

    ids1 = {r["k"] for r in s1.collect()}
    ids2 = {r["k"] for r in hash_sample(df.repartition(13), "k", frac).collect()}
    assert ids1 == ids2  # membership is a row property, not a partition one


def test_hash_bucket_safe_on_large_and_negative_keys(spark):
    """Regression (ADVICE r1): naive key*MIX wraps signed-64 for
    |key| ≳ 3.5e9 and Spark's % keeps sign — negative buckets made
    hash_sample keep ALL such rows. Buckets must stay in [0, 2^32) over
    the full long domain and sampling must stay near the fraction."""
    from sdg_big_data_spark.operators.sampling import hash_bucket, hash_sample

    n, frac = 20_000, 0.1
    big = spark.range(n).select((F.col("id") * 7 + 5_000_000_000).alias("k"))
    neg = spark.range(n).select((-F.col("id") * 11 - 3).alias("k"))
    for df in (big, neg):
        b = df.select(hash_bucket(F.col("k")).alias("b"))
        assert b.where((F.col("b") < 0) | (F.col("b") >= 2**32)).count() == 0
        got = hash_sample(df, "k", frac).count()
        assert abs(got - n * frac) < 6 * (n * frac * (1 - frac)) ** 0.5

    # identical to the simple (oracle-SQL) form on small positive keys
    sm = spark.range(1000).select(F.col("id").alias("k"))
    simple = sm.select(
        "k", ((F.col("k") * 2654435761) % (2**32)).alias("e")
    )
    got = sm.select("k", hash_bucket(F.col("k")).alias("g"))
    assert got.join(simple, "k").where(F.col("g") != F.col("e")).count() == 0


def test_stratified_hash_sample_caps(spark):
    from sdg_big_data_spark.operators.sampling import stratified_hash_sample

    df = spark.range(9_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_hash_sample(df, "s", "k", 500)
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"0", "1", "2"}
    for v in counts.values():
        # target 500 of 3000 per stratum; hash sampling is binomial around it
        assert 350 <= v <= 650


def test_winsorize_clips_to_quantiles(spark):
    from sdg_big_data_spark.operators.relational import winsorize

    vals = [float(i) for i in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], schema="x double")
    out = winsorize(df, "x", 0.05, 0.95).toPandas()["x"]
    lo, hi = np.percentile(vals, 5), np.percentile(vals, 95)
    assert out.min() == pytest.approx(lo)
    assert out.max() == pytest.approx(hi)
    assert ((out >= lo - 1e-9) & (out <= hi + 1e-9)).all()


def test_exact_dedup_idempotent(spark):
    from sdg_big_data_spark.operators.dedup import exact_dedup

    rows = [(i, "same text here" if i % 2 else f"unique {i}") for i in range(100)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    d1 = exact_dedup(df, "doc_id", "text")
    # one fingerprint for all duplicates; canonical = min id
    dup = [r for r in d1.collect() if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["canonical_id"] == 1 and dup[0]["n_copies"] == 50


def test_as_of_join_null_payload_does_not_leak(spark):
    """Regression (ADVICE r1): the latest right row's NULL payload column
    must stay NULL — an older right row's value must not leak through.
    The struct-carry form guarantees all payload columns come from ONE
    right row."""
    from sdg_big_data_spark.operators.joins import as_of_join

    right = spark.createDataFrame(
        [("u", 1, 10, 100), ("u", 5, 50, None), ("v", 2, 20, 200)],
        schema="k string, ts long, a long, b long",
    )
    left = spark.createDataFrame(
        [("u", 3, "e1"), ("u", 7, "e2"), ("v", 1, "e3"), ("w", 9, "e4")],
        schema="k string, ts long, ev string",
    )
    out = {
        r["ev"]: (r["a"], r["b"])
        for r in as_of_join(left, right, ["k"], "ts", ["a", "b"]).collect()
    }
    assert out["e1"] == (10, 100)  # latest right at ts<=3 is ts=1
    assert out["e2"] == (50, None)  # ts=5 row: b is NULL and must STAY NULL
    assert out["e3"] == (None, None)  # no right row at or before ts=1
    assert out["e4"] == (None, None)  # key never appears on the right


def test_global_rank_exact_and_partition_invariant(spark):
    from pyspark.sql.window import Window

    from sdg_big_data_spark.operators.windows import global_rank, partition_local_rank

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 251).cast("double").alias("s")
    )
    expected = {
        (r["k"], r["rank"])
        for r in df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("s").desc(), F.col("k").desc())),
        ).collect()
    }
    for parts in (1, 7):
        got = {
            (r["k"], r["rank"])
            for r in global_rank(df.repartition(parts), ["s", "k"]).collect()
        }
        assert got == expected

    # the narrow building block: local ranks are a 1..n_i sequence per
    # physical partition and never collide with a full shuffle's numbering
    lr = partition_local_rank(
        df.repartition(7), [F.col("s").desc(), F.col("k").desc()], rank_col="lr"
    )
    assert lr.count() == n
    assert lr.agg(F.max("lr")).collect()[0][0] <= n
    assert lr.where(F.col("lr") < 1).count() == 0


def test_grouped_prefix_sum_matches_window(spark):
    """Scalable grouped prefix sum == the textbook whole-group window,
    including on a heavily skewed group distribution."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sdg_big_data_spark.operators.windows import grouped_prefix_sum

    rng = np.random.default_rng(8)
    rows = []
    for i in range(5000):
        g = "big" if i % 10 else f"small{i % 7}"  # ~90% of rows in one group
        rows.append((i, g, int(rng.integers(1, 50))))
    df = spark.createDataFrame(rows, schema="id long, g string, v long").repartition(16)

    fast = grouped_prefix_sum(
        df, ["g"], [F.col("v").desc(), F.col("id").asc()], "v", cum_col="c"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = df.withColumn("c", F.sum("v").over(w).cast("double"))
    a = {(r["id"], r["c"]) for r in fast.collect()}
    b = {(r["id"], r["c"]) for r in ref.collect()}
    assert a == b


def test_grouped_prefix_sum_no_broadcast_variant(spark):
    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators.windows import grouped_prefix_sum

    df = spark.createDataFrame(
        [(i, i % 3, 1) for i in range(300)], schema="id long, g int, v int"
    )
    out = grouped_prefix_sum(
        df, ["g"], [F.col("id").asc()], "v", cum_col="c", broadcast_offsets=False
    )
    # each group is 100 rows of v=1 in id order -> cum c == rank within group
    top = out.where(F.col("c") == 100.0)
    assert top.count() == 3


def test_group_fixed_n_matches_plain_window(spark):
    """Two-phase pruned per-group sample == the textbook whole-group
    window, and is invariant to the input partitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sdg_big_data_spark.operators.sampling import group_fixed_n, hash_bucket

    rows = [(i, "g%d" % (i % 4), i * 3) for i in range(2000)]
    base = spark.createDataFrame(rows, schema="event_id long, g string, v long")

    def plain(df, n=25):
        w = Window.partitionBy("g").orderBy(
            hash_bucket(F.col("event_id")).asc(), F.col("event_id").asc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n).drop("rn")
        )

    want = {tuple(r) for r in plain(base).collect()}
    for parts in (1, 7, 32):
        got = {tuple(r) for r in group_fixed_n(base.repartition(parts), ["g"], 25, "event_id").collect()}
        assert got == want, f"partitioning {parts} changed the sample"
    assert len(want) == 4 * 25


def test_cumulative_share_scalable_matches_window(spark):
    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators import windows as W

    rows = [(i, "g%d" % (i % 3), float(1 + (i * 7) % 23)) for i in range(3000)]
    df = spark.createDataFrame(rows, schema="id long, g string, v double").repartition(8)

    fast = W.cumulative_share_scalable(
        df, [F.col("v").asc(), F.col("id").asc()], "v", by=["g"]
    )
    slow = W.cumulative_share(
        df.withColumn("__ord", F.struct("v", "id")), "__ord", "v", by=["g"]
    )
    a = {(r["id"], round(r["cum_share"], 9)) for r in fast.collect()}
    b = {(r["id"], round(r["cum_share"], 9)) for r in slow.collect()}
    assert a == b

    # global (by=()) form too — the case the plain window single-partitions
    g_fast = W.cumulative_share_scalable(df, [F.col("v").asc(), F.col("id").asc()], "v")
    g_slow = W.cumulative_share(
        df.withColumn("__ord", F.struct("v", "id")), "__ord", "v"
    )
    a = {(r["id"], round(r["cum_share"], 9)) for r in g_fast.collect()}
    b = {(r["id"], round(r["cum_share"], 9)) for r in g_slow.collect()}
    assert a == b


def test_stratified_split_exact_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators.sampling import stratified_split

    rows = [(i, "g%d" % (i % 3)) for i in range(1000)]
    base = spark.createDataFrame(rows, schema="id long, g string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}

    def run(df):
        out = stratified_split(df, ["g"], fr, "id")
        return {
            (r["g"], r["split"]): r["n"]
            for r in out.groupBy("g", "split").agg(F.count(F.lit(1)).alias("n")).collect()
        }, {(r["id"], r["split"]) for r in out.select("id", "split").collect()}

    counts, assign = run(base)
    # exact proportions per stratum (strata of 334/333/333)
    for g in ("g0", "g1", "g2"):
        nb = sum(v for (gg, _), v in counts.items() if gg == g)
        assert counts[(g, "train")] == int(nb * 0.8)
        assert counts[(g, "train")] + counts[(g, "val")] == int(nb * 0.9)
    # every row assigned exactly once
    assert len(assign) == 1000
    # partitioning must not change any row's assignment
    _, assign7 = run(base.repartition(7))
    assert assign7 == assign


def test_grouped_prefix_sum_handles_null_group_keys(spark):
    """pandas groupby drops NaN keys by default — a NULL group must still
    accumulate (not NaN out or vanish)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sdg_big_data_spark.operators.windows import grouped_prefix_sum

    rows = [(i, None if i % 3 == 0 else "g%d" % (i % 2), 1) for i in range(90)]
    df = spark.createDataFrame(rows, schema="id long, g string, v int").repartition(5)
    fast = grouped_prefix_sum(df, ["g"], [F.col("id").asc()], "v", cum_col="c")
    w = Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.withColumn("c", F.sum("v").over(w).cast("double"))
    a = {(r["id"], r["c"]) for r in fast.collect()}
    b = {(r["id"], r["c"]) for r in ref.collect()}
    assert a == b
    assert all(c is not None for _, c in a)


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """Linear trend + exact weekly pattern, zero noise: in the interior
    (edges distort the centered MA) the 7-row MA reproduces the linear
    trend exactly and the phase means recover the seasonal offsets, so
    residuals vanish."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sdg_big_data_spark.operators.windows import seasonal_decompose

    pattern = [3.0, -1.0, 2.0, -2.5, 0.5, -1.5, -0.5]  # sums to 0
    d0 = dt.date(2024, 1, 1)
    rows = [
        ("a", d0 + dt.timedelta(days=i), 10.0 + 0.5 * i + pattern[i % 7])
        for i in range(70)
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = seasonal_decompose(
        df, ["k"], ["day"], "v", period=7, half_window=3
    ).collect()
    by_day = {r["day"]: r for r in out}
    assert len(by_day) == 70
    interior = [r for r in out if d0 + dt.timedelta(days=3) <= r["day"] <= d0 + dt.timedelta(days=66)]
    assert len(interior) == 64
    for r in interior:
        i = (r["day"] - d0).days
        # centered 7-row MA of (linear + zero-sum weekly) == the linear part
        assert abs(r["trend"] - (10.0 + 0.5 * i)) < 1e-9
    # seasonal offsets: equal within phase, zero-sum across phases
    seas = {}
    for r in out:
        seas.setdefault((r["day"] - d0).days % 7, set()).add(round(r["seasonal"], 9))
    assert all(len(v) == 1 for v in seas.values())
    assert abs(sum(next(iter(v)) for v in seas.values())) < 1e-7


def test_interpolate_linear_matches_pandas(spark):
    """Differential vs pandas interpolate(method='values'): interior null
    runs on the line, leading runs bfilled, trailing runs ffilled."""
    import numpy as np
    import pandas as pd

    from sdg_big_data_spark.operators.windows import interpolate_linear

    rng = np.random.RandomState(11)
    rows = []
    for key in ("a", "b", "c"):
        ts = np.sort(rng.choice(np.arange(1000, 9000), size=40, replace=False))
        vals = rng.uniform(-5, 5, size=40)
        mask = rng.rand(40) < 0.35
        for t, v, m in zip(ts, vals, mask):
            rows.append((key, int(t), None if m else float(v)))
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"])

    got = (
        interpolate_linear(
            spark.createDataFrame(pdf), ["k"], "t", "v", out_col="vi"
        )
        .select("k", "t", "vi")
        .toPandas()
        .set_index(["k", "t"])
        .sort_index()["vi"]
    )
    want = (
        pdf.set_index("t")
        .groupby("k")["v"]
        .apply(
            lambda s: s.interpolate(method="values", limit_direction="both")
        )
        .sort_index()
    )
    assert np.allclose(got.values, want.values, atol=1e-9)


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Randomized differential vs pandas.merge_asof(direction='backward',
    by=key): identical payload attachment including no-prior-row nulls
    and the inclusive at-equal-timestamp case."""
    import numpy as np
    import pandas as pd

    from sdg_big_data_spark.operators.joins import as_of_join

    rng = np.random.RandomState(17)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 120),
        "ts": rng.randint(0, 1000, 120),
        "lid": np.arange(120),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 5, 60),
        "ts": rng.choice(np.arange(0, 1000, 7), 60, replace=False),
        "payload": rng.uniform(0, 1, 60).round(6),
    })
    # pandas requires sorted ts; dedup (k, ts) on the right so "latest at
    # equal ts" is unambiguous in both engines
    right = right.drop_duplicates(["k", "ts"])
    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    ).set_index("lid")["payload"]
    got_rows = as_of_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        keys=["k"], ts_col="ts", payload_cols=["payload"],
    ).collect()
    got = {r["lid"]: r["payload"] for r in got_rows}
    assert len(got) == 120
    for lid, w in want.items():
        g = got[lid]
        assert (pd.isna(w) and g is None) or (g is not None and abs(g - w) < 1e-12), (
            lid, g, w
        )


def test_interpolate_nearest_categorical(spark):
    """True nearest-observation fill of a CATEGORICAL (cluster-id) column:
    prev/next distance comparison, exact ties -> previous, edges clamp —
    the faithful form of the reference's interpolate('nearest') step
    (labeling.py:132-142) that ffill-then-bfill only approximates."""
    from sdg_big_data_spark.operators.windows import interpolate_nearest

    rows = [
        # k, t, label
        ("a", 0, "x"), ("a", 1, None), ("a", 2, None), ("a", 3, None),
        ("a", 4, "y"),  # t=1 -> x (d1 vs 3), t=2 -> x (tie 2/2), t=3 -> y
        ("b", 0, None), ("b", 1, "z"), ("b", 2, None),  # edge clamps
    ]
    df = spark.createDataFrame(rows, "k string, t long, v string")
    got = {
        (r["k"], r["t"]): r["v"]
        for r in interpolate_nearest(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 1)] == "x"
    assert got[("a", 2)] == "x"  # tie -> previous
    assert got[("a", 3)] == "y"
    assert got[("b", 0)] == "z" and got[("b", 2)] == "z"


def test_gap_fill_nearest_differs_from_ffill_on_closer_next(spark):
    from sdg_big_data_spark.operators.windows import gap_fill

    rows = [("a", "2024-01-01", "c1"), ("a", "2024-01-08", "c2")]
    df = spark.createDataFrame(rows, "k string, d string, label string")
    near = {
        str(r["d"]): r["label"]
        for r in gap_fill(df, ["k"], "d", ["label"], method="nearest").collect()
    }
    ff = {
        str(r["d"]): r["label"]
        for r in gap_fill(df, ["k"], "d", ["label"]).collect()
    }
    # Jan 6 is 5 days from c1 and 2 days from c2: nearest says c2,
    # ffill-then-bfill says c1
    assert near["2024-01-06"] == "c2" and ff["2024-01-06"] == "c1"
    assert near["2024-01-04"] == "c1"  # 3 vs 4 days -> previous
    assert len(near) == 8  # full daily spine


def test_gini_known_values(spark):
    """Gini rank formula sanity: equal values -> 0; against a numpy
    replay on a random fixture."""
    import numpy as np

    from sdg_big_data_spark.plans import catalog  # noqa: F401  (formula lives in the query)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def gini_spark(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k long, x double"
        )
        w = Window.partitionBy(F.lit(1)).orderBy(F.col("x").asc(), F.col("k").asc())
        r = df.select("x", F.row_number().over(w).cast("long").alias("i"))
        row = r.agg(
            (2.0 * F.sum(F.col("i") * F.col("x")) / (F.count(F.lit(1)) * F.sum("x"))
             - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))).alias("g")
        ).collect()[0]
        return row["g"]

    assert abs(gini_spark([5.0] * 40)) < 1e-12  # perfect equality
    rng = np.random.RandomState(2)
    v = rng.lognormal(0, 1.0, 200)
    x = np.sort(v)
    n = len(x)
    want = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert abs(gini_spark(v) - want) < 1e-9


# --- randomized gap-fill / interpolation differentials (r3 judge task 7:
# the reference's labeling.py:132-142 reindex->nearest->ffill->bfill
# semantics are the subtlest window contract; one fixture shape is not
# proof. Each seed generates hostile shapes — all-null keys, single
# observations, leading/trailing null runs, exact-tie interior gaps —
# and checks against an independent per-key reference implementation.)


def _random_panel(seed: int):
    rng = random.Random(seed)
    rows = []
    for k in range(rng.randint(1, 7)):
        key = f"k{k}"
        start = dt.date(2021, 1, 1) + dt.timedelta(days=rng.randint(0, 40))
        days = sorted(rng.sample(range(0, 30), rng.randint(1, 12)))
        null_p = rng.choice([0.0, 0.3, 0.6, 1.0])
        for d in days:
            v = None if rng.random() < null_p else round(rng.uniform(-50, 50), 3)
            rows.append((key, start + dt.timedelta(days=d), v))
    return rows


def _nearest_ref(day_vals: list[tuple[int, object]]) -> list[object]:
    """Naive nearest-observation fill, ties -> previous (the operator's
    declared contract), written independently of the Spark expressions."""
    obs = [(d, v) for d, v in day_vals if v is not None]
    out = []
    for d, v in day_vals:
        if v is not None or not obs:
            out.append(v)
            continue
        prev = max((o for o in obs if o[0] <= d), default=None, key=lambda o: o[0])
        nxt = min((o for o in obs if o[0] > d), default=None, key=lambda o: o[0])
        if prev is None:
            out.append(nxt[1])
        elif nxt is None or (d - prev[0]) <= (nxt[0] - d):
            out.append(prev[1])
        else:
            out.append(nxt[1])
    return out


@pytest.mark.parametrize("seed", range(6))
def test_gap_fill_ffill_bfill_matches_pandas_randomized(spark, seed):
    from sdg_big_data_spark.operators.windows import gap_fill

    rows = _random_panel(seed)
    sdf = spark.createDataFrame(rows, schema="user_id string, date date, v double")
    out = (
        gap_fill(sdf, ["user_id"], "date", ["v"])
        .toPandas()
        .sort_values(["user_id", "date"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["user_id", "date", "v"])
    exp_frames = []
    for u, grp in pdf.groupby("user_id"):
        g = grp.set_index(pd.to_datetime(grp["date"]))["v"]
        idx = pd.date_range(g.index.min(), g.index.max(), freq="D")
        filled = g.reindex(idx).ffill().bfill()
        exp_frames.append(
            pd.DataFrame({"user_id": u, "date": idx.date, "v_exp": filled.values})
        )
    expected = pd.concat(exp_frames).reset_index(drop=True)
    m = out.merge(expected, on=["user_id", "date"], how="outer")
    assert len(m) == len(expected) == len(out)
    got, exp = m["v"].astype(float), m["v_exp"].astype(float)
    both_nan = got.isna() & exp.isna()
    assert (both_nan | np.isclose(got, exp)).all()


@pytest.mark.parametrize("seed", range(6))
def test_gap_fill_nearest_matches_naive_reference(spark, seed):
    from sdg_big_data_spark.operators.windows import gap_fill

    rows = _random_panel(seed)
    sdf = spark.createDataFrame(rows, schema="user_id string, date date, v double")
    out = (
        gap_fill(sdf, ["user_id"], "date", ["v"], method="nearest")
        .toPandas()
        .sort_values(["user_id", "date"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["user_id", "date", "v"])
    exp_frames = []
    for u, grp in pdf.groupby("user_id"):
        g = grp.set_index(pd.to_datetime(grp["date"]))["v"]
        idx = pd.date_range(g.index.min(), g.index.max(), freq="D")
        re = g.reindex(idx)
        day_vals = [
            (int(d.value // 86_400_000_000_000), None if pd.isna(v) else v)
            for d, v in re.items()
        ]
        exp_frames.append(
            pd.DataFrame(
                {"user_id": u, "date": idx.date, "v_exp": _nearest_ref(day_vals)}
            )
        )
    expected = pd.concat(exp_frames).reset_index(drop=True)
    m = out.merge(expected, on=["user_id", "date"], how="outer")
    assert len(m) == len(expected) == len(out)
    got, exp = m["v"].astype(float), m["v_exp"].astype(float)
    both_nan = got.isna() & exp.isna()
    assert (both_nan | np.isclose(got, exp)).all()


@pytest.mark.parametrize("seed", range(6))
def test_interpolate_linear_matches_pandas_randomized(spark, seed):
    from sdg_big_data_spark.operators.windows import interpolate_linear

    rows = _random_panel(seed)
    # numeric order column (day index), unique per key by construction
    rows_n = [(k, (d - dt.date(1970, 1, 1)).days, v) for k, d, v in rows]
    sdf = spark.createDataFrame(rows_n, schema="user_id string, t long, v double")
    out = (
        interpolate_linear(sdf, ["user_id"], "t", "v", out_col="v_out")
        .toPandas()
        .sort_values(["user_id", "t"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows_n, columns=["user_id", "t", "v"])
    exp_frames = []
    for u, grp in pdf.groupby("user_id"):
        g = grp.sort_values("t").set_index("t")["v"]
        if g.notna().any():
            filled = g.interpolate(method="index", limit_direction="both")
        else:
            filled = g  # all-null key stays null
        exp_frames.append(
            pd.DataFrame({"user_id": u, "t": g.index, "v_exp": filled.values})
        )
    expected = pd.concat(exp_frames).reset_index(drop=True)
    m = out.merge(expected, on=["user_id", "t"], how="outer")
    assert len(m) == len(expected) == len(out)
    got, exp = m["v_out"].astype(float), m["v_exp"].astype(float)
    both_nan = got.isna() & exp.isna()
    assert (both_nan | np.isclose(got, exp)).all()


# ---------------------------------------------------------------------------
# Hypothesis-randomized differentials for the calendar-fill family
# (`labeling.py:132-142` is the subtlest semantics in SURVEY §7.5; the
# fixed-seed differentials above cover one fixture shape each — these let
# hypothesis drive key counts, date gaps, null runs, and tie distances).
# Each example is one Spark roundtrip, so max_examples stays small; the
# oracle is an independent pure-Python reimplementation, not pandas, so a
# shared misreading of the pandas docs can't cancel out.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fill_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,  # CI stability: the 12 cases are a fixed corpus
)


def _nearest_fill_oracle(days, obs):
    """Nearest-observation fill over a daily spine: for each spine day,
    the value of the closest observed day; exact ties -> PREVIOUS."""
    out = {}
    obs_days = sorted(obs)
    for d in days:
        if d in obs:
            out[d] = obs[d]
            continue
        prev = max((o for o in obs_days if o < d), default=None)
        nxt = min((o for o in obs_days if o > d), default=None)
        if prev is None and nxt is None:
            out[d] = None
        elif prev is None:
            out[d] = obs[nxt]
        elif nxt is None:
            out[d] = obs[prev]
        else:
            out[d] = obs[prev] if (d - prev) <= (nxt - d) else obs[nxt]
    return out


@st.composite
def _panel(draw, values):
    """{key: {day: value}} with 1-3 keys, 1-12 unique days each."""
    n_keys = draw(st.integers(1, 3))
    panel = {}
    for k in range(n_keys):
        days = draw(
            st.sets(st.integers(0, 30), min_size=1, max_size=12)
        )
        panel[f"k{k}"] = {d: draw(values) for d in sorted(days)}
    return panel


@_fill_settings
@given(_panel(st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))))
def test_gap_fill_nearest_matches_oracle(spark, panel):
    import datetime as dt

    from sdg_big_data_spark.operators.windows import gap_fill

    d0 = dt.date(2021, 3, 1)
    rows = [
        (k, d0 + dt.timedelta(days=d), v)
        for k, obs in panel.items()
        for d, v in obs.items()
    ]
    sdf = spark.createDataFrame(rows, schema="k string, date date, v string")
    got = {
        (r["k"], r["date"]): r["v"]
        for r in gap_fill(sdf, ["k"], "date", ["v"], method="nearest").collect()
    }
    for k, obs in panel.items():
        lo, hi = min(obs), max(obs)
        spine = range(lo, hi + 1)
        # gap_fill 'nearest' treats an observed NULL as absent (the spine
        # join can't distinguish a null observation from no row), so the
        # oracle fills from non-null observations only
        nn = {d: v for d, v in obs.items() if v is not None}
        want = _nearest_fill_oracle(list(spine), nn)
        for d in spine:
            date = d0 + dt.timedelta(days=d)
            assert (k, date) in got, f"missing spine row {k} {date}"
            assert got[(k, date)] == want[d], (
                f"{k} day {d}: got {got[(k, date)]!r} want {want[d]!r} "
                f"(obs={obs})"
            )


@_fill_settings
@given(_panel(st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))))
def test_gap_fill_ffill_bfill_matches_oracle(spark, panel):
    import datetime as dt

    from sdg_big_data_spark.operators.windows import gap_fill

    d0 = dt.date(2021, 3, 1)
    rows = [
        (k, d0 + dt.timedelta(days=d), v)
        for k, obs in panel.items()
        for d, v in obs.items()
    ]
    sdf = spark.createDataFrame(rows, schema="k string, date date, v string")
    got = {
        (r["k"], r["date"]): r["v"]
        for r in gap_fill(sdf, ["k"], "date", ["v"]).collect()
    }
    for k, obs in panel.items():
        lo, hi = min(obs), max(obs)
        nn = {d: v for d, v in obs.items() if v is not None}
        obs_days = sorted(nn)
        for d in range(lo, hi + 1):
            if d in nn:
                want = nn[d]
            else:
                prev = max((o for o in obs_days if o < d), default=None)
                nxt = min((o for o in obs_days if o > d), default=None)
                want = nn[prev] if prev is not None else (
                    nn[nxt] if nxt is not None else None
                )
            date = d0 + dt.timedelta(days=d)
            assert got[(k, date)] == want, (
                f"{k} day {d}: got {got[(k, date)]!r} want {want!r} (obs={obs})"
            )


@_fill_settings
@given(
    _panel(
        st.one_of(
            st.none(),
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        )
    )
)
def test_interpolate_linear_matches_oracle(spark, panel):
    from sdg_big_data_spark.operators.windows import interpolate_linear

    rows = [
        (k, d, v) for k, obs in panel.items() for d, v in obs.items()
    ]
    sdf = spark.createDataFrame(rows, schema="k string, t int, v double")
    got = {
        (r["k"], r["t"]): r["vi"]
        for r in interpolate_linear(sdf, ["k"], "t", "v", out_col="vi").collect()
    }
    for k, obs in panel.items():
        nn = {d: v for d, v in obs.items() if v is not None}
        obs_days = sorted(nn)
        for d in obs:  # interpolate fills NULLS IN PLACE (no spine)
            if d in nn:
                want = nn[d]
            else:
                prev = max((o for o in obs_days if o < d), default=None)
                nxt = min((o for o in obs_days if o > d), default=None)
                if prev is None and nxt is None:
                    want = None
                elif prev is None:
                    want = nn[nxt]
                elif nxt is None:
                    want = nn[prev]
                else:
                    want = nn[prev] + (nn[nxt] - nn[prev]) * (d - prev) / (
                        nxt - prev
                    )
            g = got[(k, d)]
            if want is None:
                assert g is None, f"{k} t={d}: got {g!r} want None (obs={obs})"
            else:
                assert g is not None and abs(g - want) < 1e-9, (
                    f"{k} t={d}: got {g!r} want {want!r} (obs={obs})"
                )


# --- round-4b operators: randomized differentials ---------------------------

_r4_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)


@_r4_settings
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=120)
)
def test_cm_sketch_overestimates_and_totals(spark, keys):
    """Count-min invariants on random multisets: every point estimate
    upper-bounds the true count, and the cell table sums to depth·rows."""
    import pyspark.sql.functions as F

    from sdg_big_data_spark.operators.relational import cm_estimate, cm_sketch

    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    sk = cm_sketch(df, "k", depth=3, width=32)
    total = sk.agg(F.sum("cnt")).collect()[0][0]
    assert total == 3 * len(keys)
    est = {
        r["k"]: r["cm_est"]
        for r in cm_estimate(
            sk, df.select("k").distinct(), "k", depth=3, width=32
        ).collect()
    }
    from collections import Counter

    exact = Counter(keys)
    for k, n in exact.items():
        assert est[k] >= n


@_r4_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # quasi value
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_k_anonymity_mask_iff_class_small(spark, rows):
    """k-anonymity on random quasi-identifier combos: quasi columns are
    NULL exactly when the combination's class size < k, and n_class is
    the true per-combination count."""
    from collections import Counter

    from sdg_big_data_spark.operators.quality import k_anonymity

    k = 3
    data = [(i, qa, qb) for i, (qa, qb) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, qa long, qb long")
    sizes = Counter((qa, qb) for _, qa, qb in data)
    out = {
        r["id"]: r
        for r in k_anonymity(df, ["qa", "qb"], k=k, id_col="id").collect()
    }
    assert len(out) == len(data)
    for i, qa, qb in data:
        n = sizes[(qa, qb)]
        r = out[i]
        assert r["n_class"] == n
        if n >= k:
            assert r["is_k_anon"] and r["qa"] == qa and r["qb"] == qb
        else:
            assert not r["is_k_anon"] and r["qa"] is None and r["qb"] is None


@_r4_settings
@given(
    st.lists(
        st.sampled_from(["alpha beta gamma", "delta epsilon zeta", ""]),
        min_size=2,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=1),
)
def test_dsir_row_order_invariant(spark, texts, rotate):
    """DSIR log-weights are a pure function of the corpus MULTISET —
    reordering/rotating the input rows changes nothing (the fit
    histogram is exact integer counts; scoring is per-row)."""
    from sdg_big_data_spark.operators.quality import dsir_logweights
    import pyspark.sql.functions as F

    rows = [(i, "en" if i % 2 == 0 else "de", t) for i, t in enumerate(texts)]
    perm = rows[len(rows) // 2 :] + rows[: len(rows) // 2] if rotate else rows
    a = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    b = spark.createDataFrame(perm, "doc_id long, lang string, text string").repartition(7)
    wa = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_logweights(a, F.col("lang") == "en", buckets=32).collect()
    }
    wb = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_logweights(b, F.col("lang") == "en", buckets=32).collect()
    }
    assert wa == wb


# --- round 5: k-means, bigram LM, chi2 drift differentials ------------------


def _lloyd_ref(vecs: dict[int, list[float]], k: int, n_iter: int, dp: int = 6):
    """Independent pure-Python Lloyd replay of clustering.kmeans's exact
    contract: init = k smallest (knuth-hash, id) rows, argmin with
    lowest-cluster tiebreak, updated centroids floor-rounded to the
    1e-dp grid, emptied clusters keep their previous centroid."""
    import math as m

    def kh(x):
        return (x % 2**32) * 2654435761 % 2**32

    ids = sorted(vecs, key=lambda i: (kh(i), i))[:k]
    cents = [list(map(float, vecs[i])) for i in ids]

    def assign():
        out = {}
        for i, v in vecs.items():
            best, bd = None, None
            for c, cv in enumerate(cents):
                d = sum((a - b) ** 2 for a, b in zip(v, cv))
                if bd is None or d < bd:
                    best, bd = c, d
            out[i] = best
        return out

    for _ in range(n_iter):
        a = assign()
        sums: dict[int, list[float]] = {}
        cnts: dict[int, int] = {}
        for i, c in a.items():
            s = sums.setdefault(c, [0.0] * len(vecs[i]))
            for j, x in enumerate(vecs[i]):
                s[j] += float(x)
            cnts[c] = cnts.get(c, 0) + 1
        for c, s in sums.items():
            cents[c] = [
                m.floor((x / cnts[c]) * 10**dp + 0.5) / 10**dp for x in s
            ]
    return assign()


@pytest.mark.parametrize("seed", range(4))
def test_kmeans_matches_pure_python_lloyd(spark, seed):
    """Randomized differential: the distributed kmeans assignment after
    3 rounds equals an independently-written driver-side Lloyd replay
    (same init rule, same rounding grid, same tiebreak)."""
    import numpy as np

    from sdg_big_data_spark.operators.clustering import kmeans

    rng = np.random.RandomState(seed)
    n, dim, k = 60, 6, 3
    vecs = {int(i): [float(x) for x in rng.randn(dim).round(3)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    assigned, _ = kmeans(df, k=k, max_iter=3, tol=0.0, round_dp=6)
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    want = _lloyd_ref(vecs, k, 3)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_bigram_ppl_matches_pure_python_model(spark, seed):
    """Randomized differential: per-doc interpolated bigram perplexity
    equals an independent Python count model over the same tokens."""
    import math as m
    import random

    from sdg_big_data_spark.operators.quality import bigram_perplexity

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for i in range(30)
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in bigram_perplexity(df, "doc_id", "text", lam=0.7).collect()
    }
    toks = {i: t.split() for i, t in docs.items() if t}
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values())
    for i, t in toks.items():
        pairs = list(zip(t, t[1:]))
        if not pairs:
            assert i not in got  # <2 tokens: excluded by contract
            continue
        nll = [
            -m.log(0.7 * bi[(a, b)] / uni[a] + 0.3 * uni[b] / total)
            for a, b in pairs
        ]
        want = round(m.exp(sum(nll) / len(nll)), 4)
        assert got[i][0] == len(pairs)
        assert abs(got[i][1] - want) < 1e-9, (i, got[i], want)


@pytest.mark.parametrize("seed", range(3))
def test_chi2_drift_matches_hand_model(spark, seed):
    """Randomized differential: chi2_categorical_drift equals the
    Laplace-smoothed hand formula, and every category from EITHER side
    appears exactly once."""
    import random

    from sdg_big_data_spark.operators.quality import chi2_categorical_drift

    rng = random.Random(seed)
    cats = ["a", "b", "c", "d", "e"]
    ref = [rng.choice(cats[:4]) for _ in range(rng.randint(5, 40))]
    cur = [rng.choice(cats[1:]) for _ in range(rng.randint(5, 40))]
    rdf = spark.createDataFrame([(c,) for c in ref], "cat string")
    cdf = spark.createDataFrame([(c,) for c in cur], "cat string")
    got = {r["category"]: r for r in chi2_categorical_drift(rdf, cdf, "cat").collect()}
    union = set(ref) | set(cur)
    assert set(got) == union
    k = len(union)
    t_ref, t_cur = len(ref), len(cur)
    for c in union:
        nr, nc = ref.count(c), cur.count(c)
        exp = (nr + 0.5) / (t_ref + 0.5 * k) * t_cur
        term = (nc - exp) ** 2 / exp
        assert got[c]["n_ref"] == nr and got[c]["n_cur"] == nc
        assert abs(got[c]["expected_cur"] - round(exp, 6)) < 1e-9
        assert abs(got[c]["chi2_term"] - round(term, 6)) < 1e-9
