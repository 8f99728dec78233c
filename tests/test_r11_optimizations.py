"""Round-11 optimization invariants.

Each r11 change that rewired an operator's internals gets a focused
gate here, so a future refactor can't silently reintroduce the cost:

- ``ngrams`` is now ONE compiled-regex pass over the space-joined token
  string (guide §4.1: prefer built-ins over interpreted higher-order
  lambdas) — it must stay element-for-element identical to the
  positional ``transform(sequence, concat_ws(slice))`` reference form,
  including order, multiplicity, sub-n inputs, empties and nulls;
- ``funnel`` dropped the ``array_sort(collect_list(struct))`` history
  (nothing consumed it in order — every step time is an order-free
  min) for per-step timestamp arrays + a plain conditional min; the
  counts must match the naive sequential-min-after reference;
- ``read_table`` memoizes the RESOLVED PLAN per (session, dir,
  file-signature) — a lazy plan, never row data: repeated calls must
  return the same object, and any file change must invalidate.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def _reference_ngrams(t, n):
    """The pre-r11 positional form (kept as the test reference)."""
    from sdg_big_data_spark.functions.text import let

    def body(tc):
        k = F.size(tc) - (n - 1)
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(tc, i + 1, n)),
            )
        )

    return let(t, body)


def test_ngrams_regex_matches_positional_reference(spark):
    from sdg_big_data_spark.functions import text as T

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "one two"),  # fewer than n=3 tokens
        (2, "single"),
        (3, ""),  # empty -> empty token array
        (4, None),  # null text -> null tokens -> null grams
        (5, "it's a dog's life it's fine"),  # apostrophe tokens
        (6, "a a a a a"),  # repeated tokens (multiplicity must match)
        (7, "num 42 mix3d t0kens 7"),
        (8, "x " * 200),  # long doc
        (9, "Á L'école!! http://x.io déjà-vu 9"),  # normalize first
    ]
    df = spark.createDataFrame(texts, schema="id long, text string")
    toks = df.select("id", T.tokenize(F.col("text")).alias("t"))
    for n in (2, 3, 5, 8):
        got = toks.select("id", T.ngrams(F.col("t"), n).alias("g"))
        ref = toks.select("id", _reference_ngrams(F.col("t"), n).alias("g"))
        j = got.alias("a").join(ref.alias("b"), "id")
        bad = j.where(~F.col("a.g").eqNullSafe(F.col("b.g"))).count()
        assert bad == 0, f"ngrams(n={n}) diverged from positional form"


def test_funnel_matches_sequential_min_reference(spark):
    """Counts must equal the naive per-user sequential scan (strictly-
    after semantics), incl. users who skip steps / do them out of
    order / repeat them."""
    import itertools

    from sdg_big_data_spark.operators.sequence import funnel

    steps = ["view", "click", "purchase"]
    rows = []
    eid = 0
    # all orderings of up to 4 events over the 3 types, multiple users
    evs = ["view", "click", "purchase", "view", "click", "other"]
    for u, perm in enumerate(itertools.permutations(range(6), 4)):
        for k, i in enumerate(perm):
            rows.append((u, evs[i], k * 10))
            eid += 1
    # a user with simultaneous view+click (strictly-after must reject)
    u0 = 10_000
    rows += [(u0, "view", 0), (u0, "click", 0), (u0, "purchase", 5)]
    df = spark.createDataFrame(rows, schema="user_id long, event_type string, ts long")
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(df, steps).collect()
    }
    # naive python reference
    from collections import defaultdict

    hist = defaultdict(list)
    for u, t, ts in rows:
        hist[u].append((ts, t))
    exp = {s: 0 for s in steps}
    for u, h in hist.items():
        prev = None
        for s in steps:
            cand = [ts for ts, t in h if t == s and (prev is None or ts > prev)]
            if not cand:
                break
            prev = min(cand)
            exp[s] += 1
    assert got == exp


def test_pq_encode_matches_expression_form(spark):
    """The r11 numpy encode must be code-for-code identical to the
    pre-r11 expression form (per-subspace interpreted fold + first-min
    argmin), and stay a map-only ArrowEvalPython projection."""
    from sdg_big_data_spark.functions.text import let
    from sdg_big_data_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cbs = similarity.collect_pq_codebooks(
        similarity.train_pq_codebooks(emb, m=4, dim=64)
    )
    sub = len(cbs[0][0][1])

    def expression_codes(df):  # the pre-r11 form, kept as the reference
        def argmin_code(d_arr, cells_arr):
            return let(
                d_arr,
                lambda a: F.element_at(
                    cells_arr, F.array_position(a, F.array_min(a)).cast("int")
                ),
            )

        codes = []
        for j, cb in enumerate(cbs):
            d_arr = similarity._sub_dist_arr(
                F.col("embedding"), j, sub, [cent for _, cent in cb]
            )
            codes.append(argmin_code(d_arr, F.lit([int(c) for c, _ in cb])))
        return df.withColumn("pq_ref", F.array(*codes))

    got = similarity.pq_encode(emb, cbs).select("vec_id", "pq_code")
    ref = expression_codes(emb).select("vec_id", "pq_ref")
    j = got.join(ref, "vec_id")
    bad = j.where(~F.col("pq_code").eqNullSafe(F.col("pq_ref"))).count()
    assert bad == 0, "numpy pq_encode diverged from the expression fold"
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    for node in ("Exchange", "Join", "BatchEvalPython"):
        assert node not in plan, f"pq_encode is no longer map-only: {node}"


def test_arrow_pair_scores_match_expression_forms(spark):
    """``dot_arrow``/``cosine_arrow`` must be BITWISE equal to the
    interpreted zip_with/aggregate folds they replaced (per-dimension
    index-order accumulation; eqNullSafe catches NaN and null parity)."""
    from sdg_big_data_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pairs = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("cv")
    ).join(F.broadcast(q), F.col("qid") != F.col("nid"))
    both = pairs.select(
        "qid",
        "nid",
        S.cosine(F.col("qv"), F.col("cv")).alias("c_ref"),
        S.cosine_arrow(F.col("qv"), F.col("cv")).alias("c_new"),
        S.dot(F.col("qv"), F.col("cv")).alias("d_ref"),
        S.dot_arrow(F.col("qv"), F.col("cv")).alias("d_new"),
    )
    bad = both.where(
        ~F.col("c_ref").eqNullSafe(F.col("c_new"))
        | ~F.col("d_ref").eqNullSafe(F.col("d_new"))
    ).count()
    assert bad == 0, "Arrow pair kernels diverged from the expression folds"


def test_hyperplane_bucket_matches_expression_form(spark):
    """The vectorized bucket must reproduce the expression form's bucket
    for every row: same fold-order projections → same sign bits (and a
    null vector keeps bucket 0)."""
    from sdg_big_data_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def expression_bucket(vec, dim, n_planes):  # the pre-r11 form
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            comps = F.array(
                *[
                    F.lit(
                        (((p * 1_000_003 + j) * S._HP_MIX_A + S._HP_MIX_B)
                         % 2_000_001) / 1_000_000.0 - 1.0
                    )
                    for j in range(dim)
                ]
            )
            proj = S.dot(vec, comps)
            bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        return bucket

    for n_planes in (4, 8):
        both = emb.select(
            expression_bucket(F.col("embedding"), 64, n_planes).alias("b_ref"),
            S.hyperplane_bucket(F.col("embedding"), 64, n_planes).alias("b_new"),
        )
        bad = both.where(~F.col("b_ref").eqNullSafe(F.col("b_new"))).count()
        assert bad == 0, f"bucket diverged at n_planes={n_planes}"


def test_lsh_bucket_udf_not_duplicated_by_join_null_filter(spark):
    """Guide §4.4 fence: the planner derives an isnotnull() filter for
    the bucket equi-join key and, for a deterministic UDF, pushes it
    below the projection — evaluating the bucket UDF twice per side
    (observed as 5 ArrowEvalPython nodes). The nondeterministic fence
    must keep it at one evaluation per side + one pair scorer."""
    from sdg_big_data_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = S.lsh_topk(emb, emb.where("vec_id < 5"), dim=64, k=5, n_planes=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = plan.count("ArrowEvalPython")
    assert n <= 3, f"bucket UDF duplicated again: {n} ArrowEvalPython nodes"


def test_read_table_plan_memo_hits_and_invalidates(spark, tmp_path):
    from sdg_big_data_spark.sources.readers import read_table

    src = "/root/testdata/sf0.001/nation.parquet"
    d = str(tmp_path / "sf")
    os.makedirs(d)
    dst = os.path.join(d, "nation.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    df1 = read_table(spark, d, "nation")
    df2 = read_table(spark, d, "nation")
    assert df1 is df2, "repeat read_table should return the memoized plan"
    n = df1.count()
    # mutate the file -> signature changes -> fresh resolve
    os.utime(dst if os.path.isfile(dst) else os.path.join(
        dst, os.listdir(dst)[0]
    ))
    df3 = read_table(spark, d, "nation")
    assert df3 is not df1, "file change must invalidate the plan memo"
    assert df3.count() == n
