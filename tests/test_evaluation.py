"""Unit tests for the H/W-labeling quality gate (macro-F1 / Cohen's κ /
balanced bootstrap) — hand-computed sklearn-semantics expectations on
tiny fixtures (sklearn itself isn't in the container), plus determinism
and genuine-resampling properties of the bootstrap.

Reference semantics under test: `08-optimization.Rmd:74-125` —
f1_score(labels=['H','W'], average='macro') after filter_o,
cohen_kappa_score(labels=['H','W']), 100-resample balanced bootstrap.
"""

from __future__ import annotations

import pytest

from sdg_big_data_spark.operators import evaluation


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(i, t, p) for i, (t, p) in enumerate(pairs)],
        schema="user_id long, truth string, pred string",
    )


def test_classification_metrics_hand_computed(spark):
    # confusion (truth rows × pred cols) over H/W/O after filter_o:
    #   H: HH=3 HW=1 HO=1 | W: WH=1 WW=2 WO=0 | O: OH=1 OW=0 (OO dropped)
    pairs = (
        [("H", "H")] * 3
        + [("H", "W")]
        + [("H", "O")]
        + [("W", "H")]
        + [("W", "W")] * 2
        + [("O", "H")]
        + [("O", "O")] * 4  # filter_o removes these
    )
    out = evaluation.classification_metrics(
        _rows(spark, pairs), "truth", "pred"
    ).collect()[0]
    assert out["n"] == 9
    assert out["accuracy"] == pytest.approx(5 / 9)
    # H: P=3/5, R=3/5 -> F1=0.6 ; W: P=2/3, R=2/3 -> F1=2/3
    assert out["f1_H"] == pytest.approx(0.6)
    assert out["f1_W"] == pytest.approx(2 / 3)
    assert out["macro_f1"] == pytest.approx((0.6 + 2 / 3) / 2)


def test_classification_metrics_zero_division(spark):
    # pred never says W -> precision_W undefined -> sklearn zero_division=0
    pairs = [("H", "H"), ("W", "H"), ("W", "H")]
    out = evaluation.classification_metrics(
        _rows(spark, pairs), "truth", "pred"
    ).collect()[0]
    assert out["f1_W"] == 0.0
    assert out["f1_H"] == pytest.approx(2 * (1 / 3) * 1 / ((1 / 3) + 1))


def test_cohen_kappa_hand_computed(spark):
    # restricted to {H,W}: n=10, agree=7; a: 6H 4W, b: 5H 5W
    # p_o=0.7, p_e=0.6*0.5+0.4*0.5=0.5, kappa=(0.7-0.5)/0.5=0.4
    pairs = (
        [("H", "H")] * 4
        + [("H", "W")] * 2
        + [("W", "H")]
        + [("W", "W")] * 3
        + [("O", "H"), ("H", "O")]  # dropped by label restriction
    )
    out = evaluation.cohen_kappa(_rows(spark, pairs), "truth", "pred").collect()[0]
    assert out["n"] == 10
    assert out["p_o"] == pytest.approx(0.7)
    assert out["p_e"] == pytest.approx(0.5)
    assert out["kappa"] == pytest.approx(0.4)


def test_cohen_kappa_perfect_agreement(spark):
    pairs = [("H", "H")] * 3 + [("W", "W")] * 3
    out = evaluation.cohen_kappa(_rows(spark, pairs), "truth", "pred").collect()[0]
    assert out["kappa"] == pytest.approx(1.0)


def _boot_fixture(spark, n_users=40):
    # 3 locations per user; deterministic 'mistake' pattern so per-user
    # accuracy varies (resampling users must then move the metric).
    rows = []
    for u in range(n_users):
        for c in range(3):
            t = "H" if (u + c) % 2 == 0 else "W"
            p = t if (u * 7 + c) % 5 != 0 else ("W" if t == "H" else "H")
            rows.append((u, u % 4, t, p))
    return spark.createDataFrame(
        rows, schema="user_id long, act_buck long, truth string, pred string"
    )


def test_bootstrap_deterministic_and_genuinely_resampled(spark):
    df = _boot_fixture(spark)
    kw = dict(n_samples=15, seed=11)
    a = evaluation.balanced_bootstrap_metrics(
        df, "truth", "pred", "user_id", "act_buck", **kw
    ).collect()[0]
    b = evaluation.balanced_bootstrap_metrics(
        df, "truth", "pred", "user_id", "act_buck", **kw
    ).collect()[0]
    # The DRAWS are deterministic (LCG, no rand()); the per-replicate
    # scores are exact integer ratios. The final mean/std over replicates
    # is a distributed double sum whose partial-aggregation order is
    # scheduler-dependent, so compare to float-accumulation precision
    # (the catalog oracle rounds to 6dp and is immune).
    for k in a.asDict():
        av, bv = a[k], b[k]
        if isinstance(av, float):
            assert bv == pytest.approx(av, rel=1e-12, abs=1e-12), k
        else:
            assert av == bv, k
    assert a["n_samples"] == 15
    # the resamples must actually differ from each other (guards against
    # the affine-draw bijection bug where every replicate was the
    # identity sample and std collapsed to 0)
    assert a["f1_std"] > 0.0
    assert a["acc_std"] > 0.0
    # and stay centered near the full-sample metric
    full = evaluation.classification_metrics(df, "truth", "pred").collect()[0]
    assert a["f1_mean"] == pytest.approx(full["macro_f1"], abs=0.1)


def test_bootstrap_seed_changes_draws(spark):
    df = _boot_fixture(spark)
    a = evaluation.balanced_bootstrap_metrics(
        df, "truth", "pred", "user_id", "act_buck", n_samples=10, seed=1
    ).collect()[0]
    b = evaluation.balanced_bootstrap_metrics(
        df, "truth", "pred", "user_id", "act_buck", n_samples=10, seed=2
    ).collect()[0]
    assert a["f1_mean"] != b["f1_mean"]


def _stops_fixture(spark):
    """Synthetic stops: each user has a 'home' cluster (nightly stops)
    and a 'work' cluster (weekday 10:00 stops, ~2h/day)."""
    import datetime as dt

    rows = []
    base = dt.datetime(2021, 1, 4)  # a Monday
    for u in range(20):
        for d in range(10):
            day = base + dt.timedelta(days=d)
            night = day.replace(hour=22)
            rows.append(
                (u, 100 + u, int(night.timestamp()), int(night.timestamp()) + 28800, 28800)
            )
            if day.weekday() < 5:
                work = day.replace(hour=10)
                rows.append(
                    (u, 200 + u, int(work.timestamp()), int(work.timestamp()) + 7200, 7200)
                )
    return spark.createDataFrame(
        rows,
        schema="user_id long, cluster_label long, t_start long, t_end long, duration long",
    )


def test_grid_search_ranks_matching_config_first(spark):
    from sdg_big_data_spark.operators import grouped

    stops = _stops_fixture(spark)
    truth_rows = [(u, 100 + u, "H") for u in range(20)] + [
        (u, 200 + u, "W") for u in range(20)
    ]
    truth = spark.createDataFrame(
        truth_rows, schema="user_id long, cluster_label long, final_op string"
    )
    configs = [
        {"min_work_seconds_per_day": 3600},   # 2h/day work stops pass
        {"min_work_seconds_per_day": 20000},  # nothing qualifies as work
    ]
    grid = evaluation.grid_search_configs(
        stops, truth, configs, grouped.label_home_work
    ).collect()
    by_id = {r["config_id"]: r for r in grid}
    assert len(by_id) == 2
    assert by_id[0]["macro_f1"] == pytest.approx(1.0)  # recovers truth exactly
    assert by_id[1]["macro_f1"] < by_id[0]["macro_f1"]  # strict config loses W

    best = evaluation.select_compatible_config(
        evaluation.grid_search_configs(stops, truth, configs, grouped.label_home_work)
    ).collect()
    assert best[0]["config_id"] == 0


def test_select_compatible_keeps_statistical_ties(spark):
    rows = [
        (0, "a", 0.90, 0.02),
        (1, "b", 0.89, 0.02),  # within best-std band -> compatible
        (2, "c", 0.80, 0.01),  # not compatible
    ]
    grid = spark.createDataFrame(
        rows, schema="config_id int, config string, macro_f1 double, f1_std double"
    )
    kept = evaluation.select_compatible_config(grid, std_col="f1_std").collect()
    assert [r["config_id"] for r in kept] == [0, 1]


def test_ks_statistic_known_cases(spark):
    from sdg_big_data_spark.operators.quality import ks_statistic

    # identical distributions -> ks == 0
    rows = [(float(v), s) for v in range(50) for s in ("a", "b")]
    df = spark.createDataFrame(rows, schema="v double, side string")
    r = ks_statistic(df, "v", "side", "a", "b").collect()[0]
    assert r["n_a"] == 50 and r["n_b"] == 50
    assert r["ks"] == pytest.approx(0.0)

    # disjoint supports -> ks == 1
    rows = [(float(v), "a") for v in range(30)] + [
        (float(v + 1000), "b") for v in range(40)
    ]
    df = spark.createDataFrame(rows, schema="v double, side string")
    r = ks_statistic(df, "v", "side", "a", "b").collect()[0]
    assert r["ks"] == pytest.approx(1.0)

    # hand-computed with ties: a = [1,2,2,3], b = [2,3,3,4]
    # ECDFs at 1: 1/4 vs 0 -> .25 ; at 2: 3/4 vs 1/4 -> .5 ; at 3: 1 vs 3/4
    # -> .25 ; at 4: 1 vs 1 -> 0   => ks = 0.5
    rows = [(1.0, "a"), (2.0, "a"), (2.0, "a"), (3.0, "a"),
            (2.0, "b"), (3.0, "b"), (3.0, "b"), (4.0, "b")]
    df = spark.createDataFrame(rows, schema="v double, side string")
    r = ks_statistic(df, "v", "side", "a", "b").collect()[0]
    assert r["ks"] == pytest.approx(0.5)


def test_roc_points_hand_computed(spark):
    # scores 0.9,0.8,0.7,0.6 with labels 1,0,1,0 → thresholds desc:
    #   t=0.9: tp=1 fp=0 → tpr=0.5 fpr=0.0
    #   t=0.8: tp=1 fp=1 → tpr=0.5 fpr=0.5
    #   t=0.7: tp=2 fp=1 → tpr=1.0 fpr=0.5
    #   t=0.6: tp=2 fp=2 → tpr=1.0 fpr=1.0
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)], "score double, y int"
    )
    rows = {
        r["score"]: r
        for r in evaluation.roc_points(df, "y", "score").collect()
    }
    assert (rows[0.9]["tpr"], rows[0.9]["fpr"]) == (0.5, 0.0)
    assert (rows[0.8]["tpr"], rows[0.8]["fpr"]) == (0.5, 0.5)
    assert (rows[0.7]["tpr"], rows[0.7]["fpr"]) == (1.0, 0.5)
    assert (rows[0.6]["tpr"], rows[0.6]["fpr"]) == (1.0, 1.0)
    assert rows[0.6]["cum_tp"] == 2 and rows[0.6]["cum_fp"] == 2


def test_roc_points_ties_grouped(spark):
    # tied scores collapse to ONE threshold row carrying both rows' counts
    df = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.1, 1)], "score double, y int"
    )
    rows = {
        r["score"]: r
        for r in evaluation.roc_points(df, "y", "score").collect()
    }
    assert len(rows) == 2
    assert rows[0.5]["cum_tp"] == 1 and rows[0.5]["cum_fp"] == 1
    assert rows[0.1]["cum_tp"] == 2 and rows[0.1]["cum_fp"] == 1


def test_grouped_auc_matches_global_auc_per_slice(spark):
    rows = [
        ("a", 0.9, 1), ("a", 0.8, 0), ("a", 0.7, 1), ("a", 0.6, 0),
        ("b", 0.9, 0), ("b", 0.5, 1), ("b", 0.5, 0), ("b", 0.1, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, score double, y int")
    grouped = {
        r["grp"]: r for r in evaluation.grouped_auc(df, ["grp"], "y", "score").collect()
    }
    for g in ("a", "b"):
        glob = evaluation.auc(df.where(df.grp == g), "y", "score").collect()[0]
        assert grouped[g]["n_pos"] == glob["n_pos"]
        assert grouped[g]["n_neg"] == glob["n_neg"]
        assert abs(grouped[g]["auc"] - glob["auc"]) < 1e-12


def test_ab_test_matches_numpy_welch(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    a = rng.normal(1.0, 2.0, 300)
    b = rng.normal(0.7, 1.5, 200)
    rows = [("A", float(x)) for x in a] + [("B", float(x)) for x in b]
    df = spark.createDataFrame(rows, "arm string, v double")
    out = evaluation.ab_test(df, "arm", "A", "B", "v").collect()[0]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t = (a.mean() - b.mean()) / np.sqrt(va / 300 + vb / 200)
    dof = (va / 300 + vb / 200) ** 2 / (
        (va / 300) ** 2 / 299 + (vb / 200) ** 2 / 199
    )
    assert out["n_a"] == 300 and out["n_b"] == 200
    assert abs(out["t_welch"] - t) < 1e-9
    assert abs(out["dof"] - dof) < 1e-6


class TestMeanReciprocalRank:
    def test_hand_computed(self, spark):
        from sdg_big_data_spark.operators.evaluation import mean_reciprocal_rank

        # q1: ranks by score desc -> ids 11(0.9,y=0), 12(0.8,y=1) => rr 1/2
        # q2: single irrelevant item => contributes 0, stays in denominator
        # q3: top item relevant => rr 1
        rows = [
            ("q1", 11, 0.9, 0), ("q1", 12, 0.8, 1), ("q1", 13, 0.1, 1),
            ("q2", 21, 0.5, 0),
            ("q3", 31, 0.7, 1), ("q3", 32, 0.6, 0),
        ]
        df = spark.createDataFrame(rows, "qid string, id long, p double, y int")
        out = mean_reciprocal_rank(df, "y", "p", "qid", "id").collect()[0]
        assert out["n_queries"] == 3
        assert out["n_with_relevant"] == 2
        assert abs(out["mrr"] - (0.5 + 0.0 + 1.0) / 3) < 1e-12

    def test_tie_breaks_on_id(self, spark):
        from sdg_big_data_spark.operators.evaluation import mean_reciprocal_rank

        # equal scores: id asc decides — relevant id 2 sits at rank 2
        rows = [("q", 1, 0.5, 0), ("q", 2, 0.5, 1)]
        df = spark.createDataFrame(rows, "qid string, id long, p double, y int")
        out = mean_reciprocal_rank(df, "y", "p", "qid", "id").collect()[0]
        assert abs(out["mrr"] - 0.5) < 1e-12


class TestSelectionDiversity:
    def test_hand_computed(self, spark):
        """a=[1,0], b=[-1,0], c=[0,1] — reference semantics include the
        diagonal: mean = -sum(cos)/k^2 = -1/9; mean-max row maxima of
        -cos are (1, 1, 0) -> 2/3."""
        from sdg_big_data_spark.operators.evaluation import (
            selection_diversity,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        r = selection_diversity(df).collect()[0]
        assert r["n_selected"] == 3
        assert r["mean_diversity"] == round(-1 / 9, 6)
        assert r["mean_max_diversity"] == round(2 / 3, 6)

    def test_identical_set_collapses(self, spark):
        """All-identical selection: every cosine is 1 -> mean -1 and
        mean-max -1 (the degenerate batch a diversity gate must flag)."""
        from sdg_big_data_spark.operators.evaluation import (
            selection_diversity,
        )

        df = spark.createDataFrame(
            [(i, [3.0, 4.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        r = selection_diversity(df).collect()[0]
        assert r["mean_diversity"] == -1.0
        assert r["mean_max_diversity"] == -1.0

    def test_arrow_backend_matches_fold(self, spark):
        """use_arrow=True (BLAS batch path) equals the expression-fold
        default on random vectors — same 1/unit pinning both sides."""
        import random

        from sdg_big_data_spark.operators.evaluation import (
            selection_diversity,
        )

        rng = random.Random(7)
        rows = [
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        want = selection_diversity(df).collect()[0]
        got = selection_diversity(df, use_arrow=True).collect()[0]
        assert tuple(got) == tuple(want)

    def test_auto_backend_switches_on_selection_size(self, spark):
        """use_arrow=None (default) must pick the fold below arrow_min_k
        and the BLAS path above it — the fixed catalog fixture walked
        into the quadratic fold at a corpus-grown 12k selection (327 s
        vs 11.1 s at 100x) before auto-selection. Both choices must
        return identical values."""
        import random

        from sdg_big_data_spark.operators.evaluation import (
            selection_diversity,
        )

        rng = random.Random(11)
        rows = [
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(6)])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        fold = selection_diversity(df, arrow_min_k=100).collect()[0]
        arrow = selection_diversity(df, arrow_min_k=10).collect()[0]
        assert tuple(arrow) == tuple(fold)

    def test_arrow_backend_half_up_on_exact_tie(self, spark):
        """A cosine landing EXACTLY on a .5 unit boundary must round
        HALF_UP in both backends: cos(a,b)=1/4 is exact in floats
        (dot=1, norms 1 and 4), so unit=2 puts the pinned value at 0.5
        — np.rint's half-to-even rounded it to 0 while F.round gave 1,
        a systematic backend divergence before the copysign fix."""
        from sdg_big_data_spark.operators.evaluation import (
            selection_diversity,
        )

        a = [1.0] + [0.0] * 15
        b = [1.0] * 16  # |b| = 4 exactly
        df = spark.createDataFrame(
            [(0, a), (1, b)], "vec_id long, embedding array<double>"
        )
        want = selection_diversity(df, unit=2).collect()[0]
        got = selection_diversity(df, unit=2, use_arrow=True).collect()[0]
        assert tuple(got) == tuple(want)


class TestAveragePrecision:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_pure_python_step_integral(self, spark, seed):
        """Randomized differential vs the hand step integral
        AP = sum_t (R_t - R_{t-1}) * P_t over distinct thresholds
        descending (sklearn average_precision_score semantics,
        including tied scores collapsing to one threshold)."""
        import random

        from sdg_big_data_spark.operators.evaluation import (
            average_precision,
        )

        rng = random.Random(seed)
        rows = [
            (round(rng.choice([0.1, 0.25, 0.5, 0.75, 0.9]) + rng.randint(0, 3) * 0.01, 3),
             rng.randint(0, 1))
            for _ in range(200)
        ]
        if not any(y for _, y in rows):
            rows[0] = (rows[0][0], 1)
        df = spark.createDataFrame(rows, "p double, y int")
        got = average_precision(df, "y", "p").collect()[0]

        per = {}  # score -> [negatives, positives]
        for p, y in rows:
            c = per.setdefault(p, [0, 0])
            c[1 if y else 0] += 1
        P = sum(c[1] for c in per.values())
        N = sum(c[0] for c in per.values())
        ctp = cfp = 0
        ap = 0.0
        for sc in sorted(per, reverse=True):
            neg, pos = per[sc][0], per[sc][1]
            ctp += pos
            cfp += neg
            ap += (pos / P) * (ctp / (ctp + cfp))
        assert got["n_pos"] == P and got["n_neg"] == N
        assert got["avg_precision"] == round(ap, 6)

    def test_perfect_ranker_is_one(self, spark):
        from sdg_big_data_spark.operators.evaluation import (
            average_precision,
        )

        rows = [(0.9 + i * 1e-4, 1) for i in range(10)] + [
            (0.1 + i * 1e-4, 0) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "p double, y int")
        r = average_precision(df, "y", "p").collect()[0]
        assert r["avg_precision"] == 1.0


class TestKrippendorffAlpha:
    @staticmethod
    def _naive(units):
        """Independent model: explicit coincidence matrix o_ck
        (Krippendorff 2004 §11.3), no pinning."""
        from collections import Counter, defaultdict

        kept = [u for u in units if len(u) >= 2]
        if not kept:
            return None
        n = sum(len(u) for u in kept)
        o = defaultdict(float)
        for u in kept:
            m = len(u)
            for i, c in enumerate(u):
                for j, k in enumerate(u):
                    if i != j:
                        o[(c, k)] += 1.0 / (m - 1)
        d_o = sum(v for (c, k), v in o.items() if c != k) / n
        nc = Counter(v for u in kept for v in u)
        d_e = sum(
            a * b for c, a in nc.items() for k, b in nc.items() if c != k
        ) / (n * (n - 1))
        if d_e == 0:
            return None
        return 1.0 - d_o / d_e

    @pytest.mark.parametrize("seed", range(3))
    def test_matches_coincidence_matrix_model(self, spark, seed):
        import random

        from sdg_big_data_spark.operators.evaluation import (
            krippendorff_alpha,
        )

        rng = random.Random(seed)
        rows, units = [], []
        for u in range(40):
            vals = [
                rng.choice("abcd") for _ in range(rng.randint(1, 6))
            ]  # includes single-rating units, which must drop out
            units.append(vals)
            rows += [(u, v) for v in vals]
        df = spark.createDataFrame(rows, "unit long, v string")
        got = krippendorff_alpha(df, "unit", "v").collect()[0]
        want = self._naive(units)
        assert got["alpha"] == pytest.approx(want, abs=2e-6)
        assert got["n_ratings"] == sum(len(u) for u in units if len(u) >= 2)

    def test_perfect_agreement_is_one(self, spark):
        from sdg_big_data_spark.operators.evaluation import (
            krippendorff_alpha,
        )

        rows = [(u, "x" if u % 2 else "y") for u in range(10) for _ in range(3)]
        df = spark.createDataFrame(rows, "unit long, v string")
        assert krippendorff_alpha(df, "unit", "v").collect()[0]["alpha"] == 1.0

    def test_degenerate_returns_null(self, spark):
        """All ratings one category -> zero expected disagreement ->
        alpha undefined (NULL), not a crash or a fake 1.0."""
        from sdg_big_data_spark.operators.evaluation import (
            krippendorff_alpha,
        )

        df = spark.createDataFrame(
            [(u, "x") for u in range(5) for _ in range(2)], "unit long, v string"
        )
        assert krippendorff_alpha(df, "unit", "v").collect()[0]["alpha"] is None


class TestSpearmanCorr:
    def test_perfect_monotone(self, spark):
        df = spark.createDataFrame(
            [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 100.0)], ["x", "y"]
        )
        row = evaluation.spearman_corr(df, "x", "y").collect()[0]
        assert row["n"] == 4 and row["spearman"] == 1.0

    def test_pandas_differential_with_ties(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(7)
        x = rng.randint(0, 12, 300).astype(float)  # heavy ties
        y = 0.5 * x + rng.randint(0, 8, 300)
        pdf = pd.DataFrame({"x": x, "y": y})
        # pandas' method="spearman" delegates to scipy (absent here);
        # average-rank + Pearson is the definition.
        expected = (
            pdf["x"].rank(method="average").corr(pdf["y"].rank(method="average"))
        )
        row = evaluation.spearman_corr(
            spark.createDataFrame(pdf), "x", "y", round_dp=8
        ).collect()[0]
        assert row["spearman"] == pytest.approx(expected, abs=1e-8)

    def test_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 4.0), (5.0, 2.0)],
            ["x", "y"],
        )
        row = evaluation.spearman_corr(df, "x", "y").collect()[0]
        assert row["n"] == 3
