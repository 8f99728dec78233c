"""Differential tests for the AR(p) dynamic-factor estimator
(`3_sentiment_global.do:33-38` parity): on a synthetic panel with a
PLANTED AR factor, the EM/Kalman fit must recover the factor path, the
AR dynamics, and the loadings — and its likelihood must be monotone
(EM's guarantee) and beat the static PC1 init.
"""

from __future__ import annotations

import numpy as np
import pytest

from sdg_big_data_spark.operators.dfactor import fit_dynamic_factor


def _planted_panel(T=400, N=8, phi=(0.7, 0.2), noise=0.6, seed=3):
    rng = np.random.default_rng(seed)
    p = len(phi)
    f = np.zeros(T + 50)
    for t in range(p, T + 50):
        f[t] = sum(phi[k] * f[t - k - 1] for k in range(p)) + rng.normal()
    f = f[50:]  # burn-in
    lam = rng.uniform(0.5, 1.5, N)
    Y = np.outer(f, lam) + rng.normal(0, noise, (T, N))
    return Y, f, lam


def test_recovers_planted_ar2_factor():
    Y, f, lam = _planted_panel()
    fit = fit_dynamic_factor(Y, ar_order=2, n_iter=60)
    corr = np.corrcoef(fit["factor_filtered"], f)[0, 1]
    assert abs(corr) > 0.95
    corr_s = np.corrcoef(fit["factor_smoothed"], f)[0, 1]
    assert abs(corr_s) >= abs(corr) - 0.01  # smoother can't be worse
    # AR coefficients near truth (loose: finite T)
    assert fit["ar_coeffs"] == pytest.approx([0.7, 0.2], abs=0.15)
    # loadings recovered up to the common scale
    ratio = fit["loadings"] / lam
    assert np.std(ratio) / abs(np.mean(ratio)) < 0.2


def test_loglik_monotone_and_improves_on_init():
    Y, f, _ = _planted_panel(seed=11)
    fit = fit_dynamic_factor(Y, ar_order=1, n_iter=40)
    ll = fit["loglik_path"]
    diffs = np.diff(ll)
    assert (diffs > -1e-6 * np.abs(ll[:-1])).all()  # EM never decreases
    assert ll[-1] > ll[0]  # and genuinely moved from the PC1 init


def test_handles_missing_observations():
    Y, f, _ = _planted_panel(seed=5)
    Ym = Y.copy()
    rng = np.random.default_rng(0)
    mask = rng.random(Y.shape) < 0.2
    Ym[mask] = np.nan  # Kalman treats NaN as absent, no imputation
    fit = fit_dynamic_factor(Ym, ar_order=2, n_iter=40)
    assert abs(np.corrcoef(fit["factor_filtered"], f)[0, 1]) > 0.9


def test_ar8_matches_reference_spec_shape():
    Y, f, _ = _planted_panel(T=600, seed=7)
    fit = fit_dynamic_factor(Y, ar_order=8, n_iter=30)
    assert fit["ar_coeffs"].shape == (8,)
    assert abs(np.corrcoef(fit["factor_filtered"], f)[0, 1]) > 0.9


def test_sign_convention_tracks_cross_mean():
    Y, _, _ = _planted_panel(seed=13)
    fit = fit_dynamic_factor(Y, ar_order=1, n_iter=20)
    c = np.corrcoef(fit["factor_filtered"], Y.mean(axis=1))[0, 1]
    assert c > 0


def test_news_pipeline_emits_dfm_index(spark):
    """End-to-end: run() returns both the PC1 and the DFM index and the
    two broadly agree on a factor-driven synthetic article set."""
    import pandas as pd

    from sdg_big_data_spark.pipelines import news

    rng = np.random.default_rng(2)
    rows = []
    an = 0
    for d in pd.date_range("2021-01-01", periods=60):
        mood = float(np.sin(d.dayofyear / 9.0))
        for c in ["US", "BR", "IN"]:
            for _ in range(3):
                pos = mood + rng.normal(0, 0.3) > 0
                words = (["good", "growth"] if pos else ["bad", "crisis"]) + [
                    "market", "news", "today"
                ]
                rows.append((an, d.to_pydatetime(), [c], " ".join(words)))
                an += 1
    articles = spark.createDataFrame(
        rows, schema="an long, date timestamp, regions array<string>, full_text string"
    )
    out = news.run(articles, ar_order=2)
    pc1 = out["global_factor"].set_index("day")["factor"]
    dfm = out["global_factor_dfm"].set_index("day")["factor"]
    assert len(dfm) == len(pc1) == 60
    assert abs(np.corrcoef(pc1.to_numpy(), dfm.to_numpy())[0, 1]) > 0.7
