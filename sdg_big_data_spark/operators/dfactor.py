"""Single-factor dynamic-factor model with AR(p) factor dynamics —
the estimator behind the reference's global news-sentiment index
(`news-analytics/code/3_sentiment_global.do:15-38`: Stata
``dfactor ((y*) = , noconstant) (f = , ar(1/8))`` +
``predict, factor smethod(filter)``).

Model (noconstant, as the reference specifies):

    y_it = lambda_i * f_t + eps_it,   eps_it ~ N(0, r_i)   (idiosyncratic)
    f_t  = phi_1 f_{t-1} + ... + phi_p f_{t-p} + eta_t,  eta_t ~ N(0, 1)

(state-innovation variance fixed at 1 for identification — the same
normalization Stata's dfactor applies). Estimated by EM over the Kalman
filter/smoother (Shumway & Stoffer 1982), which is exactly MLE ascent
for this linear-Gaussian model; the returned index is the FILTERED
factor E[f_t | y_1..t], matching ``smethod(filter)``.

Implementation note — stacked-lag state: the state vector is
``x_t = [f_t, f_{t-1}, ..., f_{t-p}]`` (p+1 dims, one more lag than the
AR order). All cross-lag second moments the M-step needs
(E[f_t f_{t-k}], k <= p) then live inside the SINGLE-time smoothed
moments E[x_t x_t'], so the lag-one-covariance recursion of the
textbook EM disappears.

Scale: this runs on the driver over the collected (day x country) panel
— <= ~25 countries x ~10k days ~ 2 MB (`SURVEY.md` §7.4). Everything
UP TO the panel (sentiment scoring, country explode, daily collapse,
z-scores) is distributed DataFrame work; distributing a 25-column
Kalman recursion would be strictly slower than collecting it. numpy
only — no scipy/statsmodels in the container.
"""

from __future__ import annotations

import numpy as np


def _kalman_pass(Y, lam, r, phi, P0_scale=5.0):
    """One filter+smoother pass. Returns filtered means (for the output
    index), smoothed first/second moments (for the M-step), and the
    log-likelihood. Y: (T, N) with NaN = missing (treated as absent
    observations, the exact Kalman handling of unbalanced panels)."""
    T, N = Y.shape
    p1 = len(phi) + 1  # state dim = AR order + 1 (stacked lags)
    A = np.zeros((p1, p1))
    A[0, : len(phi)] = phi
    for i in range(1, p1):
        A[i, i - 1] = 1.0
    Q = np.zeros((p1, p1))
    Q[0, 0] = 1.0
    Z = np.zeros((N, p1))
    Z[:, 0] = lam

    xp = np.zeros((T, p1))   # x_{t|t-1}
    Pp = np.zeros((T, p1, p1))
    xf = np.zeros((T, p1))   # x_{t|t}
    Pf = np.zeros((T, p1, p1))
    x_prev = np.zeros(p1)
    P_prev = np.eye(p1) * P0_scale
    loglik = 0.0
    for t in range(T):
        x_pred = A @ x_prev if t > 0 else x_prev
        P_pred = A @ P_prev @ A.T + Q if t > 0 else P_prev
        obs = ~np.isnan(Y[t])
        if obs.any():
            Zo = Z[obs]
            yo = Y[t, obs]
            S = Zo @ P_pred @ Zo.T + np.diag(r[obs])
            innov = yo - Zo @ x_pred
            Sinv = np.linalg.inv(S)
            K = P_pred @ Zo.T @ Sinv
            x_filt = x_pred + K @ innov
            P_filt = P_pred - K @ Zo @ P_pred
            sign, logdet = np.linalg.slogdet(S)
            loglik += -0.5 * (
                obs.sum() * np.log(2 * np.pi) + logdet + innov @ Sinv @ innov
            )
        else:
            x_filt, P_filt = x_pred, P_pred
        xp[t], Pp[t], xf[t], Pf[t] = x_pred, P_pred, x_filt, P_filt
        x_prev, P_prev = x_filt, P_filt

    # RTS smoother
    xs = xf.copy()
    Ps = Pf.copy()
    for t in range(T - 2, -1, -1):
        J = Pf[t] @ A.T @ np.linalg.pinv(Pp[t + 1])
        xs[t] = xf[t] + J @ (xs[t + 1] - xp[t + 1])
        Ps[t] = Pf[t] + J @ (Ps[t + 1] - Pp[t + 1]) @ J.T
    return xf[:, 0], xs, Ps, loglik


def fit_dynamic_factor(
    Y: np.ndarray,
    ar_order: int = 8,
    n_iter: int = 50,
    tol: float = 1e-5,
):
    """EM-fit the single-factor AR(p) DFM on a (T, N) panel (NaN =
    missing). Returns dict with filtered/smoothed factor, loadings,
    idiosyncratic variances, AR coefficients, and the log-likelihood
    path (non-decreasing up to float noise — EM's guarantee)."""
    Y = np.asarray(Y, dtype=float)
    T, N = Y.shape
    p = ar_order
    if T <= p + 2:
        raise ValueError(f"panel too short for AR({p}): T={T}")

    # --- init from PC1 (the SVD baseline) ------------------------------
    Y0 = np.nan_to_num(Y)
    u, s, _ = np.linalg.svd(Y0 - Y0.mean(axis=0), full_matrices=False)
    f0 = u[:, 0] * s[0]
    if np.corrcoef(f0, Y0.mean(axis=1))[0, 1] < 0:
        f0 = -f0
    denom = float(f0 @ f0) or 1.0
    lam = (Y0.T @ f0) / denom
    r = np.nanvar(Y - np.outer(f0, lam), axis=0)
    r = np.clip(r, 1e-6, None)
    # init AR coeffs by Yule-Walker-ish least squares on f0
    X = np.column_stack([f0[p - k - 1 : T - k - 1] for k in range(p)])
    phi, *_ = np.linalg.lstsq(X, f0[p:], rcond=None)
    # rescale so the state innovation variance is ~1 (identification)
    resid = f0[p:] - X @ phi
    scale = np.sqrt(max(float(resid.var()), 1e-8))
    lam = lam * scale

    logliks: list[float] = []
    xf0 = None
    for _ in range(n_iter):
        xf0, xs, Ps, ll = _kalman_pass(Y, lam, r, phi)
        logliks.append(ll)

        # E-step moments from the stacked state: E[x_t x_t'] = xs xs' + Ps
        Exx = Ps.sum(axis=0) + xs.T @ xs  # (p+1, p+1)
        Ef = xs[:, 0]
        Eff = Exx[0, 0]  # sum_t E[f_t^2]

        # M-step: loadings + idiosyncratic variances (per series,
        # observed entries only)
        new_lam = np.empty(N)
        new_r = np.empty(N)
        Ef2_t = xs[:, 0] ** 2 + Ps[:, 0, 0]
        for i in range(N):
            obs = ~np.isnan(Y[:, i])
            yi = Y[obs, i]
            d = float(Ef2_t[obs].sum())
            new_lam[i] = float(yi @ Ef[obs]) / d if d > 0 else 0.0
            new_r[i] = float(
                np.mean(yi**2 - 2 * new_lam[i] * yi * Ef[obs] + new_lam[i] ** 2 * Ef2_t[obs])
            )
        new_r = np.clip(new_r, 1e-6, None)

        # M-step: AR coefficients from the within-state cross moments —
        # components 1..p of x_t are f_{t-1}..f_{t-p}, so
        # sum_t E[l_t l_t'] = Exx[1:,1:] and sum_t E[f_t l_t] = Exx[0,1:]
        B = Exx[1:, 1:]
        a = Exx[0, 1:]
        new_phi = np.linalg.solve(B + 1e-8 * np.eye(p), a)

        delta = max(
            np.max(np.abs(new_lam - lam)),
            np.max(np.abs(new_phi - phi)),
            np.max(np.abs(new_r - r)),
        )
        lam, r, phi = new_lam, new_r, new_phi
        if delta < tol:
            break

    # final pass with converged params → the reported factor
    xf0, xs, _, ll = _kalman_pass(Y, lam, r, phi)
    logliks.append(ll)
    factor_filtered = xf0
    factor_smoothed = xs[:, 0]
    # sign convention: factor tracks the cross-sectional mean positively
    if np.corrcoef(factor_filtered, np.nan_to_num(Y).mean(axis=1))[0, 1] < 0:
        factor_filtered = -factor_filtered
        factor_smoothed = -factor_smoothed
        lam = -lam
    return {
        "factor_filtered": factor_filtered,
        "factor_smoothed": factor_smoothed,
        "loadings": lam,
        "idio_var": r,
        "ar_coeffs": phi,
        "loglik_path": np.array(logliks),
    }
