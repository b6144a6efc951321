"""G3Q1 analytics tail: distribution fitting over the popularity-rank
table (reference `zipf.py`, /root/reference/README.md:375-430).

The reference fits zipf, poisson, lognormal and pareto rank-frequency
curves to the airport-popularity counts with scipy.optimize.curve_fit
on a single node and concludes Poisson fits best. The engine-side part
of that pipeline is the distributed rank table (plans.fixtures_parity
`x1_popularity_rank`); this module is the deliberately-small
driver-side tail that consumes its `toPandas()` output — per SURVEY.md
§2.9 the plotting/fitting stays out of the engine core.

Instead of scipy's iterative curve_fit, each candidate density is fit
by least squares on its exact log-linearization (all four are
log-linear or log-quadratic in rank / log-rank), so the tail needs
only numpy:

  zipf      y = c·x^-a            → log y linear in log x
  pareto    y = c·a·x^-(a+1)      → log y linear in log x
  lognormal y = c/(xσ√2π)·e^(-(ln x-μ)²/2σ²)
                                  → log y quadratic in log x
  poisson   y = c·λ^x e^-λ/Γ(x+1) → log y + lgamma(x+1) linear in x

SSE is reported in the original (normalized-count) space, which is
what the reference's visual log-log comparison amounts to.
"""

from __future__ import annotations

from math import lgamma

import numpy as np


def _lgamma_arr(x: np.ndarray) -> np.ndarray:
    return np.array([lgamma(v) for v in x])


def _fit_zipf(x, logx, logy, lg):
    slope, icept = np.polyfit(logx, logy, 1)
    a, c = -slope, np.exp(icept)
    return [float(a), float(c)], c * np.power(x, -a)


def _fit_pareto(x, logx, logy, lg):
    slope, icept = np.polyfit(logx, logy, 1)
    a = -slope - 1.0
    if a <= 0:  # degenerate corpus: pareto needs a tail exponent > 0
        return None, None
    c = np.exp(icept) / a
    return [float(a), float(c)], c * a * np.power(x, -(a + 1.0))


def _fit_lognormal(x, logx, logy, lg):
    # log y + log x = K - (log x - mu)^2 / (2 sigma^2): quadratic fit
    q2, q1, q0 = np.polyfit(logx, logy + logx, 2)
    if q2 >= 0:  # needs a concave parabola to be a lognormal
        return None, None
    sigma = np.sqrt(-1.0 / (2.0 * q2))
    mu = q1 * sigma**2
    k = q0 + mu**2 / (2 * sigma**2)
    c = np.exp(k) * sigma * np.sqrt(2 * np.pi)
    y_hat = (
        c
        / (x * sigma * np.sqrt(2 * np.pi))
        * np.exp(-np.square(np.log(x) - mu) / (2 * sigma**2))
    )
    return [float(mu), float(sigma), float(c)], y_hat


def _fit_poisson(x, logx, logy, lg):
    # log y + lgamma(x+1) = (log c - lam) + x log lam: linear in x
    slope, icept = np.polyfit(x, logy + lg, 1)
    lam = np.exp(slope)
    c = np.exp(icept + lam)
    y_hat = np.exp(x * np.log(lam) - lam - lg) * c
    return [float(lam), float(c)], y_hat


_MODELS = {
    "zipf": _fit_zipf,
    "poisson": _fit_poisson,
    "lognormal": _fit_lognormal,
    "pareto": _fit_pareto,
}


def fit_rank_distribution(rank_pdf) -> dict:
    """Fit the four reference candidate distributions to a rank table.

    `rank_pdf`: pandas DataFrame with columns `rank` (1-based) and
    `cnt`, e.g. ``x1_popularity_rank(...).toPandas()``. Returns
    {model: {"params": [...], "sse": float}} plus "best" — the model
    with the lowest sum of squared errors on the normalized counts,
    mirroring the reference's visual comparison.
    """
    pdf = rank_pdf[rank_pdf["cnt"] > 0]
    x = pdf["rank"].to_numpy(dtype=float)
    y = pdf["cnt"].to_numpy(dtype=float)
    y = y / y.sum()  # normalize so fits are scale-free across sf
    logx, logy, lg = np.log(x), np.log(y), _lgamma_arr(x + 1.0)
    out: dict = {}
    best, best_sse = None, np.inf
    for name, fit in _MODELS.items():
        try:
            params, y_hat = fit(x, logx, logy, lg)
        except (np.linalg.LinAlgError, FloatingPointError, ValueError):
            params, y_hat = None, None
        sse = (
            float("inf")
            if y_hat is None or not np.all(np.isfinite(y_hat))
            else float(np.sum(np.square(y_hat - y)))
        )
        out[name] = {"params": params, "sse": sse}
        if sse < best_sse:
            best, best_sse = name, sse
    out["best"] = best
    return out
