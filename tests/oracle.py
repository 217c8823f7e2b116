"""Pure NumPy/pandas golden oracle implementing SURVEY.md §1.4 verbatim.

Stands in for the unavailable Julia test suite (SURVEY.md §0): the same
documented Julia-stdlib semantics (Statistics.mean/cov corrected=true,
StatsBase.zscore, LinearAlgebra.eigen) expressed in NumPy.  Every engine
kernel is allclose-checked (rtol=1e-8, atol=1e-10) against these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RTOL, ATOL = 1e-8, 1e-10
EPS = 1e-12


def mean(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float64).mean(axis=0)


def cov(x: np.ndarray) -> np.ndarray:
    """Bessel-corrected sample covariance (Julia Statistics.cov default)."""
    x = np.asarray(x, dtype=np.float64)
    return np.cov(x, rowvar=False, ddof=1)


def zscore(x: np.ndarray) -> np.ndarray:
    """(x - mu)/sigma, corrected sigma; sigma==0 -> 0.0 (§1.4.3)."""
    x = np.asarray(x, dtype=np.float64)
    mu = x.mean(axis=0)
    sd = x.std(axis=0, ddof=1)
    z = np.zeros_like(x)
    nz = sd != 0.0
    z[:, nz] = (x[:, nz] - mu[nz]) / sd[nz]
    return z


def sign_fix(v: np.ndarray) -> np.ndarray:
    idx = np.argmax(np.abs(v), axis=0)
    signs = np.sign(v[idx, np.arange(v.shape[1])])
    signs[signs == 0] = 1.0
    return v * signs


def pca_fit(x: np.ndarray, k: int | None = None):
    """Returns (mu, V_k (p,k) desc + sign-fixed, lam_k, total_variance)."""
    sigma = cov(x)
    lam, vec = np.linalg.eigh(sigma)
    order = np.argsort(lam)[::-1]
    lam = np.clip(lam[order], 0.0, None)
    vec = sign_fix(vec[:, order])
    if k is None:
        k = sigma.shape[0]
    return mean(x), vec[:, :k], lam[:k], float(np.trace(sigma))


def pca_project(x: np.ndarray, mu, v_k) -> np.ndarray:
    return (np.asarray(x, np.float64) - mu) @ v_k


def pca_whiten_project(x: np.ndarray, mu, v_k, lam_k) -> np.ndarray:
    return (np.asarray(x, np.float64) - mu) @ (v_k / np.sqrt(lam_k + EPS))


def zca_project(x: np.ndarray, mu, v, lam) -> np.ndarray:
    w = (v / np.sqrt(lam + EPS)) @ v.T
    return (np.asarray(x, np.float64) - mu) @ w


# ---------------------------------------------------------------------------
# Temporal oracles (pandas) — cross-checks for Group C operators
# ---------------------------------------------------------------------------

def asof_backward(left: pd.DataFrame, right: pd.DataFrame, key: str,
                  left_ts: str, right_ts: str,
                  tolerance: pd.Timedelta | None = None) -> pd.DataFrame:
    """pandas merge_asof cross-check (per-key backward as-of)."""
    lo = left.sort_values([left_ts, key]).reset_index(drop=True)
    ro = right.sort_values([right_ts, key]).reset_index(drop=True)
    return pd.merge_asof(lo, ro, left_on=left_ts, right_on=right_ts,
                         by=key, direction="backward", tolerance=tolerance)


def sessionize(ts: pd.Series, gap_seconds: float) -> pd.Series:
    """Session ids within one ordered conversation: 0-based cumulative sum."""
    gaps = ts.diff().dt.total_seconds().fillna(0.0)
    return (gaps > gap_seconds).cumsum()


def forward_fill(s: pd.Series) -> pd.Series:
    return s.ffill()
