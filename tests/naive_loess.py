"""Independent naive O(n*q) LOESS used to cross-check the vectorized kernel.

Deliberately implemented with a different method (weighted least squares via
``np.linalg.lstsq`` on a Vandermonde design) than the kernel's closed-form
normal-equation inverses (loess.fut:109-143), so agreement is meaningful.
Window selection (l_idx, lambda) is taken from the kernel's params — the
selection logic itself is validated separately with hand-computed cases.
"""

from __future__ import annotations

import numpy as np


def tricube(r: np.ndarray, lam: float) -> np.ndarray:
    t = 1.0 - (np.abs(r) / lam) ** 3
    return t ** 3


def naive_fit_slope(xx, yy, ww, q, m_val, l_idx_i, lam_i, n_nn, degree):
    """Weighted polynomial fit at one eval point; returns (fit, slope)."""
    js = np.arange(q)
    js = js[js < n_nn]
    cols = l_idx_i + js
    x = (xx[cols] + 1 - m_val).astype(np.float64)
    # weights can be NEGATIVE: the reference never clamps the tricube
    # (loess.fut:98) and its +1 index shift puts the window edge at
    # |x| = lambda + 1 — so solve the weighted normal equations directly
    # instead of sqrt-weight least squares.
    w = tricube(x, lam_i) * ww[cols]
    y = yy[cols]
    V = np.vander(x, degree + 1, increasing=True)
    A = V.T @ (V * w[:, None])
    rhs = V.T @ (w * y)
    coef = np.linalg.solve(A, rhs)
    fit = coef[0]
    slope = coef[1] if degree >= 1 else 0.0
    return fit, slope
