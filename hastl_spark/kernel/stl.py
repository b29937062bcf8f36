"""Batched STL decomposition — vectorized NumPy transliteration.

Reproduces the reference's numerical semantics exactly (reference:
hastl/src/futhark/stl.fut, driven by hastl/stl.py). float32 at the API
boundary, float64 for all internal arithmetic (stl.fut:14,178,375-377).

This module is simultaneously the correctness oracle for the engine's tests
and the kernel executed inside the Spark ``applyInPandas`` gap-fill UDF
(SURVEY.md §7 step 1).
"""

from __future__ import annotations

import math

import numpy as np

from .loess import (
    filter_pad_nans,
    interpolate,
    interpolate_css,
    loess,
    loess_params,
    loess_params_css,
    pad_gather,
)
from .median import median_l
from .params import STLParams, canonicalize_stl_params


def _moving_averages(x: np.ndarray, n_p: int) -> np.ndarray:
    """Three chained O(n) prefix-sum moving averages (stl.fut:23-40).

    Input [B, n + 2*n_p] -> output [B, n]: windows n_p, n_p, 3 shrinking
    n+2*n_p -> n+n_p+1 -> n+2 -> n.
    """

    def single_ma(arr: np.ndarray, w: int, n_out: int) -> np.ndarray:
        first = arr[:, :w].sum(axis=1) / w  # stl.fut:26,32
        i = np.arange(1, n_out, dtype=np.int64)
        diffs = (arr[:, i + w - 1] - arr[:, i - 1]) / w  # stl.fut:34
        return np.cumsum(np.concatenate([first[:, None], diffs], axis=1), axis=1)

    nn = x.shape[1] - n_p * 2
    ma1 = single_ma(x, n_p, nn + n_p + 1)
    ma2 = single_ma(ma1, n_p, nn + 2)
    return single_ma(ma2, 3, nn)  # stl.fut:40


def _css_views(Y32: np.ndarray, n_p: int):
    """Cycle-subseries extraction + per-css NaN compaction (stl.fut:113-134).

    Returns (css_nn_idx [m,n_p,L] int64 pads -1, css_n_nn [m,n_p], and the
    gather index grid idx[n_p, L] with its validity mask) where
    L = max_css_len.
    """
    m, n = Y32.shape
    L = math.ceil(n / n_p)
    i = np.arange(n_p, dtype=np.int64)[:, None]
    j = np.arange(L, dtype=np.int64)[None, :]
    idx = i + n_p * j  # new_i = i + n_p*j (stl.fut:118)
    valid = idx <= n - 1
    vals = Y32[:, np.minimum(idx, n - 1)].astype(np.float64)  # [m, n_p, L]
    css = np.where(valid[None, :, :], vals, np.nan)
    flat = css.reshape(m * n_p, L)
    _, css_nn_idx, css_n_nn = filter_pad_nans(flat)
    return (css_nn_idx.reshape(m, n_p, L),
            css_n_nn.reshape(m, n_p), idx, valid)


def stl_core(Y32: np.ndarray, p: STLParams) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The ``stl`` function proper (stl.fut:51-382), on pre-filtered input.

    ``Y32``: [m, n] float32 (no all-NaN cycle-subseries — see
    :func:`stl_filt`). Returns (seasonal, trend, remainder), float32.
    """
    Y32 = np.asarray(Y32, dtype=np.float32)
    m, n = Y32.shape
    if m == 0:
        z = np.zeros((0, n), dtype=np.float32)
        return z, z.copy(), z.copy()
    n_p = p.n_p

    # grid geometry (stl.fut:89-104)
    max_css_len = math.ceil(n / n_p)
    pad_css_len = max_css_len + 2
    C_len = n + 2 * n_p

    s_n_m = pad_css_len if p.jump_s == 1 else max_css_len // p.jump_s + 3
    xs = np.arange(s_n_m, dtype=np.int64)
    s_m_vals = np.where(
        xs == 0, 0,
        np.where(xs == s_n_m - 1, pad_css_len - 1,
                 np.minimum((xs - 1) * p.jump_s + 1, max_css_len)))

    l_n_m = n if p.jump_l == 1 else n // p.jump_l + 1
    l_m_fun = lambda x: np.minimum(np.asarray(x, dtype=np.int64) * p.jump_l, n - 1)
    t_n_m = n if p.jump_t == 1 else n // p.jump_t + 1
    t_m_fun = lambda x: np.minimum(np.asarray(x, dtype=np.int64) * p.jump_t, n - 1)
    l_m_vals = l_m_fun(np.arange(l_n_m))
    t_m_vals = t_m_fun(np.arange(t_n_m))

    # ---- loop invariants (stl.fut:106-156) ----
    _, nn_idx, n_nn = filter_pad_nans(Y32.astype(np.float64))
    css_nn_idx, css_n_nn, css_idx_grid, css_valid = _css_views(Y32, n_p)
    B_css = m * n_p
    css_l_idx, css_lam = loess_params_css(
        p.q_s, s_m_vals, css_nn_idx.reshape(B_css, -1), css_n_nn.reshape(B_css))
    l_l_idx, l_lam = loess_params(p.q_l, l_m_vals, nn_idx, n_nn)
    t_l_idx, t_lam = loess_params(p.q_t, t_m_vals, nn_idx, n_nn)

    Yf = Y32.astype(np.float64)  # T.f32 upcast (stl.fut:178)
    seasonal = np.zeros((m, n), dtype=np.float64)
    trend = np.zeros((m, n), dtype=np.float64)
    weights = np.ones((m, n), dtype=np.float64)

    iota_n = np.broadcast_to(np.arange(n, dtype=np.int64)[None, :], (m, n))
    n_full = np.full(m, n, dtype=np.int64)
    # the reference passes (t_m_fun >-> (+1)) to BOTH the low-pass and trend
    # smoothers (stl.fut:240,295) — note jump_t inside the low-pass grid even
    # when jump_l differs (SURVEY.md §4 "semantic hazard"); reproduced as-is.
    lowpass_m_vals = t_m_fun(np.arange(l_n_m)) + 1
    trend_m_vals = t_m_vals + 1

    for i_outer in range(p.n_outer):
        for _ in range(p.n_inner):
            # Step 1: detrend (stl.fut:177-179)
            Y_det = Yf - trend

            # Step 2: css smoothing — gather detrended values + weights at
            # the compacted css indices (stl.fut:183-196)
            nn_id = css_nn_idx  # [m, n_p, L]
            gidx = nn_id * n_p + np.arange(n_p, dtype=np.int64)[None, :, None]
            ok = (gidx <= n - 1) & (nn_id >= 0)
            safe = np.clip(gidx, 0, n - 1)
            rows = np.arange(m)[:, None, None]
            css_nns = np.where(ok, Y_det[rows, safe], 0.0)
            css_ws = np.where(ok, weights[rows, safe], 0.0)

            css_fits, css_slopes = loess(
                css_nn_idx.reshape(B_css, -1), css_nns.reshape(B_css, -1),
                css_ws.reshape(B_css, -1), p.q_s, s_m_vals,
                css_l_idx, css_lam, css_n_nn.reshape(B_css), p.d_s)

            if p.jump_s == 1:
                css_results = css_fits  # [B_css, pad_css_len]
            else:
                s_m_fun = lambda x: np.where(
                    np.asarray(x) == 0, 0,
                    np.where(np.asarray(x) == s_n_m - 1, pad_css_len - 1,
                             np.minimum((np.asarray(x, dtype=np.int64) - 1) * p.jump_s + 1,
                                        max_css_len)))
                css_results = interpolate_css(s_m_fun, css_fits, css_slopes,
                                              pad_css_len, p.jump_s)
            css_results = css_results.reshape(m, n_p, pad_css_len)

            # interleave css -> C[n + 2*n_p] (stl.fut:227-229)
            ci = np.arange(C_len, dtype=np.int64)
            C = css_results[:, ci % n_p, ci // n_p]

            # Step 3: low-pass — MA(n_p) ∘ MA(n_p) ∘ MA(3), then LOESS
            ma3 = _moving_averages(C, n_p)  # [m, n]
            l_results, l_slopes = loess(
                iota_n, ma3, weights, p.q_l, lowpass_m_vals,
                l_l_idx, l_lam, n_full, p.d_l)
            if p.jump_l > 1:
                L_arr = interpolate(l_m_fun, l_results, l_slopes, n, p.jump_l)
            else:
                L_arr = l_results

            # Step 4: seasonal = C[n_p : n+n_p] - L (stl.fut:263-269)
            seasonal = C[:, n_p:n + n_p] - L_arr

            # Step 5: deseasonalize (stl.fut:273-277)
            D = Yf - seasonal

            # Step 6: trend smoothing on NaN-compacted D (stl.fut:280-313)
            D_pad = pad_gather(D, nn_idx, 0.0)
            w_pad = pad_gather(weights, nn_idx, 0.0)
            t_results, t_slopes = loess(
                nn_idx, D_pad, w_pad, p.q_t, trend_m_vals,
                t_l_idx, t_lam, n_nn, p.d_t)
            if p.jump_t > 1:
                trend = interpolate(t_m_fun, t_results, t_slopes, n, p.jump_t)
            else:
                trend = t_results

        # robustness weights update, skipped on the last outer pass
        # (stl.fut:326-370)
        if i_outer < p.n_outer - 1:
            R = Yf - seasonal - trend
            R_abs = np.where(np.isnan(R), R, np.abs(R))
            R_pad = pad_gather(R_abs, nn_idx, np.inf)
            med = median_l(R_pad, n_nn)
            h = 6 * med
            h9 = 0.999 * h
            h1 = 0.001 * h
            zero_val = 10 ** (-6)
            with np.errstate(invalid="ignore", divide="ignore"):
                bicube = (1 - (R_abs / h[:, None]) ** 2) ** 2
            # branch order is semantic (stl.fut:363-365)
            weights = np.where(
                np.isnan(R_abs) | (R_abs <= h1[:, None]), 1.0,
                np.where((R_abs >= h9[:, None]) | (R_abs <= zero_val),
                         zero_val, bicube))

    S32 = seasonal.astype(np.float32)  # stl.fut:375-377
    T32 = trend.astype(np.float32)
    R32 = Y32 - S32 - T32  # f32 arithmetic, NaN-propagating (stl.fut:378-381)
    return S32, T32, R32


def detect_allnan_css(Y32: np.ndarray, n_p: int) -> np.ndarray:
    """Rows having at least one all-NaN cycle-subseries (stl.fut:406-413)."""
    Y32 = np.asarray(Y32, dtype=np.float32)
    m, n = Y32.shape
    L = math.ceil(n / n_p)
    i = np.arange(n_p, dtype=np.int64)[:, None]
    j = np.arange(L, dtype=np.int64)[None, :]
    idx = j * n_p + i
    valid = idx < n
    vals = Y32[:, np.minimum(idx, n - 1)]
    isn = np.where(valid[None, :, :], np.isnan(vals), True)
    return isn.all(axis=2).any(axis=1)


def stl_filt(Y32: np.ndarray, p: STLParams):
    """``stl_filt`` (stl.fut:385-441): drop series with an all-NaN
    cycle-subseries, run STL on survivors, scatter back all-NaN rows."""
    Y32 = np.asarray(Y32, dtype=np.float32)
    m, n = Y32.shape
    bad = detect_allnan_css(Y32, p.n_p)
    S = np.full((m, n), np.nan, dtype=np.float32)
    T = np.full((m, n), np.nan, dtype=np.float32)
    R = np.full((m, n), np.nan, dtype=np.float32)
    if (~bad).any():
        s, t, r = stl_core(Y32[~bad], p)
        S[~bad], T[~bad], R[~bad] = s, t, r
    return S, T, R


def stl_fit(Y, n_p, q_s, q_t=None, q_l=None, d_s=1, d_t=1, d_l=None,
            jump_s=None, jump_t=None, jump_l=None, n_inner=2, n_outer=1,
            critfreq=0.05):
    """Public entry mirroring ``STL.fit`` (hastl/stl.py:73-243).

    ``critfreq`` is accepted-but-dead exactly like the reference
    (hastl/stl.py:295-324 is commented out there).
    """
    Y = np.asarray(Y)
    if Y.ndim != 2:
        raise TypeError("Y should be a 2d array")
    _, n = Y.shape
    p = canonicalize_stl_params(
        n, n_p, q_s, q_t, q_l, d_s, d_t, d_l,
        jump_s, jump_t, jump_l, n_inner, n_outer)
    return stl_filt(Y.astype(np.float32), p)


def stl_fit_1d(y, n_p, q_s, **kw):
    """hastl/stl.py:245-283."""
    y = np.asarray(y)
    if y.ndim != 1:
        raise TypeError("y should be a 1d array")
    s, t, r = stl_fit(y[None, :], n_p, q_s, **kw)
    return s[0], t[0], r[0]


def trend_magnitude(trend_l: np.ndarray) -> np.ndarray:
    """Closed-form OLS slope of trend vs x=1..n, scaled by n (stl.fut:481-494)."""
    trend_l = np.asarray(trend_l, dtype=np.float32)
    m, n = trend_l.shape
    x = np.arange(1, n + 1, dtype=np.float64)
    b = x.sum()
    c = (x * x).sum()
    a = float(n)
    det1 = 1.0 / (a * c - b * b)
    b11 = -b * det1
    c11 = a * det1
    res = ((b11 + x[None, :] * c11) * trend_l.astype(np.float64)).sum(axis=1) * a
    return res.astype(np.float32)


def seasonal_amplitude(seasonal_l: np.ndarray) -> np.ndarray:
    """max(s) - min(s), inf -> NaN (stl.fut:497-500)."""
    s = np.asarray(seasonal_l, dtype=np.float32)
    isn = np.isnan(s)
    mx = np.where(isn, -np.inf, s).max(axis=1)
    mn = np.where(isn, np.inf, s).min(axis=1)
    v = mx - mn
    return np.where(np.isinf(v), np.nan, v).astype(np.float32)
