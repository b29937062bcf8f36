"""Deterministic synthetic series generators for tests (FIXTURES.md §2).

Same construction as the reference's example generator
(examples/utils.py:17-33 ``gen_harmonic_data``: tiled sinusoid + linear
trend + gaussian noise, rounded to 4 decimals, seeded NaN injection) but
fully deterministic via ``np.random.default_rng`` instead of the reference's
unseeded ``np.random`` module state.
"""

from __future__ import annotations

import numpy as np


def gen_harmonic(out_len=500, noise_level=0.05, trend_coeff=0.0005,
                 period=2 * np.pi, n_p=52, nan_frac=0.1, seed=42):
    rng = np.random.default_rng(seed)
    n_pp = n_p + 1
    n_repeats = int(out_len / n_pp)
    x = np.linspace(0, period, n_pp)
    x1 = np.tile(x, n_repeats + 1)[:out_len]
    x2 = np.repeat(np.arange(n_repeats + 1) * (period + x1[1]), n_pp)[:out_len]
    x1 = x1 + x2
    noise = rng.normal(0, noise_level, out_len)
    trend = np.arange(out_len) * trend_coeff
    result = np.sin(x1) + trend + noise
    if nan_frac > 0:
        n_nans = int(out_len * nan_frac)
        idxs = rng.choice(out_len, size=n_nans, replace=False)
        result[idxs] = np.nan
    return np.round(result, 4)


def gen_batch(m=8, out_len=500, n_p=52, nan_fracs=None, seed0=0, **kw):
    if nan_fracs is None:
        nan_fracs = [0.05] * m
    rows = [gen_harmonic(out_len=out_len, n_p=n_p, nan_frac=nan_fracs[i % len(nan_fracs)],
                         seed=seed0 + i, **kw) for i in range(m)]
    return np.stack(rows).astype(np.float32)
