"""Property/randomized tests (SURVEY.md §5.2 layer 4): metamorphic and
invariant checks over seeded random inputs via hypothesis."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hastl_spark.kernel import loess_fit, nextodd, stl_fit
from hastl_spark.kernel.median import median_l
from hastl_spark.operators.gorilla import decode, encode

SET = dict(max_examples=25, deadline=None)


@given(st.floats(-1e6, 1e6))
@settings(**SET)
def test_nextodd_is_odd_and_close(x):
    v = nextodd(x)
    assert v % 2 == 1
    assert abs(v - x) <= 1.5


@given(st.integers(0, 2**31), st.integers(1, 200))
@settings(**SET)
def test_median_matches_sorted_definition(seed, n_nn):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.normal(0, 100, n_nn), 2)  # duplicates likely
    pad = np.full(max(0, 256 - n_nn), np.inf)
    arr = np.concatenate([vals, pad])[None, :]
    got = median_l(arr, np.array([n_nn]))[0]
    srt = np.sort(vals)
    k = n_nn // 2
    med = srt[k]
    if k == 0 or n_nn % 2 == 1:
        exp = med
    else:
        nlt = np.searchsorted(srt, med, side="left")
        exp = med if nlt < k else srt[nlt - 1] + (med - srt[nlt - 1]) / 2
    assert got == exp


@given(st.integers(0, 2**31))
@settings(max_examples=10, deadline=None)
def test_loess_affine_equivariance(seed):
    rng = np.random.default_rng(seed)
    n = 120
    y = rng.normal(0, 1, n).cumsum()
    y[rng.choice(n, 10, replace=False)] = np.nan
    a, b = 2.5, -7.0
    f1 = loess_fit(y, q=11, degree=1, jump=1)
    f2 = loess_fit(a * y + b, q=11, degree=1, jump=1)
    # LOESS is linear in y and reproduces constants (deg>=0 weights sum
    # normalized): f(a*y + b) == a*f(y) + b up to fp reassociation
    np.testing.assert_allclose(f2, a * f1 + b, rtol=1e-7, atol=1e-7)


@given(st.integers(0, 2**31))
@settings(max_examples=10, deadline=None)
def test_stl_reconstruction_random(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 4))
    n = int(rng.integers(120, 400))
    n_p = int(rng.integers(4, 20))
    Y = rng.normal(0, 1, (m, n)).cumsum(axis=1).astype(np.float32)
    nanfrac = float(rng.uniform(0, 0.3))
    mask = rng.random((m, n)) < nanfrac
    Y[mask] = np.nan
    S, T, R = stl_fit(Y, n_p=n_p, q_s=7, jump_s=1, jump_t=1, jump_l=1)
    from hastl_spark.kernel.stl import detect_allnan_css

    bad = detect_allnan_css(Y, n_p)
    for i in range(m):
        if bad[i]:
            assert np.isnan(S[i]).all()
            continue
        nn = ~np.isnan(Y[i])
        assert (np.isnan(R[i]) == ~nn).all()
        np.testing.assert_array_equal((Y[i] - S[i] - T[i]).astype(np.float32)[nn], R[i][nn])
        assert np.isfinite(S[i]).all() and np.isfinite(T[i]).all()


@given(st.integers(0, 2**31), st.integers(2, 400))
@settings(**SET)
def test_gorilla_roundtrip_random(seed, n):
    rng = np.random.default_rng(seed)
    ts = np.cumsum(rng.integers(1, 10**6, n)).astype(np.int64)
    kind = rng.integers(0, 3)
    if kind == 0:
        vals = rng.normal(0, 1e6, n)
    elif kind == 1:
        vals = np.repeat(rng.normal(0, 1, 1), n)
    else:
        vals = rng.normal(0, 1, n).cumsum()
        vals[rng.random(n) < 0.1] = np.nan
    t2, v2 = decode(encode(ts, vals))
    np.testing.assert_array_equal(ts, t2)
    np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))
