"""STL kernel end-to-end tests (SURVEY.md §5.2 layer 2, FIXTURES.md §2)."""

import numpy as np
import pytest

from gen import gen_batch, gen_harmonic
from hastl_spark.kernel import (
    canonicalize_stl_params,
    nextodd,
    seasonal_amplitude,
    stl_fit,
    stl_fit_1d,
    trend_magnitude,
)
from hastl_spark.kernel.median import median_l
from hastl_spark.kernel.stl import _moving_averages, detect_allnan_css


# ---------- param canonicalization (hastl/stl.py:139-176) ----------

def test_nextodd_bankers_rounding():
    # Python round() rounds half to even: round(4.5)=4 -> +1 -> 5; round(5.5)=6 -> +1 -> 7
    assert nextodd(4.5) == 5
    assert nextodd(5.5) == 7
    assert nextodd(6) == 7
    assert nextodd(7) == 7


def test_default_param_derivation():
    p = canonicalize_stl_params(500, n_p=52, q_s=19)
    # q_t = nextodd(1.5*52/(1-1.5/19)) = nextodd(84.685...) = 85
    assert p.q_t == 85
    assert p.q_l == nextodd(52) == 53
    assert p.d_l == p.d_t == 1
    assert p.jump_s == int(np.ceil(19 / 10)) == 2
    assert p.jump_t == int(np.ceil(85 / 10)) == 9
    assert p.jump_l == int(np.ceil(53 / 10)) == 6


def test_param_validation_errors():
    with pytest.raises(ValueError):
        canonicalize_stl_params(100, n_p=3, q_s=9)
    with pytest.raises(ValueError):
        canonicalize_stl_params(100, n_p=8, q_s=5)
    with pytest.raises(ValueError):
        canonicalize_stl_params(100, n_p=8, q_s=9, d_s=3)


# ---------- moving averages (stl.fut:23-40) ----------

def test_moving_averages_lengths_and_values():
    n_p, n = 4, 20
    x = np.arange(n + 2 * n_p, dtype=np.float64)[None, :]
    out = _moving_averages(x, n_p)
    assert out.shape == (1, n)
    # MA of a linear ramp is the ramp shifted by (w-1)/2, applied 3x:
    # shift = (4-1)/2 + (4-1)/2 + (3-1)/2 = 4 -> out[i] = i + 4
    np.testing.assert_allclose(out[0], np.arange(n) + 4.0, rtol=1e-12)


# ---------- median (median.fut:97-135) ----------

def test_median_odd_even_and_duplicates():
    pad = np.inf
    arr = np.array([
        [3.0, 1.0, 2.0, pad, pad],      # n_nn=3 odd -> 2
        [4.0, 1.0, 3.0, 2.0, pad],      # n_nn=4 even -> k=2 -> med=3, c=2 -> 2.5
        [5.0, 5.0, 1.0, 5.0, pad],      # n_nn=4, med=sorted[2]=5, nlt=1 < k=2 -> 5
        [7.0, pad, pad, pad, pad],      # n_nn=1, k=0 -> 7
    ])
    n_nn = np.array([3, 4, 4, 1])
    med = median_l(arr, n_nn)
    np.testing.assert_allclose(med, [2.0, 2.5, 5.0, 7.0])


def test_median_matches_numpy_on_odd():
    rng = np.random.default_rng(5)
    for n_nn in [1, 3, 7, 55]:
        v = rng.normal(0, 1, n_nn)
        pad = np.full(64 - n_nn, np.inf)
        got = median_l(np.concatenate([v, pad])[None, :], np.array([n_nn]))[0]
        assert got == np.median(v)


# ---------- STL end-to-end ----------

HARM = dict(out_len=500, n_p=52, nan_frac=0.05, trend_coeff=0.002, noise_level=0.05)


def _reconstruction_checks(y, s, t, r):
    nanmask = np.isnan(y)
    # remainder NaN exactly where input NaN (stl.fut:378-381)
    assert (np.isnan(r) == nanmask).all()
    # gap-fill property: seasonal+trend finite everywhere, incl. gaps
    assert np.isfinite(s).all() and np.isfinite(t).all()
    # exact f32 reconstruction at non-NaN points: r = y - s - t in f32
    lhs = (y - s - t).astype(np.float32)
    np.testing.assert_array_equal(lhs[~nanmask], r[~nanmask])


def test_harmonic_1d_jump1():
    y = gen_harmonic(seed=101, **HARM).astype(np.float32)
    s, t, r = stl_fit_1d(y, n_p=52, q_s=19, d_s=0,
                         jump_s=1, jump_t=1, jump_l=1)
    _reconstruction_checks(y, s, t, r)
    # the decomposition should actually recover the structure:
    # trend ~ linear with slope 0.002, seasonal ~ sin with amplitude ~1
    xs = np.arange(500)
    slope = np.polyfit(xs, t.astype(np.float64), 1)[0]
    assert slope == pytest.approx(0.002, rel=0.25)
    amp = seasonal_amplitude(s[None, :])[0]
    assert 1.5 < amp < 2.5  # sin peak-to-peak = 2


def test_harmonic_default_jumps():
    # default jumps > 1 exercise the Hermite path incl. the css variant
    y = gen_harmonic(seed=101, **HARM).astype(np.float32)
    s, t, r = stl_fit_1d(y, n_p=52, q_s=19, d_s=0)
    _reconstruction_checks(y, s, t, r)


def test_batch_matches_1d():
    Y = gen_batch(m=6, out_len=500, n_p=52, nan_fracs=[0.0, 0.05, 0.2], seed0=10)
    S, T, R = stl_fit(Y, n_p=52, q_s=19, d_s=0, jump_s=1, jump_t=1, jump_l=1)
    for i in range(6):
        s, t, r = stl_fit_1d(Y[i], n_p=52, q_s=19, d_s=0,
                             jump_s=1, jump_t=1, jump_l=1)
        np.testing.assert_array_equal(S[i], s)
        np.testing.assert_array_equal(T[i], t)
        nn = ~np.isnan(Y[i])
        np.testing.assert_array_equal(R[i][nn], r[nn])


@pytest.mark.parametrize("d_s,d_t", [(0, 1), (1, 1), (2, 2), (1, 0)])
def test_degree_matrix_no_nan(d_s, d_t):
    Y = gen_batch(m=4, out_len=512, n_p=16, nan_fracs=[0.0], seed0=20)
    S, T, R = stl_fit(Y, n_p=16, q_s=9, d_s=d_s, d_t=d_t,
                      jump_s=1, jump_t=1, jump_l=1)
    for i in range(4):
        _reconstruction_checks(Y[i], S[i], T[i], R[i])


def test_allnan_css_row_scattered_back():
    # row 2: make cycle-subseries 3 (mod n_p=10) entirely NaN (FIXTURES allnan_css)
    Y = gen_batch(m=4, out_len=100, n_p=10, nan_fracs=[0.02], seed0=30)
    Y[2, 3::10] = np.nan
    assert detect_allnan_css(Y, 10)[2]
    S, T, R = stl_fit(Y, n_p=10, q_s=7, jump_s=1, jump_t=1, jump_l=1)
    assert np.isnan(S[2]).all() and np.isnan(T[2]).all() and np.isnan(R[2]).all()
    for i in [0, 1, 3]:
        _reconstruction_checks(Y[i], S[i], T[i], R[i])


def test_robustness_outer_loop_downweights_outliers():
    y = gen_harmonic(seed=7, out_len=500, n_p=52, nan_frac=0.05,
                     trend_coeff=0.002, noise_level=0.05).astype(np.float32)
    y_spiked = y.copy()
    spikes = [50, 150, 250, 350]
    y_spiked[spikes] = 10.0
    s1, t1, r1 = stl_fit_1d(y_spiked, n_p=52, q_s=19, d_s=0,
                            n_inner=1, n_outer=5, jump_s=1, jump_t=1, jump_l=1)
    s0, t0, r0 = stl_fit_1d(y_spiked, n_p=52, q_s=19, d_s=0,
                            n_inner=1, n_outer=1, jump_s=1, jump_t=1, jump_l=1)
    _reconstruction_checks(y_spiked, s1, t1, r1)
    # robust trend should be closer to the clean trend than the non-robust one
    sc, tc, rc = stl_fit_1d(y, n_p=52, q_s=19, d_s=0,
                            n_inner=1, n_outer=1, jump_s=1, jump_t=1, jump_l=1)
    nn = ~np.isnan(y_spiked)
    err_robust = np.abs(t1 - tc)[nn].mean()
    err_plain = np.abs(t0 - tc)[nn].mean()
    assert err_robust < err_plain


def test_sparse_heavy_nans():
    # 60% NaN exercises the q > n_nn lambda-inflation path (loess.fut:682)
    Y = gen_batch(m=8, out_len=400, n_p=8, nan_fracs=[0.6], seed0=40)
    bad = detect_allnan_css(Y, 8)
    S, T, R = stl_fit(Y, n_p=8, q_s=7, jump_s=1, jump_t=1, jump_l=1)
    for i in range(8):
        if bad[i]:
            assert np.isnan(S[i]).all()
        else:
            _reconstruction_checks(Y[i], S[i], T[i], R[i])


def test_metamorphic_constant_shift_moves_trend():
    y = gen_harmonic(seed=9, **HARM).astype(np.float32)
    s0, t0, _ = stl_fit_1d(y, n_p=52, q_s=19, jump_s=1, jump_t=1, jump_l=1)
    s1, t1, _ = stl_fit_1d(y + 100.0, n_p=52, q_s=19, jump_s=1, jump_t=1, jump_l=1)
    nn = ~np.isnan(y)
    # LOESS is linear in y: adding a constant shifts trend by ~the constant
    np.testing.assert_allclose(t1[nn] - t0[nn], 100.0, atol=2e-2)
    np.testing.assert_allclose(s1[nn], s0[nn], atol=2e-2)


def test_trend_magnitude_linear():
    # exact line: slope*n scaling per stl.fut:481-494
    n = 200
    tr = (0.01 * np.arange(1, n + 1)).astype(np.float32)[None, :]
    tm = trend_magnitude(tr)[0]
    assert tm == pytest.approx(0.01 * n, rel=1e-5)


def test_seasonal_amplitude_inf_to_nan():
    s = np.array([[1.0, -1.0, 0.5], [np.nan, np.nan, np.nan]], dtype=np.float32)
    amp = seasonal_amplitude(s)
    assert amp[0] == pytest.approx(2.0)
    assert np.isnan(amp[1])


def test_stl_jump_paths_end_to_end():
    """jump_{s,t,l} > 1 exercise the interpolate/interpolate_css branches
    (stl.fut:216-224, 250-256, 303-313): decomposition must stay finite,
    reconstruct exactly, and track the jump=1 fit closely on a smooth
    series (loess-at-sampled-points + cubic Hermite between)."""
    import numpy as np

    from gen import gen_harmonic
    from hastl_spark.kernel import stl_fit_1d

    y = gen_harmonic(out_len=600, n_p=24, nan_frac=0.0, trend_coeff=0.002,
                     noise_level=0.02, seed=5).astype(np.float32)
    s1, t1, r1 = stl_fit_1d(y, n_p=24, q_s=13, d_s=0,
                            jump_s=1, jump_t=1, jump_l=1)
    # jump_s alone is a clean sampled-fit + Hermite interpolation: it must
    # track the dense fit closely
    s2, t2, r2 = stl_fit_1d(y, n_p=24, q_s=13, d_s=0,
                            jump_s=4, jump_t=1, jump_l=1)
    np.testing.assert_allclose(
        (s2 + t2 + r2).astype(np.float32), y.astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(s2, s1, rtol=0, atol=0.02)
    np.testing.assert_allclose(t2, t1, rtol=0, atol=0.02)
    # jump_t / jump_l route through the reference's t_m_fun-in-lowpass
    # hazard (stl.fut:240 feeds t_m_fun>->(+1) into the low-pass smoother
    # even when jump_l != jump_t), so their output deliberately DIVERGES
    # from the dense fit — reproduced as-is. Pin: finite, reconstructs,
    # deterministic.
    s3, t3, r3 = stl_fit_1d(y, n_p=24, q_s=13, d_s=0,
                            jump_s=2, jump_t=5, jump_l=3)
    assert np.isfinite(s3).all() and np.isfinite(t3).all()
    np.testing.assert_allclose(
        (s3 + t3 + r3).astype(np.float32), y.astype(np.float32), atol=1e-6)
    s3b, t3b, _ = stl_fit_1d(y, n_p=24, q_s=13, d_s=0,
                             jump_s=2, jump_t=5, jump_l=3)
    np.testing.assert_array_equal(s3, s3b)
    np.testing.assert_array_equal(t3, t3b)


def test_loess_jump_matches_dense_at_sampled_points():
    """LOESS with jump=k fits directly at positions 0, k, 2k, ...; those
    values must equal the jump=1 fit at the same positions (interpolation
    only fills between them) — loess.fut:559-626 scheduling equivalence."""
    import numpy as np

    from gen import gen_harmonic
    from hastl_spark.kernel import loess_fit

    y = gen_harmonic(out_len=400, n_p=24, nan_frac=0.0, seed=11).astype(np.float64)
    dense = loess_fit(y, q=25, degree=1, jump=1)
    jumped = loess_fit(y, q=25, degree=1, jump=4)
    pts = np.arange(0, 400, 4)
    np.testing.assert_allclose(jumped[pts], dense[pts], rtol=0, atol=1e-6)
