"""Reference-API compatibility layer: a caller written against the
reference's public surface runs unchanged."""

import numpy as np
import pytest

from gen import gen_harmonic
from hastl_spark.compat import LOESS, STL, load_tuning_file, print_installed_backends
from hastl_spark.kernel import loess_fit, stl_fit_1d


def test_reference_example_flow():
    # examples/harmonic.py:52-58 verbatim (minus plotting)
    data = gen_harmonic(out_len=500, n_p=52, nan_frac=0.05,
                        trend_coeff=0.002, noise_level=0.05, seed=101).astype(np.float32)
    stl = STL(debug=True, backend="c")
    seasonal, trend, remainder = stl.fit_1d(data, n_p=52, q_s=19, d_s=0)
    s2, t2, r2 = stl_fit_1d(data, n_p=52, q_s=19, d_s=0)
    np.testing.assert_array_equal(seasonal, s2)
    np.testing.assert_array_equal(trend, t2)
    tm = stl.trend_magnitude(trend[None, :])
    sa = stl.seasonal_amplitude(seasonal[None, :])
    assert tm.shape == (1,) and sa.shape == (1,)


def test_loess_class_matches_kernel():
    # examples/loess_test.py:9,38-44 style
    y = gen_harmonic(out_len=500, n_p=52, nan_frac=0.0, seed=3).astype(np.float64)
    lo = LOESS(backend="c")
    for q in (11, 101):
        np.testing.assert_array_equal(lo.fit_1d(y, q, jump=1),
                                      loess_fit(y, q, jump=1))
    with pytest.raises(TypeError):
        lo.fit(y, 11)  # 1d into fit: same error contract as the reference
    with pytest.raises(ValueError):
        LOESS(backend="tpu")


def test_tuning_file_and_backends(tmp_path, capsys):
    p = tmp_path / "t.tuning"
    p.write_text("main.suff_outer_par_0=1024\nthreshold=13\n")
    assert load_tuning_file(str(p)) == {"main.suff_outer_par_0": 1024, "threshold": 13}
    print_installed_backends()
    out = capsys.readouterr().out
    assert "backens" in out  # reference's exact (typo'd) banner


def test_fit_dump_writes_reference_field_set(tmp_path, monkeypatch, capsys):
    """STL.fit(dump=True) must produce dump.in with the reference's exact
    field sequence (hastl/stl.py:183-211) — and RETURN (the reference
    exit()s; a library embedded in Spark executors must not)."""
    monkeypatch.chdir(tmp_path)
    y = gen_harmonic(out_len=300, n_p=24, nan_frac=0.0, seed=9).astype(np.float32)
    stl = STL(backend="c")
    s, t, r = stl.fit_1d(y, n_p=24, q_s=13, d_s=0, dump=True)
    assert s.shape == y.shape  # control returned and the fit still ran
    assert (tmp_path / "dump.in").exists()
    data = np.load(tmp_path / "dump.in")
    expect = ["Y", "n_p", "q_s", "q_t", "q_l", "d_s", "d_t", "d_l",
              "n_jump_s", "n_jump_t", "n_jump_l", "n_inner", "n_outer",
              "jump threshold_1", "jump threshold_2",
              "q_threshold_1", "q_threshold_2"]
    assert list(data.keys()) == expect
    assert int(data["n_p"]) == 24 and int(data["q_s"]) == 13
    # the reference's dump loop (stl.py:201) writes self.jump_threshold_1
    # UN-overridden even on the c backend (the 10^7 override at stl.py:178
    # only feeds the kernel call) — dump parity requires the ctor value
    assert int(data["jump threshold_1"]) == 13
    out = capsys.readouterr().out
    assert "n_jump_s:" in out  # params printed like the reference
