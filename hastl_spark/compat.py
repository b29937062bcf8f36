"""Drop-in API compatibility layer: the reference's public surface
(``from hastl import STL, LOESS, print_installed_backends,
load_tuning_file`` — hastl/__init__.py:1-2) re-exposed 1:1 over the NumPy
kernel, so reference callers can switch imports and run unchanged.

``backend`` and device/tuning parameters are accepted for signature parity;
execution is always the vectorized NumPy kernel (batch parallelism comes
from Spark tasks in the engine proper, not GPU workgroups — SURVEY.md §4).
The jump/q threshold parameters are retained as provenance but do not
dispatch between kernels (the reference's three variants are mathematically
identical scheduling alternatives, loess.fut:559-626).
"""

from __future__ import annotations

import re

import numpy as np

from .kernel import loess_fit, seasonal_amplitude, stl_fit, stl_fit_1d, trend_magnitude
from .kernel.params import canonicalize_stl_params

_BACKENDS = ["opencl", "cuda", "multicore", "c"]


def _dump_stl_input(Y, n_p, q_s, q_t, q_l, d_s, d_t, d_l, jump_s, jump_t,
                    jump_l, n_inner, n_outer, thresholds, path="dump.in"):
    """Reference ``STL.fit(dump=True)`` twin (hastl/stl.py:183-211): write
    the f32 input plus the canonicalized int64 parameter sequence to
    ``dump.in`` and print each parameter. The reference serializes with
    futhark_data (used here too when importable) and then exit()s; a
    library must not kill the caller's process — Spark executors included —
    so this returns instead. Without futhark_data (not installable in this
    offline container) the fallback is ``hastl_spark.futharkdata`` — the
    Futhark binary data format v2 implemented from its public spec, so the
    identical field sequence is still directly consumable by
    ``futhark bench`` / compiled Futhark binaries."""
    Y_32 = np.asarray(Y).astype(np.float32)
    p = canonicalize_stl_params(Y_32.shape[-1], n_p, q_s, q_t=q_t, q_l=q_l,
                                d_s=d_s, d_t=d_t, d_l=d_l, jump_s=jump_s,
                                jump_t=jump_t, jump_l=jump_l,
                                n_inner=n_inner, n_outer=n_outer)
    # field order matches the reference's dump loop (stl.py:189-204)
    params = [(p.n_p, "n_p"), (p.q_s, "q_s"), (p.q_t, "q_t"), (p.q_l, "q_l"),
              (p.d_s, "d_s"), (p.d_t, "d_t"), (p.d_l, "d_l"),
              (p.jump_s, "n_jump_s"), (p.jump_t, "n_jump_t"),
              (p.jump_l, "n_jump_l"), (p.n_inner, "n_inner"),
              (p.n_outer, "n_outer"),
              (thresholds[0], "jump threshold_1"),
              (thresholds[1], "jump threshold_2"),
              (thresholds[2], "q_threshold_1"),
              (thresholds[3], "q_threshold_2")]
    try:
        import futhark_data  # noqa: F401 — not in this container; see below

        with open(path, "wb") as f:
            futhark_data.dump(Y_32, f)
            for par, name in params:
                print(f"{name}: {par}")
                futhark_data.dump(np.int64(par), f)
    except ImportError:
        from . import futharkdata

        with open(path, "wb") as f:
            futharkdata.dump(Y_32, f)
            for par, name in params:
                print(f"{name}: {par}")
                futharkdata.dump(np.int64(par), f)


class STL:
    """Signature-compatible with hastl.STL (hastl/stl.py:25-71). Default
    backend matches the reference ("opencl", stl.py:26); every backend name
    resolves to the same vectorized NumPy kernel here."""

    def __init__(self, backend="opencl", jump_threshold_1=13, jump_threshold_2=16,
                 q_threshold_1=511, q_threshold_2=1023, tuning=None, device=None,
                 platform=None, profiling=False, debug=False):
        if backend not in _BACKENDS:
            raise ValueError(f"Unknown backend: '{backend}'")
        self.backend = backend
        self.jump_threshold_1 = jump_threshold_1
        self.jump_threshold_2 = jump_threshold_2
        self.q_threshold_1 = q_threshold_1
        self.q_threshold_2 = q_threshold_2
        self.debug = debug

    def _thresholds(self):
        """Threshold tuple as the reference DUMPS it (stl.py:189-204): the
        constructor values verbatim. The c/multicore jump_threshold_1
        override (stl.py:178) applies only where the kernel is invoked —
        the reference's dump loop writes self.jump_threshold_1 un-overridden,
        so the dump must too (byte parity with reference dump.in)."""
        return (self.jump_threshold_1, self.jump_threshold_2,
                self.q_threshold_1, self.q_threshold_2)

    def _kernel_jump_threshold_1(self):
        # stl.py:178: c/multicore force jump_threshold_1 to 10^7 at CALL time
        # (kept as provenance; no kernel dispatch uses it here)
        return (10000000 if self.backend in ("c", "multicore")
                else self.jump_threshold_1)

    def fit(self, Y, n_p, q_s, q_t=None, q_l=None, d_s=1, d_t=1, d_l=None,
            jump_s=None, jump_t=None, jump_l=None, n_inner=2, n_outer=1,
            critfreq=0.05, dump=False, manifest=True):
        if dump:
            _dump_stl_input(Y, n_p, q_s, q_t, q_l, d_s, d_t, d_l, jump_s,
                            jump_t, jump_l, n_inner, n_outer, self._thresholds())
        return stl_fit(Y, n_p, q_s, q_t=q_t, q_l=q_l, d_s=d_s, d_t=d_t, d_l=d_l,
                       jump_s=jump_s, jump_t=jump_t, jump_l=jump_l,
                       n_inner=n_inner, n_outer=n_outer, critfreq=critfreq)

    def fit_1d(self, y, n_p, q_s, q_t=None, q_l=None, d_s=1, d_t=1, d_l=None,
               jump_s=None, jump_t=None, jump_l=None, n_inner=2, n_outer=1,
               critfreq=0.05, dump=False):
        if dump:
            _dump_stl_input(np.asarray(y)[None, :], n_p, q_s, q_t, q_l, d_s,
                            d_t, d_l, jump_s, jump_t, jump_l, n_inner, n_outer,
                            self._thresholds())
        return stl_fit_1d(y, n_p, q_s, q_t=q_t, q_l=q_l, d_s=d_s, d_t=d_t,
                          d_l=d_l, jump_s=jump_s, jump_t=jump_t, jump_l=jump_l,
                          n_inner=n_inner, n_outer=n_outer, critfreq=critfreq)

    def trend_magnitude(self, trend_data):
        return trend_magnitude(np.asarray(trend_data))

    def seasonal_amplitude(self, seasonal_data):
        return seasonal_amplitude(np.asarray(seasonal_data))


class LOESS:
    """Signature-compatible with hastl.LOESS (hastl/loess.py:9-52); default
    backend matches the reference ("opencl", loess.py:14)."""

    def __init__(self, backend="opencl", jump_threshold_1=13, jump_threshold_2=16,
                 q_threshold_1=511, q_threshold_2=1023, tuning=None, device=None,
                 platform=None, debug=False):
        if backend not in _BACKENDS:
            raise ValueError(f"Unknown backend: '{backend}'")
        self.backend = backend

    def fit(self, Y, q, degree=1, jump=None):
        Y = np.asarray(Y)
        if Y.ndim != 2:
            raise TypeError("Y should be a 2d array")
        return loess_fit(Y, q, degree=degree, jump=jump)

    def fit_1d(self, y, q, degree=1, jump=None):
        y = np.asarray(y)
        if y.ndim != 1:
            raise TypeError("y should be a 1d array")
        return loess_fit(y, q, degree=degree, jump=jump)


def print_installed_backends():
    """hastl/stl.py:369-379: the reference probes one compiled module per
    backend name and prints only the importable ones. Here every backend
    name maps to the one NumPy kernel module, so each is 'installed' exactly
    when that kernel imports — probed the same way, not assumed."""
    installed = []
    for backend in ["cuda", "opencl", "multicore", "c"]:
        try:
            from . import kernel  # noqa: F401 — the single execution engine
        except ImportError:
            pass
        else:
            installed.append(backend)
    print("Installed HaSTL backens:")  # sic, matches reference output
    print(installed)


def load_tuning_file(file_path):
    """hastl/stl.py:381-384, verbatim semantics."""
    with open(file_path) as f:
        lines = f.readlines()
    return {k: int(v) for k, v in
            map(lambda l: re.search(r"(.*)=([0-9]*)", l).groups(), lines)}
