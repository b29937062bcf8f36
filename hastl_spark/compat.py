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

_BACKENDS = ["opencl", "cuda", "multicore", "c"]


class STL:
    """Signature-compatible with hastl.STL (hastl/stl.py:25-71)."""

    def __init__(self, backend="c", jump_threshold_1=13, jump_threshold_2=16,
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

    def fit(self, Y, n_p, q_s, q_t=None, q_l=None, d_s=1, d_t=1, d_l=None,
            jump_s=None, jump_t=None, jump_l=None, n_inner=2, n_outer=1,
            critfreq=0.05, dump=False, manifest=True):
        return stl_fit(Y, n_p, q_s, q_t=q_t, q_l=q_l, d_s=d_s, d_t=d_t, d_l=d_l,
                       jump_s=jump_s, jump_t=jump_t, jump_l=jump_l,
                       n_inner=n_inner, n_outer=n_outer, critfreq=critfreq)

    def fit_1d(self, y, n_p, q_s, q_t=None, q_l=None, d_s=1, d_t=1, d_l=None,
               jump_s=None, jump_t=None, jump_l=None, n_inner=2, n_outer=1,
               critfreq=0.05, dump=False):
        return stl_fit_1d(y, n_p, q_s, q_t=q_t, q_l=q_l, d_s=d_s, d_t=d_t,
                          d_l=d_l, jump_s=jump_s, jump_t=jump_t, jump_l=jump_l,
                          n_inner=n_inner, n_outer=n_outer, critfreq=critfreq)

    def trend_magnitude(self, trend_data):
        return trend_magnitude(np.asarray(trend_data))

    def seasonal_amplitude(self, seasonal_data):
        return seasonal_amplitude(np.asarray(seasonal_data))


class LOESS:
    """Signature-compatible with hastl.LOESS (hastl/loess.py:9-52)."""

    def __init__(self, backend="c", jump_threshold_1=13, jump_threshold_2=16,
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
    """hastl/stl.py:369-379 — every 'backend' resolves to the NumPy kernel."""
    print("Installed HaSTL backens:")  # sic, matches reference output
    print(_BACKENDS)


def load_tuning_file(file_path):
    """hastl/stl.py:381-384, verbatim semantics."""
    with open(file_path) as f:
        lines = f.readlines()
    return {k: int(v) for k, v in
            map(lambda l: re.search(r"(.*)=([0-9]*)", l).groups(), lines)}
