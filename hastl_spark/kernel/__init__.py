"""Pure-NumPy numerical kernel: batched STL + LOESS with NaN gap support.

Exact transliteration of the reference math (hastl/src/futhark/{stl,loess,
median,utils}.fut) — serves as both the correctness oracle and the kernel
invoked inside Spark pandas UDFs.
"""

from .loess import loess_fit
from .params import STLParams, canonicalize_stl_params, nextodd
from .stl import (
    seasonal_amplitude,
    stl_core,
    stl_filt,
    stl_fit,
    stl_fit_1d,
    trend_magnitude,
)

__all__ = [
    "STLParams",
    "canonicalize_stl_params",
    "loess_fit",
    "nextodd",
    "seasonal_amplitude",
    "stl_core",
    "stl_filt",
    "stl_fit",
    "stl_fit_1d",
    "trend_magnitude",
]
