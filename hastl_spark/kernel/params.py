"""Parameter canonicalization for STL / LOESS.

Reproduces the reference's Python-side parameter derivation exactly
(reference: hastl/stl.py:139-176, 327-357 and hastl/loess.py:65-70).
Notably ``nextodd`` uses Python's ``round`` (banker's rounding), not
``np.round`` (hastl/stl.py:333-336).
"""

from __future__ import annotations

import dataclasses
import math


def nextodd(x: float) -> int:
    # hastl/stl.py:333-336 — Python round() = round-half-even
    x = round(x)
    return int(x + 1 if x % 2 == 0 else x)


def degcheck(x: int) -> int:
    # hastl/stl.py:327-331
    x = int(x)
    if not (0 <= x <= 2):
        raise ValueError("Smoothing degree must be 0, 1, or 2")
    return x


def wincheck(x: int) -> int:
    # hastl/stl.py:338-342
    x = nextodd(x)
    if x <= 0:
        raise ValueError("Window lengths must be positive")
    return x


def len_check(x: int, name: str) -> int:
    # hastl/stl.py:353-357
    x = int(x)
    if x < 0:
        raise ValueError(f"{name} value must be non-negative")
    return x


def jump_check(j: int, n: int) -> int:
    # hastl/stl.py:344-348
    n_m = n if j == 1 else n / j + 1
    if n_m < 2:
        raise ValueError("Jump value is set too high, must be <= n")
    return len_check(j, "Jump")


def iter_check(x: int) -> int:
    # hastl/stl.py:350-351
    return len_check(x, "Number of iterations")


@dataclasses.dataclass(frozen=True)
class STLParams:
    """Fully-canonicalized STL hyper-parameters (hastl/stl.py:139-176)."""

    n_p: int
    q_s: int
    q_t: int
    q_l: int
    d_s: int
    d_t: int
    d_l: int
    jump_s: int
    jump_t: int
    jump_l: int
    n_inner: int
    n_outer: int


def canonicalize_stl_params(
    n,
    n_p,
    q_s,
    q_t=None,
    q_l=None,
    d_s=1,
    d_t=1,
    d_l=None,
    jump_s=None,
    jump_t=None,
    jump_l=None,
    n_inner=2,
    n_outer=1,
) -> STLParams:
    """Derive defaults exactly as the reference does (hastl/stl.py:139-176)."""
    if n_p < 4:
        raise ValueError(f"n_p was set to {n_p}. Must be at least 4")
    n_p = int(n_p)

    if q_s < 7:
        raise ValueError(f"q_s was set to {q_s}. Must be at least 7")
    q_s = wincheck(q_s)

    if q_t is None:
        q_t = nextodd(1.5 * n_p / (1 - 1.5 / q_s))  # hastl/stl.py:148
    q_t = wincheck(q_t)

    if q_l is None:
        q_l = nextodd(n_p)  # hastl/stl.py:153
    q_l = wincheck(q_l)

    d_s = degcheck(d_s)
    d_t = degcheck(d_t)
    if d_l is None:
        d_l = d_t  # hastl/stl.py:160
    d_l = degcheck(d_l)

    if jump_s is None:
        jump_s = math.ceil(q_s / 10)  # hastl/stl.py:164
    jump_s = jump_check(jump_s, n)

    if jump_t is None:
        jump_t = math.ceil(q_t / 10)  # hastl/stl.py:168
    jump_t = jump_check(jump_t, n)

    if jump_l is None:
        jump_l = math.ceil(q_l / 10)  # hastl/stl.py:172
    jump_l = jump_check(jump_l, n)

    n_inner = iter_check(n_inner)
    n_outer = iter_check(n_outer)

    return STLParams(
        n_p=n_p, q_s=q_s, q_t=q_t, q_l=q_l,
        d_s=d_s, d_t=d_t, d_l=d_l,
        jump_s=jump_s, jump_t=jump_t, jump_l=jump_l,
        n_inner=n_inner, n_outer=n_outer,
    )
