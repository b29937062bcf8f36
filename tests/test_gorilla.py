"""Gorilla codec round-trip fixtures (FIXTURES.md §3)."""

import numpy as np
import pytest

from hastl_spark.operators.gorilla import chunk_stats, decode, encode


def roundtrip(ts, vals):
    buf = encode(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, vals2 = decode(buf)
    np.testing.assert_array_equal(np.asarray(ts, np.int64), ts2)
    # bit-identical incl. NaN / -0.0 / denormals
    np.testing.assert_array_equal(
        np.asarray(vals, np.float64).view(np.uint64), vals2.view(np.uint64))
    return buf


def test_empty_and_single():
    roundtrip([], [])
    roundtrip([1700000000], [3.14])


def test_regular_grid_constant_values_compresses_hard():
    n = 10_000
    ts = 1700000000 + 60 * np.arange(n)
    vals = np.full(n, 42.5)
    buf = roundtrip(ts, vals)
    # dod=0 + xor=0 -> ~2 bits/point
    assert len(buf) < n / 3


def test_gappy_grid_and_harmonic_values():
    rng = np.random.default_rng(42)
    n = 5000
    keep = rng.random(n) > 0.05
    ts = (1700000000 + 60 * np.arange(n))[keep]
    vals = np.sin(np.arange(n) / 52)[keep] * 1000 + 5.0
    buf = roundtrip(ts, vals)
    assert len(buf) < keep.sum() * 10  # still well under raw 16 B/point


def test_large_jumps_and_special_floats():
    ts = np.array([0, 1, 100000, 100001, 2**40, 2**40 + 3], dtype=np.int64)
    vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324])
    roundtrip(ts, vals)


def test_negative_dod_buckets():
    # exercise every dod bucket: 0, ±small, ±medium, ±large, escape
    deltas = [60, 60, 61, 59, 120, 400, 100, 2100, 60, 10**7]
    ts = np.cumsum([1700000000] + deltas).astype(np.int64)
    vals = np.arange(len(ts), dtype=np.float64) * 0.1
    roundtrip(ts, vals)


def test_random_walk_values():
    rng = np.random.default_rng(7)
    n = 3000
    ts = 1700000000 + np.cumsum(rng.integers(1, 1000, n))
    vals = np.cumsum(rng.normal(0, 1, n))
    roundtrip(ts, vals)


def test_block_reuse_beats_raw():
    # values differing only in low mantissa bits -> '10' reuse path
    base = np.float64(1234.5678)
    vals = base + np.arange(2000) * 1e-9
    ts = 1700000000 + 60 * np.arange(2000)
    buf = roundtrip(ts, vals)
    assert len(buf) < 2000 * 16


def test_chunk_stats():
    vals = np.array([1.0, np.nan, 3.0])
    buf = encode(np.array([0, 60, 120], np.int64), vals)
    st = chunk_stats(vals, buf)
    assert st["n_points"] == 3
    assert st["v_min"] == 1.0 and st["v_max"] == 3.0 and st["v_sum"] == 4.0
    assert st["bytes"] == len(buf) and st["crc32"] != 0
