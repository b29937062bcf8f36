"""STL gap-fill over per-(source) bucket series — the engine's one hot-path
pandas UDF (``applyInPandas``, Arrow-batched, vectorized NumPy inside; no
per-row Python, per BASELINE.json input_hint).

Each group = one source's rolled-up series. Grid densification happens
*inside* the UDF (reindex onto the complete bucket grid, NaN at gaps) —
doing it relationally would cost an extra shuffle + join for data the UDF
already holds (SURVEY.md §3.4).

Scale note: group size is bounded by the TIME RANGE (minutes in the
retention window), not by raw data volume — a year of minutes is ~525k
points, comfortably one task even at 10^12 input sequences. The skew-heavy
dimension (docs per source) was already collapsed by the salted rollup.
For windows beyond that (decades of minutes, or second-granularity tiers),
pass ``chunk_buckets``: the grid is split into fixed-size chunks with a
halo of surrounding buckets, one STL task per (source, chunk), interiors
stitched — bounding every task regardless of series length. With the
default ``n_outer=1`` the kernel applies no cross-chunk statistic (the
robustness-weight update is skipped on the last outer pass), and every
loess window is local, so a halo covering the widest window
(max(q_s*n_p, q_t, q_l)) reproduces the unchunked interior values EXACTLY
on gap-free grids (pinned by test). On gappy grids the match is only
approximate, for a reason inherent to the reference: stl.fut precomputes
the low-pass loess windows from the NaN-compacted index array
(stl.fut:145-148) but applies them to the DENSE ma3 series
(stl.fut:236-243), so every fit window is shifted left by the number of
NaNs occurring anywhere before it — a global dependence on the NaN prefix
count that no windowed computation can reproduce. The chunked path is
therefore "reference STL applied to each chunk window"; the unchunked
default remains the globally reference-exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernel import canonicalize_stl_params
from ..kernel.stl import stl_filt

GAPFILL_SCHEMA = (
    "source string, bucket timestamp, y double, seasonal double, "
    "trend double, remainder double, gapfilled double, cnt long"
)


def stl_gapfill(
    rollup: DataFrame,
    value_col: str = "sum_n_tok",
    bucket_seconds: int = 60,
    n_p: int = 52,
    q_s: int = 19,
    d_s: int = 0,
    jump_s: int = 1,
    jump_t: int = 1,
    jump_l: int = 1,
    n_inner: int = 2,
    n_outer: int = 1,
    key_col: str = "source",
    chunk_buckets: int | None = None,
    halo_buckets: int | None = None,
    **extra_params,
) -> DataFrame:
    """rollup(source, bucket, cnt, value_col) -> densified + decomposed series.

    Output columns: y (raw value, NaN at grid gaps), seasonal/trend/remainder
    (reference STL semantics: remainder NaN at gaps, seasonal+trend defined
    everywhere — stl.fut:378-381), gapfilled = y where present else
    seasonal+trend.
    """
    freq = f"{bucket_seconds}s"
    params = dict(q_s=q_s, d_s=d_s, jump_s=jump_s, jump_t=jump_t,
                  jump_l=jump_l, n_inner=n_inner, n_outer=n_outer, **extra_params)

    if chunk_buckets is not None:
        return _stl_gapfill_chunked(rollup, value_col, bucket_seconds, n_p,
                                    params, key_col, chunk_buckets, halo_buckets)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        source = key[0]
        pdf = pdf.sort_values("bucket")
        idx = pd.DatetimeIndex(pdf["bucket"])
        grid = pd.date_range(idx.min(), idx.max(), freq=freq)
        s = pd.Series(pdf[value_col].astype("float64").values, index=idx)
        s = s.reindex(grid)
        cnt = pd.Series(pdf["cnt"].values, index=idx).reindex(grid).fillna(0).astype("int64")
        y = s.values  # float64, NaN at gaps
        n = len(y)
        if n < 2 * n_p:
            # series too short for a seasonal fit: pass through, no decomposition
            nanv = np.full(n, np.nan)
            return pd.DataFrame({
                key_col: source, "bucket": grid, "y": y,
                "seasonal": nanv, "trend": nanv, "remainder": nanv,
                "gapfilled": y, "cnt": cnt.values,
            })
        p = canonicalize_stl_params(n, n_p, **params)
        S, T, R = stl_filt(y[None, :].astype(np.float32), p)
        S, T, R = S[0].astype(np.float64), T[0].astype(np.float64), R[0].astype(np.float64)
        gapfilled = np.where(np.isnan(y), S + T, y)
        return pd.DataFrame({
            key_col: source, "bucket": grid, "y": y,
            "seasonal": S, "trend": T, "remainder": R,
            "gapfilled": gapfilled, "cnt": cnt.values,
        })

    schema = GAPFILL_SCHEMA.replace("source string", f"{key_col} string")
    # Pin the grouped-map parallelism: the rolled-up input is small in bytes,
    # so AQE's partition coalescing would funnel every group into one or two
    # tasks and serialize the STL kernels. An explicit hash repartition by
    # the group key keeps one task per key-bucket (the groupBy reuses this
    # exchange — no extra shuffle) and scales with the session's cores.
    import pyspark.sql.functions as F

    n_parts = rollup.sparkSession.sparkContext.defaultParallelism * 2
    rollup = rollup.repartition(n_parts, F.col(key_col))
    return rollup.groupBy(key_col).applyInPandas(fn, schema)


def _stl_gapfill_chunked(rollup: DataFrame, value_col: str, bucket_seconds: int,
                         n_p: int, params: dict, key_col: str,
                         chunk_buckets: int, halo_buckets: int | None) -> DataFrame:
    """Grid-chunked STL gap-fill: split each key's bucket grid into
    ``chunk_buckets``-sized chunks, extend each by a halo wide enough to
    cover the widest loess window, run one STL task per (key, chunk), emit
    only chunk interiors (an exact partition of the global grid — no
    overlap, no stitch seams).

    Rows are assigned to their own chunk plus any neighbor whose halo they
    fall into (a relational explode — no driver loop), so the grouped-map
    task size is bounded by chunk + 2*halo regardless of series length.

    Caveat: a chunk whose [start - halo, end + halo) range contains no
    observations at all never materializes, so gaps longer than
    chunk + 2*halo are not extrapolated across (the unchunked path fills
    them from the global fit). At that gap size there is no nearby anchor
    anyway; size chunks to the retention window's plausible gap scale.
    """
    from pyspark.sql import functions as F

    from ..kernel import canonicalize_stl_params

    C = int(chunk_buckets)
    p0 = canonicalize_stl_params(10 ** 9, n_p, **params)
    if halo_buckets is None:
        # widest influence: seasonal window spans q_s points of a cycle
        # subseries = q_s * n_p buckets; trend/lowpass span q_t / q_l
        halo_buckets = max(p0.q_s * n_p, p0.q_t, p0.q_l, 2 * n_p)
    H = int(halo_buckets)
    if C < 2 * n_p:
        raise ValueError(f"chunk_buckets={C} must be >= 2*n_p={2 * n_p}")

    bounds = rollup.groupBy(key_col).agg(F.min("bucket").alias("_g0"),
                                         F.max("bucket").alias("_g1"))
    df = rollup.join(F.broadcast(bounds), key_col)
    pos = ((F.unix_timestamp("bucket") - F.unix_timestamp("_g0"))
           / bucket_seconds).cast("long")
    npos = ((F.unix_timestamp("_g1") - F.unix_timestamp("_g0"))
            / bucket_seconds).cast("long")
    k0 = (pos / C).cast("long")
    members = F.array(
        k0,
        F.when((pos < k0 * C + H) & (k0 > 0), k0 - 1),
        F.when((pos >= (k0 + 1) * C - H) & ((k0 + 1) * C <= npos), k0 + 1),
    )
    df = df.select(
        key_col, "bucket", "cnt", value_col,
        F.col("_g0"), npos.alias("_npos"),
        F.explode(F.filter(members, lambda m: m.isNotNull())).alias("_chunk"),
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        source, k = key[0], int(key[1])
        g0 = pd.Timestamp(pdf["_g0"].iloc[0])
        nmax = int(pdf["_npos"].iloc[0])
        lo = max(k * C - H, 0)
        hi = min((k + 1) * C - 1 + H, nmax)
        grid = g0 + pd.to_timedelta(
            np.arange(lo, hi + 1) * bucket_seconds, unit="s")
        idx = pd.DatetimeIndex(pdf["bucket"])
        s = pd.Series(pdf[value_col].astype("float64").values, index=idx)
        s = s[~s.index.duplicated()].reindex(grid)
        cnt = (pd.Series(pdf["cnt"].values, index=idx)[lambda x: ~x.index.duplicated()]
               .reindex(grid).fillna(0).astype("int64"))
        y = s.values
        n = len(y)
        i_lo = k * C - lo                       # first interior offset
        i_hi = min((k + 1) * C - 1, nmax) - lo  # last interior offset
        interior = slice(i_lo, i_hi + 1)
        if i_hi < i_lo:
            return pd.DataFrame(columns=["__k", "bucket", "y", "seasonal",
                                         "trend", "remainder", "gapfilled",
                                         "cnt"]).rename(columns={"__k": key_col})
        if n < 2 * n_p:
            nanv = np.full(n, np.nan)
            S = T = R = nanv
            gapfilled = y
        else:
            pr = canonicalize_stl_params(n, n_p, **params)
            S, T, R = stl_filt(y[None, :].astype(np.float32), pr)
            S, T, R = (S[0].astype(np.float64), T[0].astype(np.float64),
                       R[0].astype(np.float64))
            gapfilled = np.where(np.isnan(y), S + T, y)
        return pd.DataFrame({
            key_col: source, "bucket": grid[interior], "y": y[interior],
            "seasonal": S[interior], "trend": T[interior],
            "remainder": R[interior], "gapfilled": gapfilled[interior],
            "cnt": cnt.values[interior],
        })

    schema = GAPFILL_SCHEMA.replace("source string", f"{key_col} string")
    n_parts = rollup.sparkSession.sparkContext.defaultParallelism * 2
    df = df.repartition(n_parts, F.col(key_col), F.col("_chunk"))
    return df.groupBy(key_col, "_chunk").applyInPandas(fn, schema)
