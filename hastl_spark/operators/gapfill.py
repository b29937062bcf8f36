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
