"""Gap-fill variants over a densified bucket grid: LOCF and linear.

The engine's flagship gap-fill is the STL decomposition
(``operators/gapfill.py`` — seasonal-aware interpolation exactly as the
reference's NaN handling does it, hastl/src/futhark/stl.fut:309-341).
These are the two classic *relational* fallbacks every retention engine
also ships (TimescaleDB's ``locf()`` / ``interpolate()``): pure window
functions over the (key, bucket) grid — no UDF, whole-stage codegen,
one hash shuffle on the key that co-partitions with the upstream
densify/rollup, so at 100 TB they ride the same exchange the tier
aggregation already paid for.

Leading/trailing nulls stay null in both (there is nothing to carry /
no bracket to interpolate between) — same as TimescaleDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def locf(df: DataFrame, value_cols: Sequence[str], *, key_col: str = "source",
         order_col: str = "bucket") -> DataFrame:
    """Last-observation-carried-forward for each value column."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def linear_interpolate(df: DataFrame, value_cols: Sequence[str], *,
                       key_col: str = "source",
                       order_col: str = "bucket") -> DataFrame:
    """Linear interpolation across interior null runs.

    For a null at time t bracketed by observations (t0,v0) and (t1,v1):
    v = v0 + (v1-v0) * (t-t0)/(t1-t0).  Uses only ``last/first ignorenulls``
    windows — a single sort per key, shared by all value columns.
    """
    wb = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col(order_col).cast("timestamp").cast("double")
    out = df
    for c in value_cols:
        obs_t = F.when(F.col(c).isNotNull(), t)
        pv = F.last(c, ignorenulls=True).over(wb)
        pt = F.last(obs_t, ignorenulls=True).over(wb)
        nv = F.first(c, ignorenulls=True).over(wf)
        nt = F.first(obs_t, ignorenulls=True).over(wf)
        interp = pv + (nv - pv) * (t - pt) / (nt - pt)
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.when(pv.isNotNull() & nv.isNotNull(), interp)
            ),
        )
    return out
