"""Windowed exponential moving average as a deterministic in-engine fold.

EWMA is inherently sequential (acc = acc + a*(x - acc)), which usually
forces a grouped-map UDF. Over a TRAILING window of W points the fold is
expressible entirely in Catalyst: collect the frame into an array (ROWS
BETWEEN W-1 PRECEDING AND CURRENT ROW preserves frame order) and fold it
with ``aggregate`` — whole-stage-codegen lambda, no Python, and because the
fold ORDER is pinned by the array the result is bit-identical on any
parallelism AND to any engine with the same fold (DuckDB ``list_reduce``),
so the oracle check is exact. The W-truncation error vs an infinite-history
EWMA is (1-a)^W (< 7% of a unit step at a=0.2, W=12; pick W for the tail
you need).

Scale shape: one window exchange on the key; per-row state is W doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(df: DataFrame, alpha: float, window: int, key_col: str,
         order_col: str, value_col: str, out_col: str = "ewma") -> DataFrame:
    """Per ``key_col`` series ordered by ``order_col``: EWMA of the trailing
    ``window`` values of ``value_col`` (fold seeded with the oldest value in
    the frame), rounded to 6 decimals."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if window < 1:
        raise ValueError("window must be >= 1")
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(-(window - 1), Window.currentRow))
    # collect_list DROPS nulls — the defined semantic is "EWMA over the
    # non-null trailing values" (the DuckDB twin list_filters to match;
    # array_agg would otherwise keep NULLs and poison the fold)
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    # repr(alpha) round-trips the exact double, so both engines fold with
    # the identical constant
    fold = (f"aggregate(slice(_vals, 2, greatest(size(_vals) - 1, 0)), "
            f"element_at(_vals, 1), "
            f"(acc, x) -> acc + CAST({alpha!r} AS DOUBLE) * (x - acc))")
    # an all-null frame folds over an empty array: element_at(.., 1) would
    # raise under ANSI mode — return NULL instead, same as the twin's CASE
    return (df.withColumn("_vals", vals)
            .withColumn(out_col,
                        F.when(F.size("_vals") == 0,
                               F.lit(None).cast("double"))
                        .otherwise(F.round(F.expr(fold), 6)))
            .drop("_vals"))


def ewma_oracle_sql(alpha: float, window: int, key_col: str, order_col: str,
                    value_col: str, out_col: str = "ewma") -> str:
    """DuckDB twin of the fold expression (same frame, same seed, same fold
    order — bit-identical before the shared 6-decimal round). Returns the
    SELECT-list fragment computing ``out_col``; embed over the same input."""
    frame = (f"list_filter(array_agg(CAST({value_col} AS DOUBLE)) OVER ("
             f"PARTITION BY {key_col} ORDER BY {order_col} "
             f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW), "
             f"x -> x IS NOT NULL)")
    return (
        f"CASE WHEN len({frame}) = 0 THEN NULL ELSE "
        f"round(list_reduce({frame}, "
        f"(acc, x) -> acc + CAST({alpha!r} AS DOUBLE) * (x - acc)), 6) "
        f"END AS {out_col}")
