"""KMV (k-minimum-values) distinct-count sketch, oracle-portable.

The classic bottom-k sketch: hash every value into [0, p), keep the k
smallest distinct hashes per group, estimate the distinct count as
``(k-1) * p / h_k`` (Bar-Yossef et al. 2002).  Unlike HLL
(``approx_count_distinct``), whose register layout is
implementation-defined, KMV over a FIXED hash is bit-reproducible in any
SQL engine — so the sketch itself is value-checkable against DuckDB, the
same portability convention as the engine's MinHash/SimHash operators.

Hash: ``(a*(x mod p) + b) mod p`` with p = 1e9+7 and a,b < p — every
intermediate fits in 60 bits, so Spark's ANSI mode cannot overflow
(xxhash64 sums do; see the pipeline's sampled-hash note).  A linear hash
is enough for the estimator's randomization at demo k; swap in a
stronger portable hash for adversarial inputs.

Plan shape: project the hash, distinct on (group, h) — map-side combine
collapses duplicates before the shuffle — then a per-group bottom-k rank
window.  The shuffle carries (group, int64) pairs only; sketches merge
by union + re-rank, so partial sketches compose across partitions or
incremental runs exactly like the tier rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_P = 1_000_000_007
KMV_A = 736_418_391
KMV_B = 603_721_843


def kmv_hash(col):
    """Portable [0, p) hash of an integer column (same arithmetic in SQL)."""
    x = F.pmod(col.cast("long"), F.lit(KMV_P))
    return F.pmod(F.lit(KMV_A) * x + F.lit(KMV_B), F.lit(KMV_P))


def kmv_hash_sql(col: str) -> str:
    """DuckDB twin of :func:`kmv_hash` (identical integer arithmetic).

    The inner mod is doubled because SQL ``%`` keeps the sign of the
    dividend while Spark's ``pmod`` is always non-negative."""
    inner = f"((CAST({col} AS BIGINT) % {KMV_P} + {KMV_P}) % {KMV_P})"
    return f"(({KMV_A} * {inner} + {KMV_B}) % {KMV_P})"


def kmv_distinct(df: DataFrame, *, group_col: str, value_col: str,
                 k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate: (group, n_seen, h_k, est).

    ``n_seen`` = number of distinct hashes kept (= min(k, true distinct));
    when a group has fewer than k distinct values the sketch is EXACT and
    ``est`` equals ``n_seen``.  ``est`` is rounded to 4 decimals so the
    DuckDB oracle hashes identically.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # NULL values hash to NULL, would sort FIRST in the ascending rank
    # window (nulls-first), eat a bottom-k slot and inflate n_seen — SQL
    # count(DISTINCT) ignores NULLs, so the sketch must too
    hashes = df.select(
        F.col(group_col), kmv_hash(F.col(value_col)).alias("h")
    ).filter(F.col("h").isNotNull()).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    bottom = hashes.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k)
    return (
        bottom.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("h_k"))
        .select(
            group_col, "n_seen", "h_k",
            F.round(
                F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
                .otherwise(F.lit(float(k - 1)) * KMV_P / F.col("h_k")),
                4,
            ).alias("est"),
        )
    )
