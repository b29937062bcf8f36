"""Retention: age out raw/fine-grained data while coarser tiers keep the
history — the third leg of rollup + downsample + RETENTION (north_rule).

Policy = {tier: keep_duration}; a bucket is dropped from a tier once it is
older than the tier's horizon (measured against the tier's own max bucket,
so deterministic replays age identically). Deletion is a snapshot rewrite
of affected partitions through the same atomic-manifest machinery as MERGE
— readers see pre- or post-retention state, never a mix; the lineage
records what was dropped.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hastl_spark.sources.tables import KeyedTable

# classic telescoping defaults (seconds)
DEFAULT_POLICY = {
    "tier_1m": 90 * 86400,
    "tier_1h": 2 * 365 * 86400,
    "tier_1d": None,          # keep forever
    "gapfill_1m": 90 * 86400,
}


def apply_retention(spark: SparkSession, table: KeyedTable, keep_seconds: int,
                    bucket_col: str = "bucket", now=None) -> dict:
    """Drop rows with ``bucket < horizon - keep_seconds``. Returns the
    lineage record (rows kept per partition, cutoff)."""
    cur = table.read(spark)
    if now is None:
        now = cur.agg(F.max(bucket_col)).collect()[0][0]
    cutoff = F.lit(now) - F.expr(f"INTERVAL {int(keep_seconds)} SECONDS")
    kept = cur.filter(F.col(bucket_col) >= cutoff)
    rec = table.overwrite(spark, kept, watermark_col=bucket_col)
    rec["retention_cutoff"] = str(now)
    rec["keep_seconds"] = int(keep_seconds)
    return rec


def run_retention(spark: SparkSession, out_dir: str,
                  policy: dict | None = None) -> dict:
    policy = dict(DEFAULT_POLICY if policy is None else policy)
    results = {}
    for tier, keep in policy.items():
        if keep is None:
            continue
        path = os.path.join(out_dir, tier)
        table = KeyedTable(path, ["source", "bucket"])
        if table.exists():
            results[tier] = apply_retention(spark, table, keep)
    return results
