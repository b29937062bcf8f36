"""Retention: telescoping age-out of fine tiers with atomic snapshots."""

import pytest
from pyspark.sql import functions as F

from hastl_spark.plans.retention import apply_retention, run_retention
from hastl_spark.plans.rollup_job import run_pipeline
from hastl_spark.sources.sequences import generate_scale
from hastl_spark.sources.tables import KeyedTable


@pytest.mark.slow
def test_retention_drops_old_buckets_only(spark, tmp_path):
    seqs = generate_scale(spark, "xs").cache()
    out = str(tmp_path / "tiers")
    run_pipeline(spark, seqs, out, do_gorilla=False, check_invariant=False)

    t = KeyedTable(f"{out}/tier_1m", ["source", "bucket"])
    before = t.read(spark)
    n_before = before.count()
    mx = before.agg(F.max("bucket")).collect()[0][0]

    rec = apply_retention(spark, t, keep_seconds=3600)  # keep last hour
    after = t.read(spark)
    assert after.filter(
        F.col("bucket") < F.lit(mx) - F.expr("INTERVAL 3600 SECONDS")).count() == 0
    kept_expected = before.filter(
        F.col("bucket") >= F.lit(mx) - F.expr("INTERVAL 3600 SECONDS")).count()
    assert after.count() == kept_expected < n_before
    assert rec["rows_in"] == kept_expected
    # snapshot advanced atomically; vacuum reclaims the old snapshot
    assert t.snapshot() == 2
    assert t.vacuum() >= 1
    assert t.read(spark).count() == kept_expected

    # policy runner: 1d tier untouched (keep forever)
    res = run_retention(spark, out, {"tier_1d": None, "tier_1h": 48 * 3600})
    assert "tier_1d" not in res and "tier_1h" in res
