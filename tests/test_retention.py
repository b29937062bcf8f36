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


def test_day_pruned_retention_touches_only_boundary_day(spark, tmp_path):
    """On a day-partitioned table, retention must drop whole old days from
    the manifest WITHOUT rewriting them, rewrite only the cutoff-day
    partitions, and leave newer days' file paths untouched."""
    import pandas as pd

    from hastl_spark.sources.tables import DAY_SPEC, PART_SEP

    buckets = pd.date_range("2026-03-01", periods=5 * 24 * 60, freq="60s")
    pdf = pd.DataFrame({"source": "s1", "bucket": buckets,
                        "cnt": 1, "sum_n_tok": 7})
    df = spark.createDataFrame(pdf)
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"],
                   part_spec=DAY_SPEC)
    t.merge_upsert(spark, df, watermark_col="bucket")
    man1 = t._load()
    assert len(man1["partitions"]) == 5  # 5 days

    # keep 36h: horizon = 2026-03-05 23:59, cutoff = 2026-03-04 11:59
    rec = apply_retention(spark, t, keep_seconds=36 * 3600)
    assert rec["op"] == "retention_day_pruned"
    man2 = t._load()
    days = sorted(p.split(PART_SEP)[-1] for p in man2["partitions"])
    assert days == ["2026-03-04", "2026-03-05"]
    # the newest day's data dir was NOT rewritten
    assert (man2["partitions"][f"s1{PART_SEP}2026-03-05"]
            == man1["partitions"][f"s1{PART_SEP}2026-03-05"])
    # the boundary day WAS rewritten (new snapshot path)
    assert (man2["partitions"][f"s1{PART_SEP}2026-03-04"]
            != man1["partitions"][f"s1{PART_SEP}2026-03-04"])
    # row-level semantics match the filter exactly
    got = t.read(spark)
    cutoff = pd.Timestamp("2026-03-05 23:59:00") - pd.Timedelta(hours=36)
    exp = pdf[pdf.bucket >= cutoff]
    assert got.count() == len(exp)
    assert got.agg(F.min("bucket")).collect()[0][0] == cutoff.to_pydatetime()
