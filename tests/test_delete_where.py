"""Row-level DELETE over KeyedTable: only touched partitions rewritten,
emptied partitions dropped metadata-only, NULL predicates keep rows."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hastl_spark.sources.tables import DAY_SPEC, KeyedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, bucket int, v long")


def _content(t, spark):
    return {(r.source, r.bucket, r.v) for r in t.read(spark).collect()}


def _partition_dirs(t):
    with open(os.path.join(t.path, "_manifest.json")) as f:
        return json.load(f)["partitions"]


def test_delete_rewrites_only_touched_partitions(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, _df(spark, [
        ("a", 1, 10), ("a", 2, 20), ("b", 1, 30), ("c", 1, 40)]))
    dirs_before = _partition_dirs(t)

    rec = t.delete_where(spark, "source = 'a' AND bucket = 1")
    assert rec["rows_deleted"] == 1
    assert rec["rewritten"] == ["a"] and rec["dropped"] == []
    assert _content(t, spark) == {("a", 2, 20), ("b", 1, 30), ("c", 1, 40)}
    dirs_after = _partition_dirs(t)
    # untouched partitions keep their exact data dirs (no IO on them)
    assert dirs_after["b"] == dirs_before["b"]
    assert dirs_after["c"] == dirs_before["c"]
    assert dirs_after["a"] != dirs_before["a"]


def test_delete_emptying_a_partition_drops_it_metadata_only(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, _df(spark, [("a", 1, 10), ("b", 1, 30)]))
    rec = t.delete_where(spark, F.col("source") == "a")
    assert rec["dropped"] == ["a"] and rec["rewritten"] == []
    assert rec["rows_deleted"] == 1
    assert _content(t, spark) == {("b", 1, 30)}
    assert "a" not in _partition_dirs(t)


def test_delete_nothing_is_a_noop(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))
    snap = t.snapshot()
    rec = t.delete_where(spark, "v > 999")
    assert rec["rows_deleted"] == 0 and t.snapshot() == snap


def test_null_predicate_keeps_row(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    rows = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None)], "source string, bucket int, v long")
    t.merge_upsert(spark, rows)
    rec = t.delete_where(spark, "v < 100")  # NULL v -> predicate NULL -> keep
    assert rec["rows_deleted"] == 1
    got = {(r.source, r.bucket, r.v) for r in t.read(spark).collect()}
    assert got == {("a", 2, None)}


def test_delete_on_day_partitioned_table(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"],
                   part_spec=DAY_SPEC)
    rows = spark.createDataFrame(
        [("a", "2026-01-01 00:05:00", 1), ("a", "2026-01-02 00:05:00", 2),
         ("b", "2026-01-01 00:05:00", 3)],
        "source string, bucket string, v long") \
        .withColumn("bucket", F.col("bucket").cast("timestamp"))
    t.merge_upsert(spark, rows)
    rec = t.delete_where(spark, "source = 'a' AND v = 1")
    assert rec["rows_deleted"] == 1
    assert rec["dropped"] == ["a~2026-01-01"]  # that day held only v=1
    assert t.read(spark).count() == 2


def test_delete_lowers_watermark_on_rewrite(spark, tmp_path):
    """Deleting the rows that carried a partition's max watermark must
    LOWER it, or incremental consumers skip the corrected re-merge."""
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, _df(spark, [("a", 1, 10), ("a", 9, 90)]),
                   watermark_col="bucket")
    assert t.watermark("a") == 9
    t.delete_where(spark, "bucket = 9")
    assert t.watermark("a") == 1


def test_delete_is_audited_in_snapshot_history(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, _df(spark, [("a", 1, 10), ("b", 1, 30)]))
    t.delete_where(spark, "source = 'b' OR bucket = 99")
    ops = [(s["op"], s.get("rows_deleted")) for s in t.snapshots()]
    assert ("delete_where", 1) in ops


def test_delete_on_empty_table_is_noop(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    rec = t.delete_where(spark, "v = 1")
    assert rec["rows_deleted"] == 0 and rec["dropped"] == []
