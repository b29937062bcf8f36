"""Time travel + rollback over KeyedTable manifests (Iceberg
snapshot-read / rollback / expire_snapshots parity)."""

import pytest
from pyspark.sql import functions as F

from hastl_spark.sources.tables import KeyedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, bucket int, v long")


def _content(df):
    return {(r.source, r.bucket, r.v) for r in df.collect()}


@pytest.fixture()
def table(tmp_path):
    return KeyedTable(str(tmp_path / "tt"), ["source", "bucket"])


def test_read_snapshot_sees_history(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10), ("b", 1, 20)]))
    t.merge_upsert(spark, _df(spark, [("a", 1, 11), ("a", 2, 12)]))
    t.merge_upsert(spark, _df(spark, [("c", 1, 30)]))

    assert _content(t.read_snapshot(spark, 1)) == {("a", 1, 10), ("b", 1, 20)}
    assert _content(t.read_snapshot(spark, 2)) == {
        ("a", 1, 11), ("a", 2, 12), ("b", 1, 20)}
    assert _content(t.read_snapshot(spark, 3)) == _content(t.read(spark))
    with pytest.raises(ValueError, match="no snapshot 9"):
        t.read_snapshot(spark, 9)


def test_snapshots_listing(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))
    t.overwrite(spark, _df(spark, [("a", 1, 99)]))
    snaps = t.snapshots()
    assert [s["snapshot"] for s in snaps] == [1, 2]
    assert snaps[1]["op"] == "overwrite"


def test_rollback_is_metadata_only_and_history_moves_forward(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10), ("b", 1, 20)]),
                   watermark_col="bucket")
    t.merge_upsert(spark, _df(spark, [("a", 2, 12)]), watermark_col="bucket")
    assert t.watermark("a") == 2

    rec = t.rollback(1)
    assert rec["snapshot"] == 3 and rec["rolled_back_to"] == 1
    assert _content(t.read(spark)) == {("a", 1, 10), ("b", 1, 20)}
    # watermarks restored as of the rolled-back snapshot, so a re-merge of
    # the undone data is not silently skipped by watermark logic
    assert t.watermark("a") == 1

    # the table keeps working after rollback
    t.merge_upsert(spark, _df(spark, [("a", 3, 13)]), watermark_col="bucket")
    assert ("a", 3, 13) in _content(t.read(spark))
    assert ("a", 2, 12) not in _content(t.read(spark))


def test_vacuum_expires_time_travel_but_not_current(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))
    t.overwrite(spark, _df(spark, [("a", 1, 99)]))
    removed = t.vacuum()
    assert removed >= 1
    assert _content(t.read(spark)) == {("a", 1, 99)}
    with pytest.raises(ValueError, match="vacuumed"):
        t.read_snapshot(spark, 1)


def test_rollback_refuses_vacuumed_snapshot(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))
    t.overwrite(spark, _df(spark, [("a", 1, 99)]))
    t.vacuum()  # snapshot-1 dirs are gone
    with pytest.raises(ValueError, match="vacuumed"):
        t.rollback(1)
    # table not wedged: current content still reads
    assert _content(t.read(spark)) == {("a", 1, 99)}


def test_rollback_then_vacuum_keeps_rolled_back_data(spark, table):
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))
    t.overwrite(spark, _df(spark, [("a", 1, 99)]))
    t.rollback(1)
    t.vacuum()  # snapshot-2 dirs unreferenced now; snapshot-1 dirs live
    assert _content(t.read(spark)) == {("a", 1, 10)}


def test_time_travel_survives_overwrite_retype(spark, table):
    """A later overwrite may RESET the schema (retype); snapshot reads and
    rollback must use the schema as of the target snapshot, or the old
    parquet files misdecode under the newer named schema."""
    t = table
    t.merge_upsert(spark, _df(spark, [("a", 1, 10)]))            # v: long
    t.overwrite(spark, spark.createDataFrame(
        [("a", 1, "ninety-nine")], "source string, bucket int, v string"))
    got = {(r.source, r.bucket, r.v) for r in
           t.read_snapshot(spark, 1).collect()}
    assert got == {("a", 1, 10)}
    t.rollback(1)
    assert _content(t.read(spark)) == {("a", 1, 10)}
    # and the restored schema accepts further long-typed merges
    t.merge_upsert(spark, _df(spark, [("a", 2, 20)]))
    assert _content(t.read(spark)) == {("a", 1, 10), ("a", 2, 20)}
