"""Schema evolution on KeyedTable merges (Iceberg add-column parity):
added columns appear with NULL for pre-existing rows, updates may omit
columns, type changes fail fast, overwrite resets the schema."""

import pytest

from hastl_spark.sources.tables import KeyedTable


def test_merge_adds_column(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 30)], "source string, bucket int, v long"))
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 2, 20, "x")],
        "source string, bucket int, v long, extra string"))

    got = {(r.source, r.bucket): (r.v, r.extra)
           for r in t.read(spark).collect()}
    assert got == {("a", 1): (10, None), ("a", 2): (20, "x"),
                   ("b", 1): (30, None)}  # untouched partition b: NULL too


def test_update_may_omit_columns(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, 10)], "source string, bucket int, v long"))
    # an update that doesn't carry v: the added row reads v as NULL
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 2)], "source string, bucket int"))
    got = {(r.source, r.bucket): r.v for r in t.read(spark).collect()}
    assert got == {("a", 1): 10, ("a", 2): None}


def test_type_change_fails_fast(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, 10)], "source string, bucket int, v long"))
    with pytest.raises(ValueError, match="type conflict"):
        t.merge_upsert(spark, spark.createDataFrame(
            [("a", 2, "oops")], "source string, bucket int, v string"))


def test_overwrite_resets_schema(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, 10, "x")],
        "source string, bucket int, v long, extra string"))
    t.overwrite(spark, spark.createDataFrame(
        [("a", 1, 99)], "source string, bucket int, v long"))
    df = t.read(spark)
    assert "extra" not in df.columns
    assert [(r.source, r.bucket, r.v) for r in df.collect()] == [("a", 1, 99)]


def test_emptied_table_sheds_schema(spark, tmp_path):
    """Dropping every partition clears the file schema, so a fresh write
    may legitimately retype (no ghost columns, no dead-generation
    conflicts)."""
    t = KeyedTable(str(tmp_path / "t"), ["source", "bucket"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, 10)], "source string, bucket int, v long"))
    t.drop_partitions(["a"])
    t.merge_upsert(spark, spark.createDataFrame(
        [("a", 1, "now-a-string")], "source string, bucket int, v string"))
    assert [r.v for r in t.read(spark).collect()] == ["now-a-string"]
