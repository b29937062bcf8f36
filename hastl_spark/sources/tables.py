"""Table layer: keyed MERGE-maintained tables over parquet directories.

The production design is Iceberg (``MERGE INTO tier USING updates ON
t.source = u.source AND t.bucket = u.bucket``, partition spec
``(source, days(bucket))`` — SURVEY.md §2.1). This sandbox has no Iceberg
runtime jar, so the same contract is provided over plain parquet
directories with an ATOMIC JSON manifest (SURVEY.md §7 hard-part (c)):

* data files are immutable; a ``_manifest.json`` names the visible data
  directory per partition plus a snapshot id and per-partition watermarks;
* MERGE = rewrite only the partitions present in the update set (update
  rows win by key), publish by ``os.replace`` of the manifest — readers see
  the old or the new snapshot, never a mix;
* every merge appends a lineage record (snapshot, rows in/out, wall-clock,
  watermark) — the per-partition checkpoint the north_rule requires.

Partition column here is ``source`` (16 values at sandbox scale); at 100 TB
the Iceberg spec adds a time bucket to bound rewrite amplification.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyedTable:
    def __init__(self, path: str, key_cols: list[str], partition_col: str = "source"):
        self.path = path
        self.key_cols = list(key_cols)
        self.partition_col = partition_col
        os.makedirs(path, exist_ok=True)

    # ---- manifest ----
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshot": 0, "partitions": {}, "watermarks": {}, "lineage": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _publish(self, man: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path)  # atomic swap

    def snapshot(self) -> int:
        return self._load()["snapshot"]

    def watermark(self, partition: str):
        return self._load()["watermarks"].get(partition)

    # ---- read ----
    def _read_dirs(self, spark: SparkSession, rels) -> DataFrame:
        """One multi-path scan over the visible partition leaf dirs (a single
        file listing + plan instead of one read call per partition). The
        partition column travels INSIDE the files as ``_pk`` — partition
        dirs from different snapshots have different depths-by-name, which
        breaks Spark's partition discovery, so we don't rely on it. The
        manifest carries the file schema after the first write, so the
        driver skips footer-read schema inference on every open."""
        paths = [os.path.abspath(os.path.join(self.path, rel)) for rel in rels]
        reader = spark.read
        schema_json = self._load().get("schema")
        if schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
        df = reader.parquet(*paths)
        return df.withColumnRenamed("_pk", self.partition_col)

    def read(self, spark: SparkSession) -> DataFrame:
        man = self._load()
        parts = man["partitions"]
        if not parts:
            raise ValueError(f"table {self.path} is empty")
        return self._read_dirs(spark, parts.values())

    def exists(self) -> bool:
        return bool(self._load()["partitions"])

    # ---- MERGE ----
    def merge_upsert(self, spark: SparkSession, updates: DataFrame,
                     watermark_col: str | None = None) -> dict:
        """Upsert ``updates`` by key; only partitions present in the update
        set are rewritten. Returns the lineage record."""
        t0 = time.time()
        man = self._load()
        snap = man["snapshot"] + 1
        pc = self.partition_col

        # Stage the updates FIRST: the (potentially expensive) updates plan
        # executes exactly once, straight into a partitioned staging write —
        # no cache and no separate stats pre-pass (both would re-execute or
        # materialize the full plan). Affected partitions are then discovered
        # from the staged dir names, merged with their current data (a scan
        # over already-aggregated, table-sized files), and published.
        # Clustering rows by the partition column before partitionBy keeps
        # one file per partition — without it every shuffle partition spills
        # a file into every partition dir and downstream scans pay per-file
        # task overhead. At cluster scale this becomes a file-size budget.
        rel_base = os.path.join("data", f"s{snap:06d}")
        if not man["partitions"]:
            # first snapshot: the staged write IS the table
            (updates.withColumn("_pk", F.col(pc))
             .repartition(F.col(pc))
             .write.mode("overwrite").partitionBy(pc)
             .parquet(os.path.join(self.path, rel_base)))
            parts = [d.split("=", 1)[1]
                     for d in os.listdir(os.path.join(self.path, rel_base))
                     if d.startswith(f"{pc}=")]
        else:
            rel_stage = rel_base + "_stage"
            stage_dir = os.path.join(self.path, rel_stage)
            (updates.withColumn("_pk", F.col(pc))
             .repartition(F.col(pc))
             .write.mode("overwrite").partitionBy(pc)
             .parquet(stage_dir))
            parts = [d.split("=", 1)[1] for d in os.listdir(stage_dir)
                     if d.startswith(f"{pc}=")]
            staged = self._read_dirs(
                spark, [os.path.join(rel_stage, f"{pc}={p}") for p in parts])

            existing = [p for p in parts if p in man["partitions"]]
            if existing:
                cur = self._read_dirs(spark, [man["partitions"][p] for p in existing])
                keep = cur.join(staged.select(*self.key_cols).distinct(),
                                on=self.key_cols, how="left_anti")
                merged = keep.unionByName(staged.select(*keep.columns))
            else:
                merged = staged
            (merged.withColumn("_pk", F.col(pc))
             .repartition(F.col(pc))
             .write.mode("overwrite").partitionBy(pc)
             .parquet(os.path.join(self.path, rel_base)))

        # watermarks + row counts from one tiny scan of the written table data
        aggs = [F.count(F.lit(1)).alias("_n")]
        if watermark_col is not None:
            aggs.append(F.max(watermark_col).alias("_wm"))
        written = self._read_dirs(
            spark, [os.path.join(rel_base, f"{pc}={p}") for p in parts])
        stats = {str(r[0]): r for r in written.groupBy(pc).agg(*aggs).collect()}
        rows = sum(r["_n"] for r in stats.values())
        if man["partitions"]:
            import shutil as _sh

            _sh.rmtree(os.path.join(self.path, rel_base + "_stage"),
                       ignore_errors=True)

        for pval in parts:
            man["partitions"][pval] = os.path.join(rel_base, f"{pc}={pval}")
            if watermark_col is not None:
                wm = str(stats[pval]["_wm"])
                prev = man["watermarks"].get(pval)
                man["watermarks"][pval] = max(wm, prev) if prev else wm

        if "schema" not in man:
            # record the FILE schema (pc travels as _pk) so future reads
            # skip footer-based schema inference
            from pyspark.sql.types import StructField, StructType

            pcf = next(f for f in updates.schema.fields if f.name == pc)
            fields = ([f for f in updates.schema.fields if f.name != pc]
                      + [StructField("_pk", pcf.dataType, True)])
            man["schema"] = json.dumps(StructType(fields).jsonValue())

        record = {
            "snapshot": snap,
            "partitions": sorted(parts),
            "rows_in": rows,
            "wall_s": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        man["snapshot"] = snap
        man["lineage"].append(record)
        self._publish(man)
        return record

    def overwrite(self, spark: SparkSession, df: DataFrame,
                  watermark_col: str | None = None) -> dict:
        """Replace the whole table contents with ``df`` as a new snapshot
        (same atomic publish as merge; used by retention). Partitions absent
        from ``df`` are dropped from the manifest."""
        t0 = time.time()
        man = self._load()
        snap = man["snapshot"] + 1
        pc = self.partition_col
        rel_base = os.path.join("data", f"s{snap:06d}")
        (df.withColumn("_pk", F.col(pc))
         .repartition(F.col(pc))
         .write.mode("overwrite").partitionBy(pc)
         .parquet(os.path.join(self.path, rel_base)))
        data_dir = os.path.join(self.path, rel_base)
        parts = [d.split("=", 1)[1] for d in os.listdir(data_dir)
                 if d.startswith(f"{pc}=")]
        aggs = [F.count(F.lit(1)).alias("_n")]
        if watermark_col is not None:
            aggs.append(F.max(watermark_col).alias("_wm"))
        written = self._read_dirs(
            spark, [os.path.join(rel_base, f"{pc}={p}") for p in parts])
        stats = {str(r[0]): r for r in written.groupBy(pc).agg(*aggs).collect()}
        man["partitions"] = {
            p: os.path.join(rel_base, f"{pc}={p}") for p in parts}
        if watermark_col is not None:
            man["watermarks"] = {p: str(stats[p]["_wm"]) for p in parts}
        record = {
            "snapshot": snap,
            "op": "overwrite",
            "partitions": sorted(parts),
            "rows_in": sum(r["_n"] for r in stats.values()),
            "wall_s": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        man["snapshot"] = snap
        man["lineage"].append(record)
        self._publish(man)
        return record

    def vacuum(self) -> int:
        """Delete data dirs no longer referenced by the manifest (superseded
        snapshots). Safe w.r.t. the atomic manifest: current readers resolved
        their file list from a manifest that only names live dirs. Returns
        the number of removed snapshot dirs."""
        import shutil

        man = self._load()
        live = {rel.split(os.sep)[1] for rel in man["partitions"].values()}
        data_root = os.path.join(self.path, "data")
        removed = 0
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                if d not in live:
                    shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                    removed += 1
        return removed
