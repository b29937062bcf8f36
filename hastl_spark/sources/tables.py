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

Partition column defaults to ``source``; tables that take incremental /
backfill MERGEs should pass ``part_spec=DAY_SPEC`` to partition by the
composite (source, day(bucket)) value, so a merge touching one day rewrites
only that day's files instead of the source's whole history (the Iceberg
``(source, days(bucket))`` spec, SURVEY.md §2.1). The spec is persisted in
the manifest, so readers and later writers reconstruct it automatically.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_SEP = "~"

# part_spec: declarative composite-partition derivation, persisted in the
# manifest so ANY reader (retention, tests, a resumed run) rebuilds the same
# ``_part`` column without knowing how the table was constructed.
#   {"cols": ["source"], "day_of": "bucket"}                     -> source~2026-01-05
#   {"cols": ["source"], "day_of": "bucket", "fmt": "yyyy-MM"}   -> source~2026-01
#   {"cols": ["source", "tier"]}                                 -> source~1h
# Granularity should match the tier's row density: day for the 1m tier,
# month for the 1h tier (a source-day of 1h data is only 24 rows — day dirs
# there are pathological small files at ANY input scale).
DAY_SPEC = {"cols": ["source"], "day_of": "bucket"}
MONTH_SPEC = {"cols": ["source"], "day_of": "bucket", "fmt": "yyyy-MM"}
# Gorilla chunk tables: (source, tier) plus the chunk's start month — chunk
# rows are coarse (<=65536 points each), so month granularity keeps file
# counts sane while letting retention drop fully-aged months metadata-only
# (droppability decided by the partition's chunk_end watermark, not the
# start month — a chunk may span months).
CHUNK_SPEC = {"cols": ["source", "tier"], "day_of": "chunk_start", "fmt": "yyyy-MM"}


def apply_part_spec(df: DataFrame, spec: dict, out_col: str = "_part") -> DataFrame:
    parts = [F.col(c) for c in spec.get("cols", [])]
    if spec.get("day_of"):
        parts.append(F.date_format(spec["day_of"], spec.get("fmt", "yyyy-MM-dd")))
    return df.withColumn(out_col, F.concat_ws(PART_SEP, *parts))


def _wm_json(v):
    """Watermark value as a JSON-able scalar keeping its comparison type:
    numbers stay numbers (str(9) > str(10) is the bug), everything else
    becomes its string form (ISO timestamps compare correctly as strings)."""
    import datetime

    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    return str(v)


class KeyedTable:
    def __init__(self, path: str, key_cols: list[str], partition_col: str = "source",
                 part_spec: dict | None = None):
        self.path = path
        self.key_cols = list(key_cols)
        self.part_spec = part_spec
        self._ctor_part_spec = part_spec
        self.partition_col = "_part" if part_spec else partition_col
        os.makedirs(path, exist_ok=True)

    # ---- manifest ----
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshot": 0, "partitions": {}, "watermarks": {}, "lineage": []}
        with open(self._manifest_path) as f:
            man = json.load(f)
        # the manifest is authoritative about how the table is partitioned, so
        # readers constructed with default args still resolve composite specs
        if "partition_col" in man:
            self.partition_col = man["partition_col"]
        if man.get("part_spec"):
            self.part_spec = man["part_spec"]
        # fail fast on a LAYOUT MISMATCH: a constructor that demands a
        # composite part_spec must not silently merge into a table written
        # under a different (or no) spec — mixed partition layouts in one
        # manifest would corrupt day-extraction and retention pruning
        if (self._ctor_part_spec is not None and man["partitions"]
                and man.get("part_spec") != self._ctor_part_spec):
            raise ValueError(
                f"partition-layout mismatch at {self.path}: table was "
                f"written with part_spec={man.get('part_spec')!r} "
                f"(partition_col={man.get('partition_col')!r}) but this "
                f"writer supplies part_spec={self._ctor_part_spec!r}; "
                "migrate the table (read + rewrite) or construct the "
                "KeyedTable with the recorded spec")
        return man

    # ---- schema evolution (Iceberg add-column parity) ----
    def _check_types(self, man: dict, schema) -> None:
        """Fail fast (pre-write) when an update renames a column's TYPE:
        added columns are fine (old files read them as NULL), same-name
        type changes are not (the named-schema parquet scan would
        misdecode old files)."""
        if "schema" not in man:
            return
        from pyspark.sql.types import StructType

        cur = {f.name: f.dataType
               for f in StructType.fromJson(json.loads(man["schema"])).fields}
        for f in schema.fields:
            name = "_pk" if f.name == self.partition_col else f.name
            if name in cur and cur[name] != f.dataType:
                raise ValueError(
                    f"schema evolution type conflict at {self.path}: column "
                    f"{f.name!r} is {cur[name].simpleString()} in the table "
                    f"but {f.dataType.simpleString()} in the update — adding "
                    "columns is supported, changing a column's type is not")

    def _evolve_schema(self, man: dict, written_schema) -> None:
        """Record (first write) or EXTEND (added columns) the manifest file
        schema; pc travels as _pk, kept last. Older files lack added
        columns and read them as NULL through the named-schema scan."""
        from pyspark.sql.types import StructField, StructType

        pc = self.partition_col
        pcf = next(f for f in written_schema.fields if f.name == pc)
        new_fields = [f for f in written_schema.fields if f.name != pc]
        if "schema" not in man:
            fields = new_fields + [StructField("_pk", pcf.dataType, True)]
            man["schema"] = json.dumps(StructType(fields).jsonValue())
            return
        cur = StructType.fromJson(json.loads(man["schema"]))
        have = {f.name for f in cur.fields}
        added = [StructField(f.name, f.dataType, True)
                 for f in new_fields if f.name not in have]
        if added:
            fields = ([f for f in cur.fields if f.name != "_pk"] + added
                      + [f for f in cur.fields if f.name == "_pk"])
            man["schema"] = json.dumps(StructType(fields).jsonValue())

    def _with_part(self, df: DataFrame) -> DataFrame:
        """Ensure the (possibly synthetic) partition column exists on df."""
        if self.part_spec and self.partition_col not in df.columns:
            return apply_part_spec(df, self.part_spec, self.partition_col)
        return df

    def _publish(self, man: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path)  # atomic swap

    def snapshot(self) -> int:
        return self._load()["snapshot"]

    def prop(self, key: str, default=None):
        """Table property from the manifest (Iceberg table-properties
        stand-in). Writers pass ``props=`` to merge_upsert/overwrite; used
        to record invariants of HOW the table's content was produced (e.g.
        the Gorilla chunking discipline) so a later writer with different
        assumptions can fail fast or migrate instead of silently mixing."""
        return self._load().get("props", {}).get(key, default)

    def watermark(self, partition: str):
        return self._load()["watermarks"].get(partition)

    # ---- read ----
    def _read_dirs(self, spark: SparkSession, rels,
                   with_schema: bool = True,
                   schema_json: str | None = None) -> DataFrame:
        """One multi-path scan over the visible partition leaf dirs (a single
        file listing + plan instead of one read call per partition). The
        partition column travels INSIDE the files as ``_pk`` — partition
        dirs from different snapshots have different depths-by-name, which
        breaks Spark's partition discovery, so we don't rely on it. The
        manifest carries the file schema after the first write, so the
        driver skips footer-read schema inference on every open."""
        paths = [os.path.abspath(os.path.join(self.path, rel)) for rel in rels]
        reader = spark.read
        if schema_json is None and with_schema:
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
        df = self._read_dirs(spark, parts.values())
        if self.part_spec:
            # synthetic partition value: derived from data columns, so the
            # logical table surface omits it (writers re-derive via part_spec)
            df = df.drop(self.partition_col)
        return df

    def exists(self) -> bool:
        return bool(self._load()["partitions"])

    def partition_values(self) -> list[str]:
        return sorted(self._load()["partitions"])

    def read_partitions(self, spark: SparkSession, pvals) -> DataFrame:
        """Scan only the named partitions (manifest-scoped partition
        pruning; e.g. retention's boundary day)."""
        man = self._load()
        rels = [man["partitions"][p] for p in pvals if p in man["partitions"]]
        if not rels:
            raise ValueError(f"none of {pvals!r} exist in {self.path}")
        df = self._read_dirs(spark, rels)
        if self.part_spec:
            df = df.drop(self.partition_col)
        return df

    def drop_partitions(self, pvals, extra_record: dict | None = None) -> dict:
        """Metadata-only partition drop: a new snapshot whose manifest no
        longer names the given partitions — no data files are read or
        written (vacuum reclaims snapshot dirs once nothing references
        them). This is what makes day-partitioned retention O(boundary day)
        instead of a full-table rewrite."""
        t0 = time.time()
        man = self._load()
        snap = man["snapshot"] + 1
        dropped = [p for p in pvals if p in man["partitions"]]
        for p in dropped:
            del man["partitions"][p]
            man["watermarks"].pop(p, None)
        if not man["partitions"]:
            # a fully-emptied table sheds its file schema: keeping a dead
            # generation's schema would reject legitimate retypes and
            # resurrect ghost columns on the next write (review finding)
            man.pop("schema", None)
        record = {
            "snapshot": snap,
            "op": "drop_partitions",
            "partitions": sorted(dropped),
            "rows_in": 0,
            "wall_s": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if extra_record:
            record.update(extra_record)
        man["snapshot"] = snap
        man["partition_col"] = self.partition_col
        if self.part_spec:
            man["part_spec"] = self.part_spec
        record["partition_map"] = dict(man["partitions"])
        record["watermark_map"] = dict(man["watermarks"])
        record["schema"] = man.get("schema")
        man["lineage"].append(record)
        self._publish(man)
        return record

    @staticmethod
    def _footer_stats(data_dir: str, part_dirs: dict[str, str],
                      watermark_col: str | None):
        """Per-partition ``{pval: {"_n": rows, "_wm": max}}`` read from the
        parquet FOOTERS of the just-written files — metadata-only, the way
        an Iceberg writer records column stats into its manifest at commit
        time instead of re-scanning the data it wrote. Returns None when any
        file lacks usable stats (caller falls back to a Spark aggregation
        job over the cached frame).

        Watermarks are accepted only for int/timestamp columns: parquet
        string min/max may be TRUNCATED bounds (not the true max), and
        float stats are unreliable in the presence of NaN."""
        import datetime
        import glob as _glob

        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover - pyarrow is baked in
            return None

        def one_part(dirname):
            files = _glob.glob(os.path.join(data_dir, dirname, "*.parquet"))
            if not files:
                return None
            n, wm = 0, None
            for f in files:
                md = pq.ParquetFile(f).metadata
                n += md.num_rows
                if watermark_col is None:
                    continue
                for rg in range(md.num_row_groups):
                    grp, st = md.row_group(rg), None
                    for ci in range(grp.num_columns):
                        if grp.column(ci).path_in_schema == watermark_col:
                            st = grp.column(ci).statistics
                            break
                    if st is None or not st.has_min_max:
                        return None
                    v = st.max
                    if isinstance(v, datetime.datetime):
                        if v.tzinfo is not None:  # arrow returns tz-aware UTC
                            v = v.astimezone(datetime.timezone.utc).replace(
                                tzinfo=None)
                    elif not isinstance(v, int) or isinstance(v, bool):
                        return None  # str/bytes/float: bounds, not maxima
                    wm = v if wm is None or v > wm else wm
            if watermark_col is not None and wm is None:
                return None  # no row group carried stats for the column
            return {"_n": n, "_wm": wm}

        # footer parsing releases the GIL in pyarrow — a thread pool keeps
        # this O(partitions) driver step flat for ~1000-partition merges
        from concurrent.futures import ThreadPoolExecutor

        items = list(part_dirs.items())
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(items)))) as ex:
            stats = list(ex.map(lambda it: one_part(it[1]), items))
        if any(s is None for s in stats):
            return None
        return {pval: s for (pval, _), s in zip(items, stats)}

    @staticmethod
    def _list_parts(dirpath: str, pc: str) -> dict[str, str]:
        """Partition-dir listing as {decoded value: dir name}. Spark URL-
        encodes special characters in partition dir names; stats groupBys
        see the raw value, so the decoded form is the canonical key."""
        return {
            unquote(d.split("=", 1)[1]): d
            for d in os.listdir(dirpath) if d.startswith(f"{pc}=")
        }

    # ---- MERGE ----
    def merge_upsert(self, spark: SparkSession, updates: DataFrame,
                     watermark_col: str | None = None,
                     replace_partitions: bool = False,
                     keep_data: bool = False,
                     props: dict | None = None,
                     extra_record: dict | None = None) -> dict:
        """Upsert ``updates`` by key; only partitions present in the update
        set are rewritten. Returns the lineage record.

        ``replace_partitions=True`` switches to delete-then-insert semantics:
        affected partitions are fully superseded by the update rows instead
        of key-merged — for derived tables regenerated wholesale per
        partition (e.g. Gorilla chunk sets, whose chunk_start keys shift
        when a backfill moves a chunk boundary: a keyed upsert would leave
        stale overlapping chunks behind).

        ``keep_data=True`` leaves the written data CACHED and returns it in
        the record as ``record["data"]`` (caller unpersists). When the merge
        touched every partition (``record["covers_table"]``), that cached
        frame IS the table content — downstream stages can consume it
        instead of re-listing and re-decoding hundreds of freshly written
        partition files (a fixed serial cost that hurts small-cluster
        scaling)."""
        t0 = time.time()
        man = self._load()
        snap = man["snapshot"] + 1
        pc = self.partition_col
        updates = self._with_part(updates)
        self._check_types(man, updates.schema)  # evolution: add yes, retype no

        from pyspark import StorageLevel

        # Stage the updates FIRST, streaming the (potentially expensive)
        # updates plan through a MEMORY_AND_DISK persist: the plan executes
        # exactly once (into the cache, during the write), and the
        # stats/watermark aggregation afterwards reads the cache instead of
        # re-listing + re-decoding the hundreds of freshly written partition
        # files — a fixed driver+IO cost that dominated merge latency on
        # day-partitioned tables. Tier data is already aggregated (bounded
        # by time-range x keys), so the cached footprint is small; DISK
        # spill bounds the worst case.
        # Clustering rows by the partition column before partitionBy keeps
        # one file per partition — without it every shuffle partition spills
        # a file into every partition dir and downstream scans pay per-file
        # task overhead. At cluster scale this becomes a file-size budget.
        updates = updates.persist(StorageLevel.MEMORY_AND_DISK)
        stats_src = updates
        merged = None
        rel_base = os.path.join("data", f"s{snap:06d}")
        if not man["partitions"]:
            # first snapshot: the staged write IS the table
            (updates.withColumn("_pk", F.col(pc))
             .repartition(F.col(pc))
             .write.mode("overwrite").partitionBy(pc)
             .parquet(os.path.join(self.path, rel_base)))
            part_dirs = self._list_parts(os.path.join(self.path, rel_base), pc)
        else:
            # Partition values of the update set, rendered Spark-side with
            # cast-to-string — the same rendering partition dir names use —
            # so they compare exactly against the manifest's decoded keys.
            # This tiny distinct job also materializes the updates cache
            # (the role the old stage write played). r6: the key-merge path
            # previously STAGED the updates to parquet and read them back
            # purely for schema/partition discovery, writing every touched
            # partition TWICE; the cached updates frame provides both
            # directly, so a key-merge now writes the data once — half the
            # write bytes of every incremental merge.
            def _write_merged(update_frame, existing_rels):
                """Key-merge ``update_frame`` against the named existing
                partition dirs and write the snapshot ONCE (shared by the
                stage-less fast path and the staged fallback — keep the two
                merge paths byte-identical)."""
                cur = self._read_dirs(spark, existing_rels)
                keep = cur.join(update_frame.select(*self.key_cols).distinct(),
                                on=self.key_cols, how="left_anti")
                # allowMissingColumns = schema evolution: updates may ADD
                # columns (existing rows read as NULL) and need not repeat
                # columns they don't change the shape of — the old
                # select(*keep.columns) SILENTLY DROPPED added columns
                m = (keep.unionByName(update_frame, allowMissingColumns=True)
                     .persist(StorageLevel.MEMORY_AND_DISK))
                (m.withColumn("_pk", F.col(pc))
                 .repartition(F.col(pc))
                 .write.mode("overwrite").partitionBy(pc)
                 .parquet(os.path.join(self.path, rel_base)))
                return m

            pvals = [r[0] for r in
                     updates.select(F.col(pc).cast("string")).distinct()
                     .collect()]
            # NULL and EMPTY STRING both render as __HIVE_DEFAULT_PARTITION__
            # in partition dir names, so neither compares against manifest
            # keys via cast-to-string — route them to the staged fallback,
            # whose dir-listing-derived keys handle them exactly (review
            # finding: the first cut checked only None and silently
            # overwrote an existing ''-partition instead of key-merging it)
            degenerate = any(v is None or v == "" for v in pvals)
            existing = [p for p in pvals if p and p in man["partitions"]]
            if existing and not replace_partitions and not degenerate:
                merged = _write_merged(
                    updates, [man["partitions"][p] for p in existing])
                part_dirs = self._list_parts(
                    os.path.join(self.path, rel_base), pc)
                stats_src = merged
            else:
                # nothing to key-merge (fresh partitions, full-partition
                # replace) or a degenerate partition value: stage, then
                # rename or merge via the staged read.
                rel_stage = rel_base + "_stage"
                stage_dir = os.path.join(self.path, rel_stage)
                (updates.withColumn("_pk", F.col(pc))
                 .repartition(F.col(pc))
                 .write.mode("overwrite").partitionBy(pc)
                 .parquet(stage_dir))
                part_dirs = self._list_parts(stage_dir, pc)
                existing = [p for p in part_dirs if p in man["partitions"]]
                if existing and not replace_partitions:
                    staged = self._read_dirs(
                        spark,
                        [os.path.join(rel_stage, d)
                         for d in part_dirs.values()],
                        with_schema=False)
                    merged = _write_merged(
                        staged, [man["partitions"][p] for p in existing])
                    stats_src = merged
                else:
                    # the staged write IS the new snapshot — rename,
                    # don't rewrite
                    os.rename(stage_dir, os.path.join(self.path, rel_base))

        # watermarks + row counts: first choice is the parquet footers of
        # the files just written (metadata-only, zero Spark jobs — Iceberg
        # commit-time stats); fallback is one aggregation job over the
        # cached written data (still no file re-scan).
        stats = self._footer_stats(os.path.join(self.path, rel_base),
                                   part_dirs, watermark_col)
        if stats is None:
            aggs = [F.count(F.lit(1)).alias("_n")]
            if watermark_col is not None:
                aggs.append(F.max(watermark_col).alias("_wm"))
            stats = {str(r[0]): r
                     for r in stats_src.groupBy(pc).agg(*aggs).collect()}
        rows = sum(r["_n"] for r in stats.values())
        if keep_data:
            # keep stats_src (the written content) cached for the caller;
            # release whichever staged frame it is not
            if merged is not None and stats_src is not merged:
                merged.unpersist()
            if stats_src is not updates:
                updates.unpersist()
        else:
            updates.unpersist()
            if merged is not None:
                merged.unpersist()
        if man["partitions"]:
            import shutil as _sh

            _sh.rmtree(os.path.join(self.path, rel_base + "_stage"),
                       ignore_errors=True)

        for pval, dirname in part_dirs.items():
            man["partitions"][pval] = os.path.join(rel_base, dirname)
            if watermark_col is not None:
                wm = _wm_json(stats[pval]["_wm"])
                prev = man["watermarks"].get(pval)
                # replace_partitions supersedes the partition's CONTENT, so
                # its watermark is the new content's max, not max-with-old:
                # a takedown that removes the highest-ts rows must LOWER the
                # watermark or incremental consumers skip the re-merge range.
                # A None wm (watermark column entirely NULL in this
                # partition) never participates in max() — keyed merges
                # keep the previous watermark, replaces clear it.
                if wm is None:
                    if replace_partitions:
                        man["watermarks"].pop(pval, None)
                else:
                    man["watermarks"][pval] = (
                        wm if replace_partitions or prev is None
                        else max(wm, prev))

        self._evolve_schema(man, stats_src.schema)

        record = {
            "snapshot": snap,
            "op": "merge_upsert",
            "partitions": sorted(part_dirs),
            "rows_in": rows,
            "wall_s": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if extra_record:
            record.update(extra_record)
        man["snapshot"] = snap
        man["partition_col"] = pc
        if self.part_spec:
            man["part_spec"] = self.part_spec
        if watermark_col is not None:
            man["watermark_col"] = watermark_col
        if props:
            man.setdefault("props", {}).update(props)
        record["partition_map"] = dict(man["partitions"])
        record["watermark_map"] = dict(man["watermarks"])
        record["schema"] = man.get("schema")
        man["lineage"].append(record)
        self._publish(man)
        if keep_data:
            # lineage stays JSON-clean: data/covers_table ride only the
            # returned record, never the persisted manifest
            record = dict(record)
            record["covers_table"] = (
                set(man["partitions"]) == set(part_dirs))
            record["data"] = (stats_src.drop(pc) if self.part_spec
                              else stats_src)
        return record

    def overwrite(self, spark: SparkSession, df: DataFrame,
                  watermark_col: str | None = None,
                  props: dict | None = None) -> dict:
        """Replace the whole table contents with ``df`` as a new snapshot
        (same atomic publish as merge; used by retention). Partitions absent
        from ``df`` are dropped from the manifest."""
        t0 = time.time()
        man = self._load()
        snap = man["snapshot"] + 1
        pc = self.partition_col
        df = self._with_part(df)

        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        rel_base = os.path.join("data", f"s{snap:06d}")
        (df.withColumn("_pk", F.col(pc))
         .repartition(F.col(pc))
         .write.mode("overwrite").partitionBy(pc)
         .parquet(os.path.join(self.path, rel_base)))
        data_dir = os.path.join(self.path, rel_base)
        part_dirs = self._list_parts(data_dir, pc)
        if part_dirs:
            # footer stats first (metadata-only), cached-frame job fallback
            stats = self._footer_stats(data_dir, part_dirs, watermark_col)
            if stats is None:
                aggs = [F.count(F.lit(1)).alias("_n")]
                if watermark_col is not None:
                    aggs.append(F.max(watermark_col).alias("_wm"))
                stats = {str(r[0]): r
                         for r in df.groupBy(pc).agg(*aggs).collect()}
        else:
            # every row aged out: publish an empty snapshot (partitions={})
            # rather than crashing on a zero-path read
            stats = {}
        df.unpersist()
        man["partitions"] = {
            p: os.path.join(rel_base, d) for p, d in part_dirs.items()}
        if watermark_col is not None:
            man["watermarks"] = {p: _wm_json(stats[p]["_wm"]) for p in part_dirs
                                 if _wm_json(stats[p]["_wm"]) is not None}
        else:
            # every partition's content was superseded: the previous
            # generation's watermarks are stale metadata — clear them
            # (ghost entries otherwise survive in lineage and rollback)
            man["watermarks"] = {}
            man.pop("watermark_col", None)
        record = {
            "snapshot": snap,
            "op": "overwrite",
            "partitions": sorted(part_dirs),
            "rows_in": sum(r["_n"] for r in stats.values()),
            "wall_s": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        man["snapshot"] = snap
        man["partition_col"] = pc
        if self.part_spec:
            man["part_spec"] = self.part_spec
        if props:
            man.setdefault("props", {}).update(props)
        # overwrite supersedes every data file, so the file schema RESETS
        # to the new frame's (merge evolves the schema; a stale schema here
        # would hide columns added — or keep columns dropped — by the
        # overwrite)
        man.pop("schema", None)
        if part_dirs:
            self._evolve_schema(man, df.schema)
        if watermark_col is not None:
            man["watermark_col"] = watermark_col
        record["partition_map"] = dict(man["partitions"])
        record["watermark_map"] = dict(man["watermarks"])
        record["schema"] = man.get("schema")
        man["lineage"].append(record)
        self._publish(man)
        return record

    def delete_where(self, spark: SparkSession, condition) -> dict:
        """Row-level DELETE (Iceberg copy-on-write DML parity): remove rows
        where ``condition`` evaluates TRUE, rewriting ONLY the partitions
        that contain matching rows. Partitions left empty are dropped
        metadata-only; untouched partitions' files are never read or
        written. The training-corpus use case is takedown / right-to-be-
        forgotten deletes, where a full-table rewrite at 100 TB is not an
        option.

        ``condition``: SQL string or Column. SQL DELETE semantics: a row
        is removed iff the predicate is TRUE (NULL keeps the row).

        Publishes up to two snapshots (drop of emptied partitions, then
        the rewrite) — each individually consistent and time-travelable.
        Returns ``{"op": "delete_where", "rows_deleted", "rewritten",
        "dropped", "snapshot"}``."""
        if not self.exists():
            # a takedown sweep over a fleet of tables must not abort on
            # an already-empty one (review finding)
            return {"op": "delete_where", "rows_deleted": 0,
                    "rewritten": [], "dropped": [],
                    "snapshot": self.snapshot()}
        cond = F.expr(condition) if isinstance(condition, str) else condition
        man = self._load()
        if man.get("watermarks") and man.get("watermark_col") is None:
            # manifests written before watermark_col recording carry
            # watermarked partitions but no column name to recompute them
            # from — deleting max-ts rows would silently keep the stale
            # (too-high) watermark and incremental consumers would skip
            # the re-merge range (ADVICE r5). Fail fast instead.
            raise ValueError(
                f"table {self.path} has partition watermarks but no "
                "recorded watermark_col (pre-upgrade manifest); "
                "delete_where cannot recompute watermarks after the "
                "rewrite — run one merge_upsert(..., watermark_col=...) "
                "to record the column first")
        df = self._with_part(self.read(spark))
        pc = self.partition_col

        from pyspark import StorageLevel

        # one scan job resolves both the touched partitions and, per
        # partition, whether any row survives — no second full pass
        stats = (df.groupBy(pc).agg(
            F.sum(F.when(cond, 1).otherwise(0)).alias("_del"),
            F.sum(F.when(cond, 0).otherwise(1)).alias("_keep"))
            .filter(F.col("_del") > 0).collect())
        rows_deleted = int(sum(r["_del"] for r in stats))
        if not stats:
            return {"op": "delete_where", "rows_deleted": 0,
                    "rewritten": [], "dropped": [],
                    "snapshot": self.snapshot()}
        emptied = sorted(str(r[pc]) for r in stats if r["_keep"] == 0)
        rewrite = sorted(str(r[pc]) for r in stats if r["_keep"] > 0)
        audit = {"op": "delete_where", "rows_deleted": rows_deleted,
                 "delete_dropped": emptied, "delete_rewritten": rewrite}
        if emptied:
            self.drop_partitions(emptied, extra_record=audit)
        if rewrite:
            scoped = self._with_part(self.read_partitions(spark, rewrite))
            kept = scoped.filter(~cond | cond.isNull()).persist(
                StorageLevel.MEMORY_AND_DISK)
            try:
                # replace_partitions RECOMPUTES the rewritten partitions'
                # watermarks from the kept rows (the table's recorded
                # watermark column) — deleting the max-ts rows must lower
                # the watermark or incremental consumers skip the re-merge
                self.merge_upsert(
                    spark, kept, replace_partitions=True,
                    watermark_col=self._load().get("watermark_col"),
                    extra_record=audit)
            finally:
                kept.unpersist()
        return {"op": "delete_where", "rows_deleted": rows_deleted,
                "rewritten": rewrite, "dropped": emptied,
                "snapshot": self.snapshot()}

    # ---- time travel (Iceberg snapshot-read / rollback parity) ----
    def snapshots(self) -> list[dict]:
        """Snapshot history: (snapshot, op, partitions touched, rows_in,
        ts) per committed change — the Iceberg `.snapshots` metadata
        surface."""
        keys = ("snapshot", "op", "partitions", "rows_in", "ts",
                "rows_deleted", "rolled_back_to")
        return [{k: r[k] for k in keys if k in r}
                for r in self._load()["lineage"]]

    def read_snapshot(self, spark: SparkSession, snapshot: int) -> DataFrame:
        """Time travel: the table content AS OF ``snapshot``. Works while
        the snapshot's data dirs survive (``vacuum()`` reclaims dirs no
        longer referenced by the CURRENT manifest, which ends time travel
        to superseded snapshots — same contract as Iceberg's
        expire_snapshots)."""
        rec = self._lineage_record(snapshot)
        pm = rec.get("partition_map")
        if pm is None:
            raise ValueError(
                f"snapshot {snapshot} of {self.path} predates partition-map"
                " lineage (written by an older writer) — time travel is"
                " available for snapshots committed after the upgrade")
        if not pm:
            raise ValueError(f"snapshot {snapshot} of {self.path} is empty")
        missing = [rel for rel in pm.values()
                   if not os.path.isdir(os.path.join(self.path, rel))]
        if missing:
            raise ValueError(
                f"snapshot {snapshot} of {self.path} was vacuumed "
                f"(missing dirs: {missing[:3]}...) — cannot time-travel")
        # read through the schema AS OF that snapshot (records carry it):
        # the current schema may have evolved or been reset by a later
        # overwrite, and old files misdecode under a retyped named schema
        df = self._read_dirs(spark, pm.values(),
                             schema_json=rec.get("schema"),
                             with_schema="schema" not in rec)
        if self.part_spec:
            df = df.drop(self.partition_col)
        return df

    def rollback(self, snapshot: int) -> dict:
        """Metadata-only rollback: publish a NEW snapshot whose content is
        the partition map of ``snapshot`` (Iceberg rollback semantics — the
        history keeps moving forward, no data files are touched)."""
        rec = self._lineage_record(snapshot)
        pm = rec.get("partition_map")
        if pm is None:
            raise ValueError(
                f"snapshot {snapshot} of {self.path} has no partition map —"
                " cannot roll back to it")
        # refuse a rollback whose data dirs were vacuumed: publishing a
        # manifest that names deleted dirs would wedge every later read
        # (review finding — read_snapshot had this guard, rollback did not)
        missing = [rel for rel in pm.values()
                   if not os.path.isdir(os.path.join(self.path, rel))]
        if missing:
            raise ValueError(
                f"snapshot {snapshot} of {self.path} was vacuumed "
                f"(missing dirs: {missing[:3]}...) — cannot roll back")
        man = self._load()
        snap = man["snapshot"] + 1
        man["partitions"] = dict(pm)
        wm = rec.get("watermark_map")
        man["watermarks"] = (dict(wm) if wm is not None else
                             {p: w for p, w in man["watermarks"].items()
                              if p in pm})
        # restore the file schema as of the rolled-back-to snapshot: a
        # later overwrite may have RESET it (retype), and reading the old
        # files through the newer schema misdecodes (review finding). A
        # recorded schema of None (e.g. the empty-table snapshot after a
        # full drop_partitions, which deliberately sheds the schema) must
        # POP the current schema, not keep it — otherwise the rollback
        # reintroduces the ghost-column/retype hazard drop_partitions
        # removed (ADVICE r5). Records from before schema recording carry
        # no key at all; for those the current schema is the best guess.
        if "schema" in rec:
            if rec["schema"] is not None:
                man["schema"] = rec["schema"]
            else:
                man.pop("schema", None)
        record = {
            "snapshot": snap,
            "op": "rollback",
            "rolled_back_to": snapshot,
            "partitions": sorted(pm),
            "rows_in": 0,
            "wall_s": 0.0,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partition_map": dict(pm),
            "watermark_map": dict(man["watermarks"]),
            "schema": man.get("schema"),
        }
        man["snapshot"] = snap
        man["lineage"].append(record)
        self._publish(man)
        return record

    def _lineage_record(self, snapshot: int) -> dict:
        rec = next((r for r in self._load()["lineage"]
                    if r["snapshot"] == snapshot), None)
        if rec is None:
            raise ValueError(
                f"no snapshot {snapshot} in {self.path} (have "
                f"{[r['snapshot'] for r in self._load()['lineage']]})")
        return rec

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
