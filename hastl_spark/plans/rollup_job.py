"""End-to-end rollup + STL-gapfill + Gorilla pipeline driver.

``python -m hastl_spark.plans.rollup_job --scale tiny --out /tmp/tiers``

Stages (SURVEY.md §3.4):
  sequences -> token-invariant check -> event-time derivation ->
  salted 1m rollup -> MERGE tier_1m -> STL gap-fill (applyInPandas) ->
  MERGE gapfill_1m -> 1h/1d re-rollup -> MERGE -> Gorilla chunks per tier ->
  MERGE chunk tables; lineage manifest per run; prints one JSON metrics line.

Runs incrementally: pass ``--since-bucket N`` to restrict the raw scan to
buckets >= N (Iceberg snapshot-diff stand-in); MERGE keeps prior rows.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hastl_spark.operators.chunks import gorilla_chunks
from hastl_spark.operators.gapfill import stl_gapfill
from hastl_spark.operators.rollup import rollup_1m, rollup_tier, token_invariant_violations, with_event_time
from hastl_spark.session import get_spark
from hastl_spark.sources.sequences import SEQS_PER_BUCKET, generate_scale
from hastl_spark.sources.tables import DAY_SPEC, MONTH_SPEC, PART_SEP, KeyedTable


def run_pipeline(
    spark: SparkSession,
    sequences: DataFrame,
    out_dir: str,
    n_salts: int = 16,
    stl_kwargs: dict | None = None,
    do_gorilla: bool = True,
    check_invariant: bool = True,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}
    t_start = time.time()

    seq = with_event_time(sequences)

    # raw -> 1m (salted two-phase agg). Day-partitioned (source~day): an
    # incremental/backfill merge rewrites only the touched days' files.
    # The per-row token-array invariant rides the SAME pass as associative
    # extra aggregates (count of size(tokens)<>n_tok violations + an
    # order-insensitive sampled content checksum — catches drops,
    # truncation and reordering at zero extra scans; the old separate
    # invariant scan was ~25% of pipeline wall). A FULL per-element hash
    # costs 2-5x the pipeline at scale (array hashing is outside codegen),
    # so full-fidelity token equality is asserted in the pytest suite at
    # small scale instead (tests/test_pipeline_spark).
    r1m_inv = rollup_1m(seq, n_salts=n_salts, with_invariant=check_invariant)
    if check_invariant:
        from pyspark import StorageLevel

        r1m_inv = r1m_inv.persist(StorageLevel.MEMORY_AND_DISK)
        row = r1m_inv.selectExpr("sum(bad) AS bad", "bit_xor(chk) AS chk").collect()[0]
        assert (row["bad"] or 0) == 0, \
            f"token-array invariant violated on {row['bad']} rows"
        metrics["token_invariant_violations"] = int(row["bad"] or 0)
        metrics["token_checksum"] = str(row["chk"])
        r1m = r1m_inv.select("source", "bucket", "cnt", "sum_n_tok")
    else:
        r1m = r1m_inv
    t_1m = KeyedTable(os.path.join(out_dir, "tier_1m"), ["source", "bucket"],
                      part_spec=DAY_SPEC)
    rec = t_1m.merge_upsert(spark, r1m, watermark_col="bucket")
    if check_invariant:
        r1m_inv.unpersist()
    metrics["tier_1m"] = rec

    # STL gap-fill on the 1m series. The maintained 1m table is consumed by
    # THREE downstream stages (gap-fill, 1h re-rollup, chunk encode) — cache
    # the read so the day-partitioned file set (hundreds of small parquet
    # files at multi-day spans) is listed and decoded once, not three times.
    cur_1m = t_1m.read(spark).persist()
    gap = stl_gapfill(cur_1m, **(stl_kwargs or {}))
    t_gap = KeyedTable(os.path.join(out_dir, "gapfill_1m"), ["source", "bucket"])
    rec = t_gap.merge_upsert(spark, gap, watermark_col="bucket")
    metrics["gapfill_1m"] = rec

    # tier cascade (re-aggregates the maintained 1m table, not the raw scan).
    # Incremental: only the DAYS this run's 1m merge touched need re-rollup —
    # the touched-day set comes from the merge's own lineage record (day
    # boundaries align with 1h and 1d buckets, so day-filtered re-rollup
    # yields complete tier buckets); MERGE keeps every other day's rows.
    days = sorted({p.split(PART_SEP)[1] for p in metrics["tier_1m"]["partitions"]})
    upd_1m = cur_1m.filter(F.to_date("bucket").cast("string").isin(days))
    # month granularity for 1h: a source-day of hourly data is 24 rows, so
    # day dirs would be pathological small files at any input scale
    t_1h = KeyedTable(os.path.join(out_dir, "tier_1h"), ["source", "bucket"],
                      part_spec=MONTH_SPEC)
    r1h = rollup_tier(upd_1m, "1h")
    metrics["tier_1h"] = t_1h.merge_upsert(spark, r1h, watermark_col="bucket")
    t_1d = KeyedTable(os.path.join(out_dir, "tier_1d"), ["source", "bucket"])
    upd_1h = t_1h.read(spark).filter(F.to_date("bucket").cast("string").isin(days))
    metrics["tier_1d"] = t_1d.merge_upsert(spark, rollup_tier(upd_1h, "1d"),
                                           watermark_col="bucket")

    if do_gorilla:
        # ONE unified chunk table keyed (source, tier, chunk_start): the four
        # per-tier chunk streams union into a single MERGE (one write job
        # instead of four — chunk rows are tiny, job latency dominated)
        parts = []
        tier_reads = {"1m": cur_1m, "1h": t_1h.read(spark), "1d": t_1d.read(spark)}
        for tier, tdf in tier_reads.items():
            parts.append(gorilla_chunks(tdf, "sum_n_tok")
                         .withColumn("tier", F.lit(tier)))
        parts.append(gorilla_chunks(t_gap.read(spark), "gapfilled")
                     .withColumn("tier", F.lit("gapfill_1m")))
        chunks = parts[0]
        for p in parts[1:]:
            chunks = chunks.unionByName(p)
        # chunk sets are REGENERATED from the full tier each run, and a
        # backfill can shift 65536-point chunk boundaries (new chunk_start
        # keys overlapping stale rows) — so each (source, tier) partition is
        # replaced wholesale, not key-merged
        t_ch = KeyedTable(os.path.join(out_dir, "chunks"),
                          ["source", "tier", "chunk_start"],
                          part_spec={"cols": ["source", "tier"]})
        metrics["chunks"] = t_ch.merge_upsert(spark, chunks,
                                              replace_partitions=True)

    cur_1m.unpersist()
    wall = time.time() - t_start
    pts = (metrics["tier_1m"]["rows_in"] + metrics["tier_1h"]["rows_in"]
           + metrics["tier_1d"]["rows_in"] + metrics["gapfill_1m"]["rows_in"])
    metrics["summary"] = {
        "wall_s": round(wall, 3),
        "rolled_up_points": pts,
        "points_per_sec": round(pts / wall, 1),
    }
    with open(os.path.join(out_dir, "_run_manifest.json"), "w") as f:
        json.dump(metrics, f, indent=1, default=str)
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser(description="rollup + STL gap-fill + Gorilla pipeline")
    from hastl_spark.sources.sequences import SCALES
    ap.add_argument("--scale", default="tiny", choices=sorted(SCALES),
                    help="synthetic scale")
    ap.add_argument("--sequences-path", default=None, help="read sequences parquet instead of generating")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--n-salts", type=int, default=16)
    ap.add_argument("--since-bucket", type=int, default=None,
                    help="incremental: only process bucket index >= N")
    ap.add_argument("--no-gorilla", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed pipeline executions in this session (bench)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="discarded in-session warmup executions (JIT/codegen)")
    args = ap.parse_args(argv)

    spark = get_spark(args.cpus, app_name="hastl-rollup-job")
    if args.sequences_path:
        seqs = spark.read.parquet(args.sequences_path)
    else:
        seqs = generate_scale(spark, args.scale)
    if args.since_bucket is not None:
        seq_no = F.split(F.col("doc_id"), "-").getItem(1).cast("long")
        seqs = seqs.filter((seq_no / SEQS_PER_BUCKET).cast("long") >= args.since_bucket)

    if args.repeat == 1 and args.warmup == 0:
        metrics = run_pipeline(spark, seqs, args.out, n_salts=args.n_salts,
                               do_gorilla=not args.no_gorilla)
        print(json.dumps(metrics["summary"]))
        return

    # bench mode: warmup + repeated timed executions in ONE session, so JVM
    # JIT / codegen / python-worker startup are excluded from the timings
    import shutil

    walls = []
    pts = 0
    for i in range(args.warmup + args.repeat):
        out = f"{args.out}_r{i}"
        shutil.rmtree(out, ignore_errors=True)
        metrics = run_pipeline(spark, seqs, out, n_salts=args.n_salts,
                               do_gorilla=not args.no_gorilla)
        shutil.rmtree(out, ignore_errors=True)
        if i >= args.warmup:
            walls.append(metrics["summary"]["wall_s"])
            pts = metrics["summary"]["rolled_up_points"]
    print(json.dumps({"walls": walls, "rolled_up_points": pts}))


if __name__ == "__main__":
    main()
