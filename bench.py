"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full
rollup + STL-gapfill + Gorilla pipeline over the deterministic synthetic
``sequences`` table (cached under .bench_data/ — generation is not timed).

Prints ONE JSON line:
  {"metric": "...", "value": <total query sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pipeline": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HEADLINE = [
    "rollup_1m", "rollup_1h", "rollup_1d", "densify_1h", "top_users",
    "sessions", "lineitem_pricing", "revenue_by_nation",
    "docs_stats", "docs_quality", "docs_tokens_bpe", "docs_exact_dedup",
    "docs_jaccard_pairs",
    "embeddings_knn", "ann_topk", "ivf_topk_full", "embedding_near_dups",
    "minhash_pairs", "simhash_portable",
    "stl_gapfill_1h", "loess_smooth_1h", "gorilla_roundtrip_1h", "trend_strength",
]

PIPELINE_SCALE = os.environ.get("SPARK_GRAFT_PIPE_SCALE", "small")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from hastl_spark.plans.rollup_job import run_pipeline
    from hastl_spark.session import get_spark
    from hastl_spark.sources.sequences import SCALES, generate_scale

    spark = get_spark(cpus, app_name="hastl-bench")
    qs = entrymod.queries()

    # warm the JVM/Python-worker pools once (not timed per-query)
    qs["rollup_1m"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # ---- synthetic-sequences pipeline (points/sec is the north metric) ----
    # stage on tmpfs when available: the sandbox block device throttles under
    # sustained load and would dominate the measurement (see BENCH/BASELINE.md)
    root = os.path.dirname(os.path.abspath(__file__))
    if os.path.isdir("/dev/shm"):
        data_root = "/dev/shm/hastl_bench"
        os.makedirs(data_root, exist_ok=True)
    else:
        data_root = os.path.join(root, ".bench_data")
    seq_path = os.path.join(data_root, f"sequences_{PIPELINE_SCALE}")
    if not os.path.exists(os.path.join(seq_path, "_SUCCESS")):
        generate_scale(spark, PIPELINE_SCALE).write.mode("overwrite").parquet(seq_path)
    seqs = spark.read.parquet(seq_path)
    tokens_scanned = seqs.selectExpr("sum(n_tok)").collect()[0][0]

    out_dir = os.path.join(data_root, f"tiers_{PIPELINE_SCALE}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    metrics = run_pipeline(spark, seqs, out_dir, check_invariant=False)
    pipe_wall = time.time() - t0
    pts = metrics["summary"]["rolled_up_points"]

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline": {
            "scale": PIPELINE_SCALE,
            "input_rows": seqs.count(),
            "tokens_scanned": int(tokens_scanned),
            "rolled_up_points": pts,
            "wall_s": round(pipe_wall, 3),
            "points_per_sec": round(pts / pipe_wall, 1),
            "tokens_per_sec": round(tokens_scanned / pipe_wall, 1),
            "cpus": cpus,
        },
    }))


if __name__ == "__main__":
    main()
