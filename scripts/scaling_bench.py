"""Scaling-efficiency evidence (BASELINE.md protocol): the SAME pipeline on
the SAME input at two parallelism levels — ``spark-submit --master local[8]``
vs ``local[32]`` with shuffle partitions scaled proportionally — as the
sandbox stand-in for N vs 4N executors. Median of 3 runs after 1 warmup,
throughput = rolled-up points / pipeline wall (JVM startup excluded: the
job times only its pipeline section). Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--scale medium] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_zip() -> str:
    zpath = os.path.join(ROOT, ".bench_data", "engine.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(os.path.join(ROOT, "hastl_spark")):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return zpath


def gen_input(scale: str) -> str:
    path = os.path.join(ROOT, ".bench_data", f"sequences_{scale}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        sys.path.insert(0, ROOT)
        from hastl_spark.session import get_spark
        from hastl_spark.sources.sequences import generate_scale

        spark = get_spark(32, app_name="gen-scaling-input")
        generate_scale(spark, scale).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def one_run(zpath: str, seq_path: str, cpus: int, tag: str) -> dict:
    out = os.path.join(ROOT, ".bench_data", f"scaling_out_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cpus}]",
        "--py-files", zpath,
        "--conf", f"spark.sql.shuffle.partitions={cpus}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--driver-memory", "8g",
        os.path.join(ROOT, "hastl_spark", "plans", "rollup_job.py"),
        "--sequences-path", seq_path,
        "--out", out,
        "--cpus", str(cpus),
    ]
    env = dict(os.environ, PYTHONPATH=zpath)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    total = time.time() - t0
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert line, f"no JSON from spark-submit (rc={proc.returncode}):\n{proc.stderr[-3000:]}"
    summary = json.loads(line[-1])
    summary["total_incl_jvm_s"] = round(total, 1)
    shutil.rmtree(out, ignore_errors=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    zpath = build_zip()
    seq_path = gen_input(args.scale)

    # warmups (page cache + JIT), then ALTERNATE high/low runs so host-load
    # drift over the session cancels instead of biasing one config
    one_run(zpath, seq_path, args.high, f"c{args.high}")
    one_run(zpath, seq_path, args.low, f"c{args.low}")
    walls: dict[int, list] = {args.high: [], args.low: []}
    pts = 0
    for _ in range(args.runs):
        for cpus in (args.high, args.low):
            r = one_run(zpath, seq_path, cpus, f"c{cpus}")
            walls[cpus].append(r["wall_s"])
            pts = r["rolled_up_points"]
            print(f"local[{cpus}]: wall={r['wall_s']}", flush=True)

    results = {}
    for cpus in (args.high, args.low):
        med = statistics.median(walls[cpus])
        results[cpus] = {
            "walls_s": walls[cpus],
            "median_wall_s": med,
            "min_wall_s": min(walls[cpus]),
            "rolled_up_points": pts,
            "points_per_sec": round(pts / med, 1),
        }
        print(f"local[{cpus}]: walls={walls[cpus]} median={med}", flush=True)

    lo, hi = results[args.low], results[args.high]
    speedup = lo["median_wall_s"] / hi["median_wall_s"]
    eff = speedup / (args.high / args.low)
    report = {
        "scale": args.scale,
        "input": seq_path,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "results": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

## Scaling efficiency (north_rule: N vs 4N, sandbox stand-in local[{args.low}] vs local[{args.high}])

Protocol (BASELINE.md): same job (`spark-submit --py-files engine.zip
hastl_spark/plans/rollup_job.py`), same pre-generated input
(`sequences_{args.scale}`, deterministic seed, skewed sources, salting ON),
shuffle partitions scaled with cores, median of {args.runs} runs after 1 warmup,
pipeline-section wall only (JVM startup excluded).

| parallelism | walls (s) | median wall (s) | rolled-up points | points/sec |
|---|---|---|---|---|
| local[{args.low}] | {lo['walls_s']} | {lo['median_wall_s']} | {lo['rolled_up_points']} | {lo['points_per_sec']} |
| local[{args.high}] | {hi['walls_s']} | {hi['median_wall_s']} | {hi['rolled_up_points']} | {hi['points_per_sec']} |

**speedup {args.low}->{args.high} cores: {report['speedup']}x;
scaling efficiency: {report['scaling_efficiency']} (target >= 0.8)**

Confs pinned: AQE on, Arrow on, UTC, driver-memory 8g,
spark.sql.shuffle.partitions = cores. Input rows / tokens per `bench.py`.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
