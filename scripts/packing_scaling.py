"""Paired N-vs-4N scaling evidence for the PHYSICAL packing operator
(pack_tokens), mirroring scripts/scaling_bench.py's protocol: interleaved
local[low]/local[high] spark-submit pairs over the same pre-generated
sequences input, each pair carrying a same-minute CPU + memory-bandwidth
host calibration (this VM's capacity drifts >2x minute-to-minute — a
collapsed pair must be attributable to host vs engine).

Writes BENCH/packing_scaling.json. Does NOT touch BENCH/scaling_last.json
(the pipeline's north-rule record).

Usage: python scripts/packing_scaling.py [--scale small] [--runs 3]
       [--low 2 --high 8] [--budget 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    build_zip, cpu_calibration, gen_input, membw_calibration, submit_job)


def run_packing(zpath: str, seq_path: str, cpus: int, budget: int,
                runs: int) -> dict:
    res = submit_job(zpath, "packing_job.py", [
        "--sequences-path", seq_path,
        "--cpus", str(cpus),
        "--budget", str(budget),
        "--warmup", "1",
        "--repeat", str(runs),
    ], cpus)
    return {"walls_s": res["walls"], "min_wall_s": min(res["walls"]),
            "tokens": res["tokens"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="small")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--per-side-repeat", type=int, default=3,
                    help="timed executions inside EACH side's JVM; the pair "
                         "ratio compares the two MINs — the ~6-20s packing "
                         "job is short enough that single-shot sides made "
                         "pair ratios minute-drift lottery tickets")
    args = ap.parse_args()

    zpath = build_zip()
    seq_path = gen_input(args.scale)

    pairs, hi_walls, lo_walls, tokens = [], [], [], 0
    for i in range(args.runs):
        pcal = cpu_calibration(args.low, args.high)
        pmem = membw_calibration(args.low, args.high)
        hi = run_packing(zpath, seq_path, args.high, args.budget,
                         args.per_side_repeat)
        lo = run_packing(zpath, seq_path, args.low, args.budget,
                         args.per_side_repeat)
        tokens = hi["tokens"]
        ratio = lo["min_wall_s"] / hi["min_wall_s"]
        pairs.append({
            "high_wall_s": hi["min_wall_s"],
            "low_wall_s": lo["min_wall_s"],
            "speedup": round(ratio, 3),
            "efficiency": round(ratio / (args.high / args.low), 3),
            "cpu_ceiling": pcal["ceiling"],
            "membw_ceiling": pmem["ceiling"],
        })
        hi_walls.append(hi["min_wall_s"])
        lo_walls.append(lo["min_wall_s"])
        print(f"pair {i}: {pairs[-1]}", flush=True)

    med = statistics.median(p["efficiency"] for p in pairs)
    report = {
        "job": "pack_tokens",
        "scale": args.scale,
        "budget": args.budget,
        "tokens": tokens,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "protocol": "paired-interleaved",
        "pairs": pairs,
        "efficiency_median_pair": med,
        "efficiency_best_pair": max(p["efficiency"] for p in pairs),
        "high_min_wall_s": min(hi_walls),
        "low_min_wall_s": min(lo_walls),
        "high_tokens_per_sec": round(tokens / min(hi_walls), 1),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "packing_scaling.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
