"""spark-submit-able physical-packing throughput job.

Runs :func:`hastl_spark.operators.packing.pack_tokens` over a pre-generated
``sequences`` parquet table (doc_id string, tokens array<int32>, n_tok,
source) and prints ONE JSON line ``{"walls": [...], "tokens": N, ...}`` —
the shape scripts/packing_scaling.py consumes for the paired N-vs-4N
scaling evidence of the training-assembly operator.

The numeric order key is the sequences table's zero-padded doc_id suffix
(``{source}-{seq:010d}``, sources/sequences.py:19) — pack_sequences
requires an integral id for its order-preserving sharding.
sum(size(tokens)) forces full pack assembly (a bare count() would let
Catalyst prune the collect_list) and must equal the input token count
(conservation assert, same as bench.py's packing section).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="pack_tokens throughput job")
    ap.add_argument("--sequences-path", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from hastl_spark.operators.packing import pack_tokens
    from hastl_spark.session import get_spark

    spark = get_spark(args.cpus, app_name="packing-job")
    seqs = spark.read.parquet(args.sequences_path)
    # full seq suffix, NOT substring(-10): a fixed-width slice silently
    # truncates seqs past 10 digits (histories > ~69 days of minutes),
    # scrambling the id-order packing key while the order-insensitive
    # conservation assert still passes — same derivation as rollup_job
    pseq = seqs.select(
        F.split(F.col("doc_id"), "-").getItem(1).cast("long").alias("doc_id"),
        "source", "tokens", "n_tok")
    expected = seqs.selectExpr("sum(n_tok)").collect()[0][0]

    def once() -> int:
        return pack_tokens(pseq, args.budget).select(
            F.sum(F.size("tokens"))).collect()[0][0]

    for _ in range(args.warmup):
        once()
    walls, tokens = [], 0
    for _ in range(args.repeat):
        t0 = time.time()
        tokens = once()
        walls.append(round(time.time() - t0, 3))
    if int(tokens) != int(expected):  # explicit: survives python -O
        raise RuntimeError(
            f"packing lost tokens: packed {tokens} vs input {expected}")
    print(json.dumps({
        "walls": walls,
        "tokens": int(tokens),
        "budget": args.budget,
        "cpus": args.cpus,
        "tokens_per_sec_min": round(tokens / min(walls), 1),
    }))


if __name__ == "__main__":
    main()
