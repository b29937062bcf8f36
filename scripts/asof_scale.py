"""As-of join at scale: enrich every sequence row with its source's most
recent completed-hour rollup, through the union-merge single-shuffle plan.

Usage: python scripts/asof_scale.py [xl|b1] [cpus] [plain|bucketed|broadcast]

Reads the bench-generated sequences table from tmpfs
(/dev/shm/hastl_bench/sequences_<scale>), builds the hourly tier from the
same data, and times the full as-of enrichment into a noop sink (min of
`SPARK_GRAFT_REPEAT` runs, default 2).  The tokens array is column-pruned
out of the left side — the point of the plan is that the shuffle carries
O(|L|+|R|) *narrow* rows, so enriching 10^9 rows costs one exchange of the
key/time/payload columns only.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "xl"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    variant = sys.argv[3] if len(sys.argv) > 3 else "plain"
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    path = f"/dev/shm/hastl_bench/sequences_{scale}"

    from pyspark.sql import functions as F

    from hastl_spark.operators.asof import (asof_join, asof_join_broadcast,
                                            asof_join_bucketed)
    from hastl_spark.operators.rollup import with_event_time
    from hastl_spark.session import get_spark

    spark = get_spark(cpus, app_name=f"asof-scale-{scale}")
    seq = with_event_time(spark.read.parquet(path))
    left = seq.select("doc_id", "source", "ts", "n_tok")
    n_left = left.count()

    right = (
        seq.groupBy(
            "source",
            (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias("bucket_end"),
        )
        .agg(F.count(F.lit(1)).alias("prev_cnt"),
             F.sum(F.col("n_tok").cast("long")).alias("prev_tok"))
    )

    walls = []
    for _ in range(repeat):
        t0 = time.time()
        if variant == "bucketed":
            out = asof_join_bucketed(left, right, by="source", left_on="ts",
                                     right_on="bucket_end",
                                     bucket_seconds=3600, direction="backward")
        elif variant == "broadcast":
            out = asof_join_broadcast(left, right, by="source", left_on="ts",
                                      right_on="bucket_end",
                                      direction="backward")
        else:
            out = asof_join(left, right, by="source", left_on="ts",
                            right_on="bucket_end", direction="backward")
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))

    wall = min(walls)
    print(json.dumps({
        "metric": "asof_join_rows_per_sec",
        "scale": scale,
        "cpus": cpus,
        "variant": variant,
        "left_rows": n_left,
        "wall_s": wall,
        "walls_s": walls,
        "rows_per_sec": round(n_left / wall, 1),
    }))


if __name__ == "__main__":
    main()
