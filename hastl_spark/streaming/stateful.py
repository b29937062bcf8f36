"""Custom stateful streaming operator: per-source bucket-gap monitor.

Demonstrates the ``applyInPandasWithState`` pattern (SURVEY.md §2.9 /
pyspark guide: custom stateful operators): per source, state carries the
highest minute-bucket index seen; every micro-batch emits one row per
MISSING bucket between the previous high-water mark and the new one — the
streaming twin of the batch grid-densification gap materialization.

State schema is a single long (the high-water bucket index); output rows
are (source, missing bucket timestamp, detected_at bucket timestamp).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hastl_spark.operators.rollup import with_event_time
from hastl_spark.sources.sequences import EPOCH0

OUTPUT_SCHEMA = "source string, missing_bucket timestamp, detected_at timestamp"
STATE_SCHEMA = "hwm long"

# ONE source of truth for the epoch: derived from sources.sequences.EPOCH0
# (a hardcoded twin would silently diverge if the fixture epoch moved)
from datetime import datetime as _dt, timezone as _tz  # noqa: E402

_EPOCH0_S = int(_dt.fromisoformat(EPOCH0).replace(tzinfo=_tz.utc).timestamp())


def _gap_monitor(key, pdfs, state: GroupState):
    source = key[0]
    seen = set()
    for pdf in pdfs:
        seen.update(int(b) for b in pdf["b"].unique())
    if not seen:
        return
    hwm = state.get[0] if state.exists else None
    lo = min(seen)
    hi = max(seen)
    start = lo if hwm is None else hwm + 1
    rows = []
    detected = pd.Timestamp(( _EPOCH0_S + hi * 60), unit="s")
    for b in range(start, hi + 1):
        if b not in seen:
            rows.append((source, pd.Timestamp(_EPOCH0_S + b * 60, unit="s"), detected))
    state.update((max(hi, hwm if hwm is not None else hi),))
    if rows:
        yield pd.DataFrame(rows, columns=["source", "missing_bucket", "detected_at"])


def streaming_gap_monitor(spark, seq_dir: str,
                          schema: str = "doc_id string, tokens array<int>, n_tok int, source string") -> DataFrame:
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("path", seq_dir).load()
    )
    seq = with_event_time(stream)
    b = ((F.unix_timestamp("ts") - F.lit(_EPOCH0_S)) / 60).cast("long").alias("b")
    return (
        seq.select("source", b)
        .groupBy("source")
        .applyInPandasWithState(
            _gap_monitor, OUTPUT_SCHEMA, STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_gap_monitor(spark, seq_dir: str, out_dir: str, checkpoint_dir: str):
    q = (
        streaming_gap_monitor(spark, seq_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q
