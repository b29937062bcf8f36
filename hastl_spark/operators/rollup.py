"""Bucket rollup + tier cascade — the pipeline's relational core.

All Catalyst-native (partial+final hash aggregation, whole-stage codegen).
Skew: the ``north_rule`` mandates explicit salted repartitioning for the
source-key skew (src00 ~ half the data). We do a two-phase aggregation —
partial ``groupBy(source, bucket, salt)`` then final ``groupBy(source,
bucket)`` — which bounds any single reducer's input to ``1/n_salts`` of a
hot key even where map-side combine is defeated by cardinality
(SURVEY.md §4 "Shuffle/skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.sequences import EPOCH0, SEQS_PER_BUCKET

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}


def with_event_time(df: DataFrame) -> DataFrame:
    """Derive event time from doc_id (FIXTURES.md §1: the input schema has
    no timestamp; bucket index b = seq div SEQS_PER_BUCKET, ts = EPOCH0 + b
    minutes). Purely columnar — stays in whole-stage codegen."""
    seq = F.split(F.col("doc_id"), "-").getItem(1).cast("long")
    b = (seq / SEQS_PER_BUCKET).cast("long")
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH0).cast("timestamp")) + b * 60
    )
    return df.withColumn("ts", ts)


def token_invariant_violations(df: DataFrame) -> DataFrame:
    """Per-row token-array invariant (BASELINE.json input_hint): n_tok must
    equal the token-array length; returns the violating rows (expect 0).
    Also exposes a content hash usable to assert byte-equality across
    row-preserving stages."""
    return (
        df.withColumn("tok_len", F.size("tokens"))
        .withColumn("tok_hash", F.xxhash64("tokens"))
        .filter((F.col("tok_len") != F.col("n_tok")) & (F.col("tok_len") >= 0))
    )


def rollup_1m(df: DataFrame, n_salts: int = 16, value_col: str = "n_tok",
              with_invariant: bool = False) -> DataFrame:
    """raw -> 1m: per (source, minute bucket): doc count + token sum.

    Two-phase salted aggregation; output schema:
    (source, bucket timestamp, cnt long, sum_n_tok long).

    ``with_invariant=True`` folds the per-row token-array invariant into the
    same pass (extra columns ``bad`` and ``chk``): the violation count and
    the order-insensitive sampled content checksum are both associative, so
    they ride the partial aggregation instead of costing a second full scan
    of the raw table (the invariant check used to be ~25% of pipeline wall).
    Totals = sum(bad), bit_xor(chk) over the output.
    """
    df = df.withColumn("bucket", F.date_trunc("minute", F.col("ts")))
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)).alias("salt")
    p_aggs = [
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum(F.col(value_col).cast("long")).alias("p_sum"),
    ]
    f_aggs = [F.sum("p_cnt").alias("cnt"), F.sum("p_sum").alias("sum_n_tok")]
    if with_invariant:
        p_aggs += [
            F.expr("sum(CASE WHEN size(tokens) <> n_tok AND size(tokens) >= 0 "
                   "THEN 1 ELSE 0 END)").alias("p_bad"),
            F.expr("bit_xor(CASE WHEN size(tokens) > 0 THEN xxhash64(doc_id, "
                   "n_tok, element_at(tokens, 1), element_at(tokens, "
                   "size(tokens))) ELSE xxhash64(doc_id, n_tok) END)"
                   ).alias("p_chk"),
        ]
        f_aggs += [F.sum("p_bad").alias("bad"),
                   F.expr("bit_xor(p_chk)").alias("chk")]
    partial = df.groupBy("source", "bucket", salt).agg(*p_aggs)
    return partial.groupBy("source", "bucket").agg(*f_aggs)


def rollup_tier(lower: DataFrame, tier: str,
                cnt_col: str = "cnt", sum_col: str = "sum_n_tok",
                key_col: str = "source") -> DataFrame:
    """tier N -> tier N+1 re-aggregation: sums/counts compose exactly
    (SURVEY.md §2.4 'tier rollup'). Pure Catalyst."""
    trunc = TIER_TRUNC[tier]
    return (
        lower.groupBy(key_col, F.date_trunc(trunc, F.col("bucket")).alias("bucket"))
        .agg(F.sum(cnt_col).alias("cnt"), F.sum(sum_col).alias(sum_col))
    )
