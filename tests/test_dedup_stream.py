"""Streaming incremental dedup == batch LSH self-join: documents arrive
as files over two drains; the union of emitted pairs must equal the
batch `minhash_lsh_pairs_portable` result over the whole corpus, with no
pair emitted twice."""

import pytest

from hastl_spark.operators.dedup import minhash_lsh_pairs_portable
from hastl_spark.streaming.dedup_stream import run_streaming_dedup

SF = "/root/testdata/sf0.01"


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.est_jaccard) for r in df.collect()}


@pytest.mark.slow
def test_streaming_dedup_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").filter("doc_id < 300").cache()
    schema = docs.schema  # readStream.schema accepts the StructType directly

    docs_dir = str(tmp_path / "docs_in")
    idx_path = str(tmp_path / "mh_idx")
    out_dir = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: first 180 docs
    docs.filter("doc_id < 180").write.mode("overwrite").parquet(docs_dir)
    q = run_streaming_dedup(spark, docs_dir, schema, idx_path, out_dir, ckpt,
                            max_files_per_trigger=4)
    q.awaitTermination(300)

    # drain 2: the rest arrive later
    docs.filter("doc_id >= 180").write.mode("append").parquet(docs_dir)
    q2 = run_streaming_dedup(spark, docs_dir, schema, idx_path, out_dir, ckpt,
                             max_files_per_trigger=4)
    q2.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    n_rows = got.count()
    pairs = _pairs_set(got.select("id_a", "id_b", "est_jaccard"))
    assert n_rows == len(pairs)  # no pair emitted twice, across all batches

    batch = _pairs_set(minhash_lsh_pairs_portable(
        docs, n=5, k=16, bands=4, threshold=0.35))
    assert pairs == batch
