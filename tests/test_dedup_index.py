"""Incremental MinHash dedup index: pinned equal to the batch self-join.

The invariant that makes the index trustworthy: for any split of a corpus
into an already-indexed part and a new batch, `MinHashIndex.probe(new)`
returns EXACTLY the batch `minhash_lsh_pairs_portable(old ∪ new)` pairs
restricted to "at least one side is new" — same ids, same est_jaccard.
"""

import pytest

from hastl_spark.operators.dedup import minhash_lsh_pairs_portable
from hastl_spark.operators.dedup_index import MinHashIndex

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.est_jaccard) for r in df.collect()}


@pytest.fixture()
def idx_path(tmp_path):
    return str(tmp_path / "mh_idx")


def test_incremental_equals_batch_restriction(spark, idx_path):
    docs = _docs(spark)
    old = docs.filter("doc_id < 200")
    new = docs.filter("doc_id >= 200 AND doc_id < 300")

    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    idx.build(spark, old)
    inc, record = idx.dedup_incremental(spark, new, threshold=0.35)

    batch = minhash_lsh_pairs_portable(
        docs.filter("doc_id < 300"), n=5, k=16, bands=4, threshold=0.35)
    expected = {(a, b, j) for a, b, j in _pairs_set(batch)
                if a >= 200 or b >= 200}
    assert _pairs_set(inc) == expected
    assert record is not None and record["rows_in"] > 0
    inc.unpersist()


def test_two_batches_cover_all_new_pairs(spark, idx_path):
    """Ingesting in two increments finds, across the two probes, every
    batch pair except old-old ones — and never a pair twice."""
    docs = _docs(spark)
    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    idx.build(spark, docs.filter("doc_id < 150"))
    p1, _ = idx.dedup_incremental(
        spark, docs.filter("doc_id >= 150 AND doc_id < 225"))
    p2, _ = idx.dedup_incremental(
        spark, docs.filter("doc_id >= 225 AND doc_id < 300"))
    s1, s2 = _pairs_set(p1), _pairs_set(p2)
    assert not (s1 & s2)

    batch = _pairs_set(minhash_lsh_pairs_portable(
        docs.filter("doc_id < 300"), n=5, k=16, bands=4, threshold=0.35))
    expected = {(a, b, j) for a, b, j in batch if a >= 150 or b >= 150}
    assert (s1 | s2) == expected
    p1.unpersist()
    p2.unpersist()


def test_probe_without_merge_leaves_index_unchanged(spark, idx_path):
    docs = _docs(spark)
    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    idx.build(spark, docs.filter("doc_id < 100"))
    snap0 = idx.table.snapshot()
    pairs, record = idx.dedup_incremental(
        spark, docs.filter("doc_id >= 100 AND doc_id < 150"), merge=False)
    assert record is None
    assert idx.table.snapshot() == snap0
    pairs.unpersist()


def test_param_mismatch_fails_fast(spark, idx_path):
    docs = _docs(spark)
    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    idx.build(spark, docs.filter("doc_id < 50"))
    with pytest.raises(ValueError, match="not comparable"):
        MinHashIndex(idx_path, n=5, k=16, bands=8)


def test_empty_index_probe_is_new_vs_new_only(spark, idx_path):
    """Probing a fresh (empty) index degenerates to batch dedup of the
    new batch alone."""
    docs = _docs(spark)
    new = docs.filter("doc_id < 100")
    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    inc = idx.probe(spark, new, threshold=0.35)
    batch = minhash_lsh_pairs_portable(new, n=5, k=16, bands=4,
                                       threshold=0.35)
    assert _pairs_set(inc) == _pairs_set(batch)


def test_replay_probe_identical_after_merge(spark, idx_path):
    """foreachBatch replay semantics: probing a batch AFTER its merge
    committed yields exactly the first attempt's pairs — the index's copy
    of the batch's own doc_ids is excluded from candidates and from the
    bucket-cap counts."""
    docs = _docs(spark)
    idx = MinHashIndex(idx_path, n=5, k=16, bands=4)
    idx.build(spark, docs.filter("doc_id < 200"))
    batch = docs.filter("doc_id >= 200 AND doc_id < 300")
    first = _pairs_set(idx.probe(spark, batch))
    idx.build(spark, batch)                      # merge committed
    replay = _pairs_set(idx.probe(spark, batch))  # retry after crash
    assert replay == first
