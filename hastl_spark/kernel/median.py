"""Batched median with the reference's exact selection semantics.

The reference computes the median via an iterative rank-search
(median.fut:15-95 ``rankSearchBatch``) and then, for even-length series,
averages the upper median with the largest value strictly below it using
``c + (med - c) / 2`` (median.fut:131-135). The rank search is a GPU
work-partitioning device; its *result* is the k-th order statistic
(k = n_nn/2, 0-indexed), which we obtain by sorting — but the even-case
combination formula is reproduced verbatim (it is NOT fp-identical to
NumPy's ``(lo+hi)/2`` interpolated median).
"""

from __future__ import annotations

import numpy as np


def median_l(arr_l: np.ndarray, n_nn_l: np.ndarray) -> np.ndarray:
    """median.fut:97-135 — ``arr_l`` [B, n] is the +inf-padded compacted
    array (pad_gather with T.inf, stl.fut:337-341); ``n_nn_l`` [B] the
    non-pad counts. Returns [B] float64."""
    arr_l = np.asarray(arr_l, dtype=np.float64)
    B, n = arr_l.shape
    n_nn = np.asarray(n_nn_l, dtype=np.int64)
    srt = np.sort(arr_l, axis=1)
    k = n_nn // 2  # median.fut:103
    brow = np.arange(B, dtype=np.int64)
    med = srt[brow, k]  # k-th smallest == rankSearchBatch result
    # nlt = #(strictly < med); c = largest value strictly < med
    # (median.fut:115-130). srt is sorted, so the side='left' search equals
    # a vectorized strictly-less count — no per-row Python searchsorted
    nlt = (srt < med[:, None]).sum(axis=1).astype(np.int64)
    c = srt[brow, np.maximum(nlt - 1, 0)]
    even_avg = c + (med - c) / 2  # median.fut:134
    keep = (k == 0) | (n_nn % 2 == 1) | (nlt < k)  # median.fut:132-133
    return np.where(keep, med, even_avg)
