"""CPU voxel down-sampling (numpy), reference ``util/voxelize.py:46-95``.

Train mode picks one random point per occupied voxel; val mode returns the
hash-sorted order + per-voxel counts consumed by the vote-chunked evaluator
(reference ``test_backup.py:177-188``).
"""

from __future__ import annotations

import numpy as np


def fnv_hash_vec(arr):
    """FNV64-1A over integer coordinate rows (reference :46-58 semantics)."""
    assert arr.ndim == 2
    arr = arr.astype(np.uint64, copy=True)
    h = np.full(arr.shape[0], np.uint64(14695981039346656037))
    for j in range(arr.shape[1]):
        h = h * np.uint64(1099511628211)
        h = np.bitwise_xor(h, arr[:, j])
    return h


def ravel_hash_vec(arr):
    """Fortran-style raveled coordinates (reference :61-77 semantics)."""
    assert arr.ndim == 2
    arr = arr.copy()
    arr -= arr.min(0)
    arr = arr.astype(np.uint64, copy=False)
    arr_max = arr.max(0).astype(np.uint64) + 1
    keys = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1] - 1):
        keys += arr[:, j]
        keys *= arr_max[j + 1]
    keys += arr[:, -1]
    return keys


def voxelize(coord, voxel_size=0.05, hash_type="fnv", mode=0, rng=None):
    """Reference-semantics voxel subsample.

    mode 0 (train): random point per voxel -> unique index array.
    mode 1 (val): (idx_sort, count) for vote chunking.
    """
    discrete = np.floor(coord / np.array(voxel_size)).astype(np.int64)
    if hash_type == "ravel":
        key = ravel_hash_vec(discrete)
    else:
        key = fnv_hash_vec(discrete)

    idx_sort = np.argsort(key)
    key_sort = key[idx_sort]
    _, count = np.unique(key_sort, return_counts=True)
    if mode == 0:
        if rng is None:
            rng = np.random
        pick = rng.randint(0, count.max(), count.size) % count
        idx_select = np.cumsum(np.insert(count, 0, 0)[0:-1]) + pick
        return idx_sort[idx_select]
    return idx_sort, count
