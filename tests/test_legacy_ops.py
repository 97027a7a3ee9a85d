"""Oracle tests for the dense-batch legacy compatibility ops.

Numpy oracles transcribe the scan-order semantics of the reference's
legacy CUDA kernels (``lib/pointops/src``); see op docstrings for the
file:line citations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stratified_transformer_tpu.ops import legacy


def _clouds(b=2, n=64, m=16, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32)
    new_xyz = rng.uniform(0, 1, size=(b, m, 3)).astype(np.float32)
    return new_xyz, xyz


def _ball_query_oracle(new_xyz, xyz, radius, nsample):
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    for bi in range(b):
        for j in range(m):
            c = 0
            for k in range(n):
                d2 = np.sum((new_xyz[bi, j] - xyz[bi, k]) ** 2)
                if d2 < radius * radius:
                    if c == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, c] = k
                    c += 1
                    if c >= nsample:
                        break
            cnt[bi, j] = c
    return idx, cnt


def test_ball_query_dense_matches_cuda_scan_order():
    new_xyz, xyz = _clouds()
    radius, nsample = 0.3, 8
    want_idx, want_cnt = _ball_query_oracle(new_xyz, xyz, radius, nsample)
    got_idx, got_cnt = legacy.ball_query_dense(
        jnp.asarray(new_xyz), jnp.asarray(xyz), radius, nsample)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_labelstat_idx():
    rng = np.random.default_rng(1)
    b, n, m, ns, ncls = 2, 32, 8, 5, 4
    stat = rng.integers(0, 3, size=(b, n, ncls)).astype(np.int32)
    idx = rng.integers(0, n, size=(b, m, ns)).astype(np.int32)
    want = np.zeros((b, m, ncls), np.int32)
    for bi in range(b):
        for j in range(m):
            for s in range(ns):
                want[bi, j] += stat[bi, idx[bi, j, s]]
    got = legacy.labelstat_idx(jnp.asarray(stat), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_labelstat_ballrange_counts_all_hits():
    new_xyz, xyz = _clouds(seed=2)
    rng = np.random.default_rng(3)
    ncls = 5
    stat = rng.integers(0, 2, size=xyz.shape[:2] + (ncls,)).astype(np.int32)
    radius = 0.4
    d2 = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, -1)
    mask = d2 < radius * radius
    want = np.einsum("bmn,bnc->bmc", mask.astype(np.int32), stat)
    got = legacy.labelstat_ballrange(
        jnp.asarray(new_xyz), jnp.asarray(xyz), jnp.asarray(stat), radius)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_labelstat_and_ballquery_counts_distinct_hits_only():
    new_xyz, xyz = _clouds(seed=4)
    rng = np.random.default_rng(5)
    ncls, radius, nsample = 3, 0.35, 6
    stat = rng.integers(0, 2, size=xyz.shape[:2] + (ncls,)).astype(np.int32)
    idx_o, cnt_o = _ball_query_oracle(new_xyz, xyz, radius, nsample)
    want = np.zeros(new_xyz.shape[:2] + (ncls,), np.int32)
    for bi in range(idx_o.shape[0]):
        for j in range(idx_o.shape[1]):
            for s in range(cnt_o[bi, j]):
                want[bi, j] += stat[bi, idx_o[bi, j, s]]
    idx, got = legacy.labelstat_and_ballquery(
        jnp.asarray(new_xyz), jnp.asarray(xyz), jnp.asarray(stat),
        radius, nsample)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_feature_distribute_gather_roundtrip():
    new_xyz, xyz = _clouds(seed=6)          # anchors=xyz[b,n,3], pts=new
    didx = legacy.feature_distribute(jnp.asarray(xyz), jnp.asarray(new_xyz))
    d2 = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, -1)
    np.testing.assert_array_equal(np.asarray(didx), d2.argmin(-1))

    rng = np.random.default_rng(7)
    c = 9
    feats = rng.normal(size=(xyz.shape[0], c, xyz.shape[1])).astype(
        np.float32)
    got = legacy.feature_gather(jnp.asarray(feats), didx)
    want = np.take_along_axis(
        feats, np.asarray(didx)[:, None, :].repeat(c, 1), axis=2)
    np.testing.assert_allclose(np.asarray(got), want)


def test_gathering_and_grouping_dense():
    rng = np.random.default_rng(8)
    b, c, n, m, ns = 2, 6, 24, 10, 4
    feats = rng.normal(size=(b, c, n)).astype(np.float32)
    gi = rng.integers(0, n, size=(b, m)).astype(np.int32)
    got = legacy.gathering(jnp.asarray(feats), jnp.asarray(gi))
    want = np.stack([feats[bi][:, gi[bi]] for bi in range(b)])
    np.testing.assert_allclose(np.asarray(got), want)

    idx = rng.integers(0, n, size=(b, m, ns)).astype(np.int32)
    got2 = legacy.grouping_dense(jnp.asarray(feats), jnp.asarray(idx))
    want2 = np.zeros((b, c, m, ns), np.float32)
    for bi in range(b):
        for j in range(m):
            for s in range(ns):
                want2[bi, :, j, s] = feats[bi, :, idx[bi, j, s]]
    np.testing.assert_allclose(np.asarray(got2), want2)

    # grouping_int parity: integer features stay integer (int64 in the
    # CUDA ext; int32 here — jax x64 is off, int32 is TPU-native)
    ints = rng.integers(0, 100, size=(b, c, n)).astype(np.int64)
    got3 = legacy.grouping_dense(jnp.asarray(ints), jnp.asarray(idx))
    assert np.issubdtype(np.asarray(got3).dtype, np.integer)
    want3 = np.zeros((b, c, m, ns), np.int64)
    for bi in range(b):
        for j in range(m):
            for s in range(ns):
                want3[bi, :, j, s] = ints[bi, :, idx[bi, j, s]]
    np.testing.assert_array_equal(np.asarray(got3), want3)


def test_knn_dense_nearest_first():
    new_xyz, xyz = _clouds(seed=9)
    k = 5
    idx, d2 = legacy.knn_dense(jnp.asarray(new_xyz), jnp.asarray(xyz), k)
    full = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, -1)
    want_idx = np.argsort(full, -1)[:, :, :k]
    want_d2 = np.take_along_axis(full, want_idx, -1)
    np.testing.assert_allclose(np.asarray(d2), want_d2, rtol=1e-5,
                               atol=1e-6)
    # indices may tie; compare distances only where they differ
    same = np.asarray(idx) == want_idx
    np.testing.assert_allclose(
        np.asarray(d2)[~same],
        np.take_along_axis(full, np.asarray(idx), -1)[~same], rtol=1e-5)


def test_divide2patch(rng):
    """FPS-anchored kNN patches (reference ``functions/pointops.py:678-693``)."""
    from stratified_transformer_tpu.ops.legacy import divide2patch

    n = 64
    xyz = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    offsets = jnp.asarray([32, 64], np.int32)
    p_idx, p_mask = divide2patch(8, xyz, offsets, n_pad=16)
    assert p_idx.shape == (16, 8)
    # anchors per scene = 32 // 8 = 4 -> 8 valid rows
    assert int(p_mask.any(-1).sum()) == 8
    # each patch's points come from one scene
    scene = (np.asarray(p_idx) >= 32).astype(int)
    valid_rows = np.asarray(p_mask.any(-1))
    same = (scene == scene[:, :1]).all(-1)
    assert same[valid_rows].all()
