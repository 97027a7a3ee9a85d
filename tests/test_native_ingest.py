"""Parity tests for the C++ host-ingest library vs the numpy reference."""

import numpy as np
import pytest

from stratified_transformer_tpu.data import native
import stratified_transformer_tpu.data.voxelize as vx

needs_native = pytest.mark.skipif(
    not native.available(), reason="C++ toolchain unavailable")


@needs_native
def test_voxel_hash_matches_numpy_fnv(rng):
    coord = rng.uniform(0, 4, (5000, 3)).astype(np.float32)
    keys_np = vx.fnv_hash_vec(np.floor(coord / 0.04).astype(np.int64))
    keys_cc = np.empty(5000, np.uint64)
    native._load().voxel_hash(
        np.ascontiguousarray(coord), 5000, 0.04, keys_cc)
    assert (keys_np == keys_cc).all()


@needs_native
def test_voxel_select_counts(rng):
    coord = rng.uniform(0, 4, (5000, 3)).astype(np.float32)
    idx = native.voxelize(coord, 0.04, mode=0, seed=1)
    idx_np = vx.voxelize(coord, 0.04, mode=0)
    assert len(idx) == len(idx_np)  # one pick per voxel
    s, c = native.voxelize(coord, 0.04, mode=1)
    s2, c2 = vx.voxelize(coord, 0.04, mode=1)
    assert np.array_equal(np.sort(c), np.sort(np.asarray(c2)))
    assert c.sum() == 5000


@needs_native
def test_grid_subsample_barycenters(rng):
    coord = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    feats = rng.normal(size=(2000, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 2000).astype(np.int32)
    p, f, l = native.grid_subsample(coord, feats, labels, 0.25)
    # brute-force check of one cell
    mins = coord.min(0)
    keys = np.floor((coord - mins) / 0.25).astype(np.int64)
    cell0 = (keys == keys[0]).all(1)
    expect = coord[cell0].mean(0)
    d = np.abs(p - expect).sum(1)
    assert d.min() < 1e-4
    assert len(p) == len(np.unique(keys, axis=0))


@needs_native
def test_radius_neighbors_matches_bruteforce(rng):
    pts = rng.uniform(0, 1, (400, 3)).astype(np.float32)
    offs = np.array([250, 400], np.int64)
    out = native.radius_neighbors(pts, offs, 0.15, 6)
    start = 0
    for e in offs:
        seg = slice(start, e)
        d2 = ((pts[seg, None] - pts[None, seg]) ** 2).sum(-1)
        for i in range(e - start):
            inside = set((np.where(d2[i] <= 0.15 ** 2)[0] + start).tolist())
            got = set(int(j) for j in out[start + i] if j >= 0)
            if len(inside) <= 6:
                assert got == inside
            else:
                assert got <= inside and len(got) == 6
        start = e


def test_knn_grid_matches_bruteforce(rng):
    from stratified_transformer_tpu.data import native

    q = rng.uniform(0, 1, (120, 3)).astype(np.float32)
    r = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    qo = np.array([70, 120], np.int64)
    ro = np.array([130, 200], np.int64)
    idx, d2 = native.knn(q, qo, r, ro, k=5, with_dist=True)
    # brute-force oracle
    qs = rs = 0
    for s in range(2):
        qe, re = int(qo[s]), int(ro[s])
        dist = ((q[qs:qe, None, :] - r[None, rs:re, :]) ** 2).sum(-1)
        want = np.argsort(dist, axis=1, kind="stable")[:, :5] + rs
        wd = np.sort(dist, axis=1)[:, :5]
        np.testing.assert_allclose(
            np.sort(wd, 1), np.sort(d2[qs:qe], 1), rtol=1e-5)
        # indices may tie-swap; compare via distances per slot
        got_d = ((q[qs:qe, None, :] - r[idx[qs:qe]]) ** 2).sum(-1)
        np.testing.assert_allclose(got_d, d2[qs:qe], rtol=1e-5, atol=1e-7)
        assert (idx[qs:qe] >= rs).all() and (idx[qs:qe] < re).all()
        qs, rs = qe, re


def test_knn_grid_ring_cap_fallback(rng):
    """Clustered scene + tiny explicit cell: the 64-ring cap is hit before
    exactness is proven; the brute-force fallback must keep results exact
    (cpp/ingest.cpp knn_grid)."""
    from stratified_transformer_tpu.data import native

    a = rng.uniform(0, 0.5, (40, 3)).astype(np.float32)
    b = rng.uniform(0, 0.5, (40, 3)).astype(np.float32) + 500.0
    r = np.concatenate([a, b]).astype(np.float32)
    q = a[:5].copy()
    qo = np.array([5], np.int64)
    ro = np.array([80], np.int64)
    # cell=0.1 -> the far cluster sits ~5000 rings away, far past the cap
    idx, d2 = native.knn(q, qo, r, ro, k=50, cell=0.1, with_dist=True)
    dist = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    want_d = np.sort(dist, axis=1)[:, :50]
    assert (idx >= 0).all()
    np.testing.assert_allclose(np.sort(d2, 1), want_d, rtol=1e-5)


def test_knn_padded_rows_deterministic(rng):
    """Rows past query_offsets[-1] must be -1 / 1e10, not uninitialized."""
    from stratified_transformer_tpu.data import native

    q = np.zeros((10, 3), np.float32)
    r = rng.uniform(0, 1, (20, 3)).astype(np.float32)
    qo = np.array([4], np.int64)  # 6 padded query rows
    ro = np.array([20], np.int64)
    idx, d2 = native.knn(q, qo, r, ro, k=3, with_dist=True)
    assert (idx[4:] == -1).all()
    assert (d2[4:] == 1e10).all()
