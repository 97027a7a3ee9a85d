"""Tests for knn / radius query / interpolation."""

import numpy as np
import jax.numpy as jnp

from stratified_transformer_tpu.ops import neighbors
from reference_impl import np_knn, np_interpolation


def _scene(rng, m, n, batches=2):
    qxyz = rng.uniform(0, 2, (m, 3)).astype(np.float32)
    rxyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    qb = rng.integers(0, batches, m).astype(np.int32)
    rb = rng.integers(0, batches, n).astype(np.int32)
    return qxyz, qb, rxyz, rb


def test_knn_matches_bruteforce(rng):
    qxyz, qb, rxyz, rb = _scene(rng, 37, 83)
    k = 5
    idx, d2, mask = neighbors.knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(83, bool), k, chunk=16,
    )
    eidx, ed2 = np_knn(qxyz, qb, rxyz, rb, k)
    np.testing.assert_allclose(
        np.sort(np.asarray(d2), -1), np.sort(ed2, -1), rtol=1e-4, atol=1e-5
    )
    # same neighbor sets (ties aside — random floats don't tie)
    for i in range(37):
        assert set(np.asarray(idx)[i].tolist()) == set(eidx[i].tolist())
    assert np.asarray(mask).all()


def test_knn_small_scene_padding(rng):
    # a scene with fewer refs than k
    qxyz = np.zeros((2, 3), np.float32)
    qb = np.array([0, 1], np.int32)
    rxyz = rng.uniform(0, 1, (6, 3)).astype(np.float32)
    rb = np.array([0, 0, 0, 1, 1, 1], np.int32)
    valid = np.array([True, True, False, True, False, False])
    idx, d2, mask = neighbors.knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.asarray(valid), 4, chunk=8,
    )
    mask = np.asarray(mask)
    idx = np.asarray(idx)
    assert mask[0].sum() == 2 and mask[1].sum() == 1
    # padded slots repeat a real same-scene neighbor
    assert set(idx[0].tolist()) <= {0, 1}
    assert set(idx[1].tolist()) == {3}


def test_radius_neighbors(rng):
    qxyz, qb, rxyz, rb = _scene(rng, 25, 60, batches=1)
    r = 0.5
    idx, mask = neighbors.radius_neighbors(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(60, bool), r, 8, chunk=8,
    )
    idx, mask = np.asarray(idx), np.asarray(mask)
    for i in range(25):
        d2 = ((rxyz - qxyz[i]) ** 2).sum(-1)
        inside = set(np.where(d2 <= r * r)[0].tolist())
        got = set(idx[i][mask[i]].tolist())
        if len(inside) <= 8:
            assert got == inside
        else:
            assert got <= inside and len(got) == 8


def test_three_nn_interpolate(rng):
    qxyz, qb, sxyz, sb = _scene(rng, 40, 30)
    feats = rng.normal(size=(30, 7)).astype(np.float32)
    out = neighbors.three_nn_interpolate(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(sxyz),
        jnp.asarray(sb), jnp.ones(30, bool), jnp.asarray(feats), chunk=16,
    )
    expect = np_interpolation(qxyz, qb, sxyz, sb, feats)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_grid_knn_matches_bruteforce(rng):
    """Cell-list kNN == exact kNN when coverage >= kth-NN distance."""
    qxyz, qb, rxyz, rb = _scene(rng, 200, 400)
    k = 5
    bidx, bd2, bmask = neighbors.knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(400, bool), k, chunk=64,
    )
    gidx, gd2, gmask = neighbors.grid_knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(400, bool), k, cell=2.0, cap=400,
    )
    np.testing.assert_array_equal(np.asarray(bmask), np.asarray(gmask))
    np.testing.assert_allclose(
        np.asarray(bd2), np.asarray(gd2), rtol=1e-4, atol=1e-5)
    for i in range(200):
        assert (set(np.asarray(gidx)[i].tolist())
                == set(np.asarray(bidx)[i].tolist()))


def test_grid_knn_chunked_and_query_valid(rng):
    qxyz, qb, rxyz, rb = _scene(rng, 100, 300)
    qvalid = np.arange(100) < 77
    a = neighbors.grid_knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(300, bool), 4, cell=2.0, cap=300,
        query_valid=jnp.asarray(qvalid))
    b = neighbors.grid_knn(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(300, bool), 4, cell=2.0, cap=300,
        query_valid=jnp.asarray(qvalid), chunk=32)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # chunked/unchunked pipelines may round the last ulp differently
    np.testing.assert_allclose(
        np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    assert not np.asarray(a[2])[77:].any()


def test_grid_radius_matches_bruteforce(rng):
    """Ball-query mode: exact when cap >= cell occupancy."""
    qxyz, qb, rxyz, rb = _scene(rng, 150, 500, batches=2)
    r = 0.3
    bi, bm = neighbors.radius_neighbors(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(500, bool), r, 8, chunk=64)
    gi, gm = neighbors.radius_neighbors(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(rxyz),
        jnp.asarray(rb), jnp.ones(500, bool), r, 8, method="grid", cap=500)
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(gm))
    bi, gi, m = np.asarray(bi), np.asarray(gi), np.asarray(bm)
    for i in range(150):
        assert set(gi[i][m[i]].tolist()) == set(bi[i][m[i]].tolist())


def test_three_nn_interpolate_grid(rng):
    qxyz, qb, sxyz, sb = _scene(rng, 40, 30)
    feats = rng.normal(size=(30, 7)).astype(np.float32)
    out = neighbors.three_nn_interpolate(
        jnp.asarray(qxyz), jnp.asarray(qb), jnp.asarray(sxyz),
        jnp.asarray(sb), jnp.ones(30, bool), jnp.asarray(feats),
        method="grid", cell=3.0, cap=30,
    )
    expect = np_interpolation(qxyz, qb, sxyz, sb, feats)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)


def test_subtraction_matches_reference_semantics(rng):
    """pointops.subtraction oracle: out[i,j] = in1[i] - in2[idx[i,j]]."""
    in1 = rng.normal(size=(10, 4)).astype(np.float32)
    in2 = rng.normal(size=(10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, (10, 3)).astype(np.int32)
    out = np.asarray(neighbors.subtraction(
        jnp.asarray(in1), jnp.asarray(in2), jnp.asarray(idx)))
    expect = in1[:, None, :] - in2[idx]
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_aggregation_matches_reference_semantics(rng):
    """pointops.aggregation oracle (aggregation_cuda_kernel.cu:5-20):
    out[n,c] = sum_j (in[idx[n,j],c] + pos[n,j,c]) * w[n,j,c % w_c]."""
    n, k, c, w_c = 8, 4, 6, 3
    feats = rng.normal(size=(n, c)).astype(np.float32)
    pos = rng.normal(size=(n, k, c)).astype(np.float32)
    w = rng.normal(size=(n, k, w_c)).astype(np.float32)
    idx = rng.integers(0, n, (n, k)).astype(np.int32)
    out = np.asarray(neighbors.aggregation(
        jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(w),
        jnp.asarray(idx)))
    expect = np.zeros((n, c), np.float32)
    for i in range(n):
        for j in range(k):
            for cc in range(c):
                expect[i, cc] += (feats[idx[i, j], cc] + pos[i, j, cc]) \
                    * w[i, j, cc % w_c]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
