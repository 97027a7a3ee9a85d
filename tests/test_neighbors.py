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
