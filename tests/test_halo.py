"""Halo-partition correctness: sharded scene forward == single forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratified_transformer_tpu.parallel import halo
from stratified_transformer_tpu.parallel.mesh import make_mesh


def test_partition_covers_each_point_exactly_once(rng):
    coord = rng.uniform(0, 8, (2000, 3)).astype(np.float32)
    blocks = halo.partition_scene(coord, 4, halo=0.5)
    core_count = np.zeros(2000, int)
    for blk in blocks:
        core_count[blk["idx"][blk["core"]]] += 1
    assert (core_count == 1).all()
    # halo replication: points near slab boundaries appear in 2 blocks
    seen = np.zeros(2000, int)
    for blk in blocks:
        seen[blk["idx"]] += 1
    assert seen.max() >= 2


def test_sharded_probs_match_full_forward(rng):
    """A window-local 'model' evaluated per block with sufficient halo must
    reproduce the full-scene result on every point."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh = make_mesh(4)
    n = 1024
    coord = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    coord[:, 2] *= 0.2
    feat = rng.normal(size=(n, 3)).astype(np.float32)
    ws = 0.4

    def local_probs_np(c, f, m):
        """per-point mean of features within its window cell of size ws,
        anchored at the local min — a stand-in with receptive field <= ws."""
        # anchor at GLOBAL pattern: use absolute cells to be translation-safe
        cells = np.floor(c / ws).astype(np.int64)
        out = np.zeros((len(c), 3))
        key = [tuple(r) for r in cells]
        groups = {}
        for i, kk in enumerate(key):
            if m[i]:
                groups.setdefault(kk, []).append(i)
        for kk, idxs in groups.items():
            out[idxs] = f[idxs].mean(0)
        return out

    # device fn: same computation in jnp over padded blocks
    def predict(feats_b, xyz_b, offsets_b):
        def one(feats, xyz, off):
            m = jnp.arange(xyz.shape[0]) < off[0]
            cells = jnp.floor(xyz / ws).astype(jnp.int32)
            keyv = (cells[:, 0] + 10000) * 100000 + (
                cells[:, 1] + 10000) * 100 + cells[:, 2]
            keyv = jnp.where(m, keyv, jnp.iinfo(jnp.int32).max)
            # segment mean via sort-free one-hot avoided; brute force n^2
            same = (keyv[:, None] == keyv[None, :]) & m[None, :] & m[:, None]
            cnt = jnp.maximum(same.sum(-1, keepdims=True), 1)
            return (same.astype(jnp.float32) @ feats[:, :3]) / cnt
        return jax.vmap(one)(feats_b, xyz_b, offsets_b)

    # Blocks are anchored at the GLOBAL scene min inside
    # sharded_scene_probs, so every block shares one window grid; with a
    # halo wider than the window, every core point's full window is present
    # in its block and results must match the whole-scene forward exactly.
    coord0 = coord - coord.min(0)
    full = local_probs_np(coord0, feat, np.ones(n, bool))
    probs = halo.sharded_scene_probs(
        jax.jit(predict), coord, feat, 3, mesh=mesh, n_pad=1024,
        concat_xyz=False, halo=2 * ws)
    np.testing.assert_allclose(probs, full, rtol=1e-4, atol=1e-5)
