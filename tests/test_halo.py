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


def _real_model_setup(rng, n_scene=10000):
    """Full Stratified model + a corridor scene engineered so NO capacity
    or quota cap binds anywhere (block-vs-full forward can then be exact):

      * ``down_quota="cells"`` — downsample selection depends only on
        local geometry + the global anchor (a per-scene ``floor(n/4)+1``
        quota would drop different cells in a block than in the full
        scene: the round-2 diffuse-mismatch root cause).
      * densities chosen so occupied cells < every static capacity and
        kNN kth-distances stay below the grid_knn ring bound (so kNN
        results are geometry-exact, not cell-origin-dependent).
      * the scene is long (32 m) relative to the receptive halo so each
        block + halo fits its n_pad with zero truncation.
    """
    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)

    # corridor: floor 32 x 1.5 + two walls 32 x 0.3 (uniform 2D densities:
    # floor ~156/m^2, walls ~130/m^2)
    nf, nw = (3 * n_scene) // 4, n_scene // 8
    f = rng.uniform(0, 1, (nf, 3)) * [32.0, 1.5, 0.02]
    w1 = rng.uniform(0, 1, (nw, 3)) * [32.0, 0.02, 0.3]
    w2 = rng.uniform(0, 1, (nw, 3)) * [32.0, 0.02, 0.3] + [0, 1.48, 0]
    coord = np.concatenate([f, w1, w2]).astype(np.float32)
    feat = rng.normal(size=(len(coord), 3)).astype(np.float32)

    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, n_pad=0, num_scenes=1,
        depths=(1, 1), channels=(16, 32), num_heads=(2, 4), num_layers=2,
        grid_size=0.1, window_size=2.5, patch_size=1, quant_size=0.025,
        downsample_scale=4, band=128, tile=128, sparse_cap=64,
        sampler="grid", down_quota="cells", neighbor_method="grid",
        stem_transformer=True, drop_path_rate=0.0)
    return cfg, coord, feat


def _apply_full(cfg, coord, feat, n_pad):
    import dataclasses
    import jax.numpy as jnp
    from stratified_transformer_tpu.models.stratified import Stratified

    mcfg = dataclasses.replace(cfg, n_pad=n_pad, num_scenes=1)
    model = Stratified(mcfg)
    n = len(coord)
    xyz = np.zeros((n_pad, 3), np.float32)
    xyz[:n] = coord - coord.min(0)
    feats = np.zeros((n_pad, 6), np.float32)
    feats[:n] = np.concatenate([feat, xyz[:n]], 1)
    offsets = np.array([n], np.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, xyz, offsets)

    def predict(feats_, xyz_, off_):
        logits, _ = model.apply(variables, feats_, xyz_, off_,
                                training=False,
                                anchor=jnp.zeros((3,), jnp.float32))
        return jax.nn.softmax(logits, -1)

    return model, variables, jax.jit(predict)(feats, xyz, offsets)[:n]


def test_sharded_real_model_matches_full_forward(rng):
    """VERDICT #3: the REAL Stratified net, sharded across 4 blocks with the
    derived receptive halo, reproduces the whole-scene forward on every core
    point; a halo/4 control diverges (the test bites)."""
    import dataclasses
    import jax.numpy as jnp
    from stratified_transformer_tpu.models.stratified import Stratified

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, coord, feat = _real_model_setup(rng)
    n = len(coord)
    n_pad_full = ((n + 127) // 128) * 128
    model, variables, full_probs = _apply_full(cfg, coord, feat, n_pad_full)

    mesh = make_mesh(4)
    block_pad = ((n // 2 + 127) // 128) * 128  # blocks + halo fit in half
    mcfg_b = dataclasses.replace(cfg, n_pad=block_pad, num_scenes=1)
    model_b = Stratified(mcfg_b)

    @jax.jit
    def predict_blocks(feats_b, xyz_b, offsets_b):
        def one(feats_, xyz_, off_):
            logits, _ = model_b.apply(
                variables, feats_, xyz_, off_.astype(jnp.int32),
                training=False, anchor=jnp.zeros((3,), jnp.float32))
            return jax.nn.softmax(logits, -1)
        return jax.vmap(one)(feats_b, xyz_b, offsets_b)

    hw = halo.receptive_halo(cfg)
    stats = {}
    probs = halo.sharded_scene_probs(
        predict_blocks, coord, feat, cfg.num_classes, mesh=mesh,
        n_pad=block_pad, concat_xyz=True, halo=hw, stats=stats)
    # exactness precondition: every block's core + full halo fit its pad
    assert stats["truncated_halo_points"] == 0, stats
    # EXACT up to fp32 reassociation (different pad shapes reorder
    # reductions): a few ulps on softmax probs, measured 1.2e-7
    err_exact = np.abs(probs - np.asarray(full_probs)).max()
    assert err_exact <= 5e-7, f"sharded != full (max err {err_exact})"

    # control: a sub-window halo (smaller than the stage-0 window, so
    # same-window dense neighbors are cut at block edges) must diverge by
    # orders of magnitude more. Absolute divergence is tiny with random
    # init — the class head compresses distant influence — so the control
    # is RELATIVE to the exact run's float noise.
    probs_bad = halo.sharded_scene_probs(
        predict_blocks, coord, feat, cfg.num_classes, mesh=mesh,
        n_pad=block_pad, concat_xyz=True, halo=0.05)
    err = np.abs(probs_bad - np.asarray(full_probs)).max()
    assert err > 100 * max(err_exact, 1e-9) and err > 1e-5, \
        f"sub-window-halo control unexpectedly exact (max err {err})"


def test_collective_halo_exchange_matches_full_forward(rng):
    """ON-DEVICE halo exchange (ppermute inside shard_map): the real
    Stratified net sharded across 4 core slabs — with boundary points
    moved between devices over collectives, NOT host-replicated — must
    reproduce the whole-scene forward on every point, and must match the
    host-replication path bit-for-bit where both are exact."""
    import dataclasses
    import jax.numpy as jnp
    from stratified_transformer_tpu.models.stratified import Stratified

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg, coord, feat = _real_model_setup(rng)
    n = len(coord)
    n_pad_full = ((n + 127) // 128) * 128
    model, variables, full_probs = _apply_full(cfg, coord, feat, n_pad_full)

    mesh = make_mesh(4)
    core_pad = ((n // 4 + 255) // 128) * 128
    halo_cap = ((n // 8 + 127) // 128) * 128
    b_pad = core_pad + 2 * halo_cap
    mcfg_b = dataclasses.replace(cfg, n_pad=b_pad, num_scenes=1)
    model_b = Stratified(mcfg_b)

    def apply_probs(feats_, xyz_, off_):
        logits, _ = model_b.apply(
            variables, feats_, xyz_, off_.astype(jnp.int32),
            training=False, anchor=jnp.zeros((3,), jnp.float32))
        return jax.nn.softmax(logits, -1)

    hw = halo.receptive_halo(cfg)
    stats = {}
    probs = halo.sharded_scene_probs_collective(
        apply_probs, coord, feat, cfg.num_classes, mesh=mesh,
        core_pad=core_pad, halo_cap=halo_cap, concat_xyz=True,
        halo=hw, stats=stats)
    assert stats["halo_cap_dropped"] == 0, stats
    err = np.abs(probs - np.asarray(full_probs)).max()
    assert err <= 5e-7, f"collective sharded != full (max err {err})"

    # sub-window halo control: the exchange path must also BITE
    probs_bad = halo.sharded_scene_probs_collective(
        apply_probs, coord, feat, cfg.num_classes, mesh=mesh,
        core_pad=core_pad, halo_cap=halo_cap, concat_xyz=True, halo=0.05)
    err_bad = np.abs(probs_bad - np.asarray(full_probs)).max()
    assert err_bad > 100 * max(err, 1e-9) and err_bad > 1e-5, (
        f"sub-window-halo control unexpectedly exact (max err {err_bad})")

    # halo WIDER than a slab (the production receptive-field regime):
    # the general all_gather exchange engages and stays exact given
    # enough halo capacity (~2 slabs' worth of band points here)
    wide = float(np.diff(np.quantile(
        coord[:, 0], np.linspace(0, 1, 5)))[1:-1].min()) * 1.2
    halo_cap_ag = ((int(0.45 * n) + 127) // 128) * 128
    mcfg_ag = dataclasses.replace(
        cfg, n_pad=core_pad + 2 * halo_cap_ag, num_scenes=1)
    model_ag = Stratified(mcfg_ag)

    def apply_probs_ag(feats_, xyz_, off_):
        logits, _ = model_ag.apply(
            variables, feats_, xyz_, off_.astype(jnp.int32),
            training=False, anchor=jnp.zeros((3,), jnp.float32))
        return jax.nn.softmax(logits, -1)

    stats_ag = {}
    probs_ag = halo.sharded_scene_probs_collective(
        apply_probs_ag, coord, feat, cfg.num_classes, mesh=mesh,
        core_pad=core_pad, halo_cap=halo_cap_ag, concat_xyz=True,
        halo=max(wide, hw), stats=stats_ag)
    assert stats_ag.get("collective_allgather_scenes", 0) == 1, stats_ag
    assert stats_ag["halo_cap_dropped"] == 0, stats_ag
    err_ag = np.abs(probs_ag - np.asarray(full_probs)).max()
    assert err_ag <= 5e-7, (
        f"allgather sharded != full (max err {err_ag})")

    # a huge halo overflows the cap: counted, never silent (each device
    # sees ~3n/4 candidates vs 2*halo_cap slots)
    stats_huge = {}
    halo.sharded_scene_probs_collective(
        apply_probs, coord, feat, cfg.num_classes, mesh=mesh,
        core_pad=core_pad, halo_cap=halo_cap, halo=1e9, stats=stats_huge)
    assert stats_huge["halo_cap_dropped"] > 0

    # core slab overflow raises ValueError (caller falls back)
    with pytest.raises(ValueError):
        halo.sharded_scene_probs_collective(
            apply_probs, coord, feat, cfg.num_classes, mesh=mesh,
            core_pad=32, halo_cap=halo_cap, halo=hw)
