"""Host geometry pyramid vs device ops (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from stratified_transformer_tpu.data import pyramid as PY
from stratified_transformer_tpu.ops import sampling as S


def test_host_grid_pool_matches_device(rng):
    n = 600
    xyz = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    offsets = np.array([380, 560], np.int64)   # 40 padding points
    new_off = PY.floor_ratio_counts(offsets, 0.25)
    out_pad = 192
    h_idx, h_valid = PY.host_grid_pool(xyz, offsets, new_off, out_pad, 0.3)
    d_idx, d_valid = S.grid_pool_sampling(
        jnp.asarray(xyz), jnp.asarray(offsets, jnp.int32),
        jnp.asarray(new_off, jnp.int32), out_pad, 0.3)
    np.testing.assert_array_equal(np.asarray(d_valid), h_valid)
    np.testing.assert_array_equal(
        np.asarray(d_idx)[h_valid], h_idx[h_valid])


def test_build_geometry_pyramid_shapes():
    from stratified_transformer_tpu.models.stratified import StratifiedConfig
    from __graft_entry__ import _example_batch

    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, channels=(8, 16), depths=(1, 1),
        num_heads=(2, 4), num_layers=2, n_pad=512, num_scenes=2,
        band=32, tile=32, sparse_cap=16, sampler="grid")
    b = _example_batch(cfg.n_pad, cfg.num_scenes, 6)
    pyr = PY.build_geometry_pyramid(b.xyz, b.offsets, cfg)
    assert len(pyr["down"]) == 1          # one TransitionDown (2 stages)
    d0 = pyr["down"][0]
    out_pad = ((int(cfg.n_pad * cfg.ratio) + cfg.num_scenes + cfg.tile - 1)
               // cfg.tile * cfg.tile)
    assert d0["idx"].shape == (out_pad,)
    assert d0["knn_idx"].shape == (out_pad, cfg.k)
    assert len(pyr["up"]) == 1
    assert pyr["up"][0]["idx"].shape == (cfg.n_pad, cfg.up_k)
    assert len(pyr["stage_down"]) == 2
    assert pyr["stage_down"][0]["is_down"].shape == (cfg.n_pad,)
    assert pyr["stage_down"][1]["is_down"].shape == (out_pad,)
    # kNN indices live inside the level and validity is consistent
    total0 = int(b.offsets[-1])
    assert (d0["knn_idx"][d0["valid"]] < total0).all()
    assert d0["valid"].sum() == int(d0["offsets"][-1])


def test_model_with_host_pyramid_matches_device_path():
    """Full model: host-pyramid path == on-device geometry path (host
    sampler replicates the device sampler; kNN/3NN are exact on both
    sides; random coords avoid boundary/distance ties)."""
    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from __graft_entry__ import _example_batch

    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, channels=(8, 16), depths=(1, 1),
        num_heads=(2, 4), num_layers=2, n_pad=512, num_scenes=2,
        band=32, tile=32, sparse_cap=16, sampler="grid")
    b = _example_batch(cfg.n_pad, cfg.num_scenes, 6, seed=11)
    pyr = PY.build_geometry_pyramid(b.xyz, b.offsets, cfg)
    model = Stratified(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "droppath": rng},
                           b.feats, b.xyz, b.offsets, training=False)
    dev, _ = model.apply(variables, b.feats, b.xyz, b.offsets,
                         training=False)
    host, _ = model.apply(variables, b.feats, b.xyz, b.offsets,
                          training=False, pyramid=pyr)
    # the device path's cell-list kNN can miss a marginal neighbor the
    # exact host kNN finds (ring-bounded search) — tiny weight deltas on
    # a handful of points; compare with an absolute tolerance
    np.testing.assert_allclose(np.asarray(host), np.asarray(dev),
                               rtol=0, atol=1e-3)
