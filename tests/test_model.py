"""Model-level smoke + training tests on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratified_transformer_tpu.data.collate import collate_scenes
from stratified_transformer_tpu.data.datasets import SyntheticRooms
from stratified_transformer_tpu.data.prepare import with_xyz_concat
from stratified_transformer_tpu.models.stratified import (
    Stratified, StratifiedConfig)
from stratified_transformer_tpu.train.schedulers import multi_step
from stratified_transformer_tpu.train.state import create_train_state
from stratified_transformer_tpu.train.step import make_eval_step, make_train_step

TINY = StratifiedConfig(
    num_classes=5, in_channels=6, channels=(8, 16), depths=(1, 1),
    num_heads=(2, 4), num_layers=2, n_pad=512, num_scenes=2,
    band=32, tile=32, sparse_cap=16, sampler="grid",
    drop_path_rate=0.1,
)


def make_batch(cfg, seed=0, with_shift=False):
    ds = SyntheticRooms(
        num_scenes=cfg.num_scenes, points=220, extent=2.0,
        num_classes=cfg.num_classes, voxel_size=0.04,
        voxel_max=cfg.n_pad // cfg.num_scenes, with_shift=with_shift,
        seed=seed)
    scenes = [with_xyz_concat(ds[i]) for i in range(cfg.num_scenes)]
    b = collate_scenes(scenes, cfg.n_pad, cfg.num_scenes, ignore_label=255)
    out = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
           "labels": b.labels}
    if with_shift:
        out["target_shift"] = b.target_shift
    return out


def test_forward_shapes_and_masking():
    cfg = TINY
    model = Stratified(cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "droppath": rng},
        batch["feats"], batch["xyz"], batch["offsets"], training=False)
    logits, shift = model.apply(
        variables, batch["feats"], batch["xyz"], batch["offsets"],
        training=False)
    assert logits.shape == (cfg.n_pad, cfg.num_classes)
    assert shift is None
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_loss_decreases():
    cfg = TINY
    model = Stratified(cfg)
    batch = make_batch(cfg)
    schedule = multi_step(0.01, [100], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    step = jax.jit(make_train_step(ignore_label=255, num_classes=cfg.num_classes))
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(8):
        state, stats = step(state, batch, rng)
        if first is None:
            first = float(stats["loss"])
    last = float(stats["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_regressor_head_and_offset_loss():
    cfg = StratifiedConfig(**{**TINY.__dict__, "with_regressor": True})
    model = Stratified(cfg)
    batch = make_batch(cfg, with_shift=True)
    schedule = multi_step(0.01, [100], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    step = jax.jit(make_train_step(
        ignore_label=255, num_classes=cfg.num_classes, offset_weight=1.0))
    state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert float(stats["loss_offset"]) > 0.0


def test_eval_step_counts():
    cfg = TINY
    model = Stratified(cfg)
    batch = make_batch(cfg)
    schedule = multi_step(0.01, [100], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    ev = jax.jit(make_eval_step(ignore_label=255, num_classes=cfg.num_classes))
    logits, shift, stats = ev(state, batch)
    n_valid = int(batch["offsets"][-1])
    assert int(stats["target"].sum()) <= n_valid
    assert (np.asarray(stats["intersection"]) <= np.asarray(stats["union"]) + 1e-6).all()


def test_blocks_lr_scale_applied():
    from stratified_transformer_tpu.train.state import lr_scale_by_path
    cfg = TINY
    model = Stratified(cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "droppath": rng},
        batch["feats"], batch["xyz"], batch["offsets"], training=False)
    scales = lr_scale_by_path(variables["params"], "blocks", 0.1)
    leaves = jax.tree_util.tree_leaves_with_path(scales)
    block_leaves = [v for p, v in leaves if "blocks" in str(p)]
    other_leaves = [v for p, v in leaves if "blocks" not in str(p)]
    assert block_leaves and all(v == 0.1 for v in block_leaves)
    assert other_leaves and all(v == 1.0 for v in other_leaves)


def test_scannet_style_stem_variant():
    """stem_transformer=False path: KPConvRes stem + TransitionDown before
    stage 0 (reference scannetv2 config, 5-stage family)."""
    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, channels=(8, 16, 16), depths=(1, 1, 1),
        num_heads=(2, 4, 4), num_layers=3, n_pad=512, num_scenes=2,
        band=32, tile=32, sparse_cap=16, sampler="grid",
        stem_transformer=False, downsample_scale=4,
    )
    model = Stratified(cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "droppath": rng},
        batch["feats"], batch["xyz"], batch["offsets"], training=False)
    logits, _ = model.apply(
        variables, batch["feats"], batch["xyz"], batch["offsets"],
        training=False)
    assert logits.shape == (cfg.n_pad, cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
    # stem params present
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {str(p) for p, _ in flat}
    assert any("stem_1" in n for n in names)
    assert any("stem_down" in n for n in names)


def test_swin3d_variant_no_sparse_keys():
    from stratified_transformer_tpu.models.swin3d import Swin3D
    model = Swin3D(TINY)
    assert model.cfg.use_stratified is False
    batch = make_batch(TINY)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "droppath": rng},
        batch["feats"], batch["xyz"], batch["offsets"], training=False)
    logits, _ = model.apply(
        variables, batch["feats"], batch["xyz"], batch["offsets"],
        training=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_fused_attn_impl_model_forward():
    """Model with attn_impl='fused' (Pallas interpret on CPU) matches the
    reference impl."""
    import dataclasses
    cfg_ref = StratifiedConfig(**{**TINY.__dict__, "drop_path_rate": 0.0})
    cfg_fused = dataclasses.replace(
        cfg_ref, attn_impl="fused", pallas_interpret=True, w_chunk=32)
    batch = make_batch(cfg_ref)
    rng = jax.random.PRNGKey(0)
    model_ref = Stratified(cfg_ref)
    model_fused = Stratified(cfg_fused)
    variables = model_ref.init(
        {"params": rng, "droppath": rng},
        batch["feats"], batch["xyz"], batch["offsets"], training=False)
    lr, _ = model_ref.apply(
        variables, batch["feats"], batch["xyz"], batch["offsets"],
        training=False)
    lf, _ = model_fused.apply(
        variables, batch["feats"], batch["xyz"], batch["offsets"],
        training=False)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lr), rtol=2e-3, atol=2e-4)


def test_host_stem_neighbors_match_device():
    """Host (C++/numpy) stem ball-query path == on-device path.

    With k large enough to hold every ball member, both paths see the same
    neighbor SET (order differs; KPConv sums over neighbors, so the output
    is order-invariant). Mirrors the reference's CPU ball_query semantics
    (train.py:324-329)."""
    from stratified_transformer_tpu.data.collate import (
        collate_scenes, with_stem_neighbors)

    cfg = TINY
    ds = SyntheticRooms(
        num_scenes=cfg.num_scenes, points=220, extent=2.0,
        num_classes=cfg.num_classes, voxel_size=0.04,
        voxel_max=cfg.n_pad // cfg.num_scenes, seed=3)
    scenes = [with_xyz_concat(ds[i]) for i in range(cfg.num_scenes)]
    b = collate_scenes(scenes, cfg.n_pad, cfg.num_scenes, ignore_label=255)
    radius = 2.5 * cfg.grid_size * cfg.sigma
    k = 64  # voxelized at 0.04, ball of r=0.1 holds << 64 points
    bh = with_stem_neighbors(b, radius=radius, k=k)
    assert not bool(bh.stem_nmask[:, -1].any()), "k must cover every ball"

    cfg_k = StratifiedConfig(**{
        **{f.name: getattr(cfg, f.name)
           for f in __import__("dataclasses").fields(cfg)},
        "max_num_neighbors": k})
    model = Stratified(cfg_k)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "droppath": rng}, b.feats, b.xyz, b.offsets,
        training=False)
    dev_logits, _ = model.apply(
        variables, b.feats, b.xyz, b.offsets, training=False)
    host_logits, _ = model.apply(
        variables, b.feats, b.xyz, b.offsets, training=False,
        stem_nidx=bh.stem_nidx, stem_nmask=bh.stem_nmask)
    np.testing.assert_allclose(
        np.asarray(host_logits), np.asarray(dev_logits),
        rtol=2e-4, atol=2e-4)


def test_split_train_step_matches_fused_state_update():
    """make_split_train_step == make_train_step (same grads/loss/update)."""
    from stratified_transformer_tpu.train.step import make_split_train_step

    cfg = TINY
    model = Stratified(cfg)
    batch = make_batch(cfg, seed=1)
    rng = jax.random.PRNGKey(0)
    s0 = create_train_state(
        model, rng, (batch["feats"], batch["xyz"], batch["offsets"]),
        multi_step(0.01, [10], 0.1))
    one = make_train_step(ignore_label=255, num_classes=cfg.num_classes)
    two = make_split_train_step(ignore_label=255,
                                num_classes=cfg.num_classes)
    sa, stats_a = jax.jit(one)(s0, batch, jax.random.PRNGKey(7))
    sb, stats_b = two(s0, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(stats_a["loss"]), float(stats_b["loss"]), rtol=1e-5)
    la = jax.tree.leaves(sa.params)
    lb = jax.tree.leaves(sb.params)
    for a, b_ in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_band_per_stage_widens_without_changing_uncut_results():
    """With no window exceeding the narrow band, per-stage widening is a
    no-op on the output; and the config plumbs through end-to-end."""
    import dataclasses
    cfg_a = TINY
    cfg_b = dataclasses.replace(TINY, band_per_stage=(64, 32))
    batch = make_batch(cfg_a, seed=5)
    rng = jax.random.PRNGKey(0)
    model_a = Stratified(cfg_a)
    va = model_a.init({"params": rng, "droppath": rng},
                      batch["feats"], batch["xyz"], batch["offsets"],
                      training=False)
    la, _ = model_a.apply(va, batch["feats"], batch["xyz"],
                          batch["offsets"], training=False)
    model_b = Stratified(cfg_b)
    lb, _ = model_b.apply(va, batch["feats"], batch["xyz"],
                          batch["offsets"], training=False)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=2e-4, atol=2e-5)
