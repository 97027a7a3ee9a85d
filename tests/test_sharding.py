"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratified_transformer_tpu.models.stratified import (
    Stratified, StratifiedConfig)
from stratified_transformer_tpu.parallel.dp import (
    make_dp_train_step, shard_batch)
from stratified_transformer_tpu.parallel.mesh import make_mesh
from stratified_transformer_tpu.train.schedulers import multi_step
from stratified_transformer_tpu.train.state import create_train_state
from test_model import TINY, make_batch


@pytest.mark.parametrize("n_dev", [2, 4])
def test_dp_train_step_runs(n_dev):
    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(n_dev)
    cfg = StratifiedConfig(**{**TINY.__dict__, "bn_axis_name": "data"})
    model = Stratified(cfg)
    batches = [make_batch(cfg, seed=s) for s in range(n_dev)]
    sharded = shard_batch(batches, mesh)
    schedule = multi_step(0.01, [100], 0.1)
    b0 = batches[0]
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (b0["feats"], b0["xyz"], b0["offsets"]), schedule)
    step = make_dp_train_step(
        mesh, ignore_label=255, num_classes=cfg.num_classes)
    state, stats = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))
    # psum'd point count across devices
    total = sum(int(b["offsets"][-1]) for b in batches)
    assert int(stats["points"]) == total


def test_dp_grads_match_single_device_mean():
    """DP step with replicated identical batches == single-device step."""
    n_dev = 2
    mesh = make_mesh(n_dev)
    cfg_dp = StratifiedConfig(**{**TINY.__dict__, "bn_axis_name": "data",
                                 "drop_path_rate": 0.0})
    cfg_1 = StratifiedConfig(**{**TINY.__dict__, "drop_path_rate": 0.0})
    model_dp = Stratified(cfg_dp)
    model_1 = Stratified(cfg_1)
    batch = make_batch(cfg_dp, seed=0)
    batches = [batch, batch]
    sharded = shard_batch(batches, mesh)
    schedule = multi_step(0.01, [100], 0.1)
    state = create_train_state(
        model_1, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    state_dp = state.replace(apply_fn=model_dp.apply)

    dp = make_dp_train_step(mesh, ignore_label=255,
                            num_classes=cfg_dp.num_classes)
    from stratified_transformer_tpu.train.step import make_train_step
    single = jax.jit(make_train_step(ignore_label=255,
                                     num_classes=cfg_1.num_classes))

    # the DP step donates its state arrays — run the single step first
    s_1, _ = single(state, batch, jax.random.PRNGKey(1))
    s_dp, _ = dp(state_dp, sharded, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_dcf_regressor_under_dp():
    """DCF combination under DP: with_regressor=True + target_shift + SyncBN
    on the virtual mesh — grads match the single-device step and the offset
    L1 term contributes (reference train.py:124,341-345 under DDP)."""
    n_dev = 2
    mesh = make_mesh(n_dev)
    base = {**TINY.__dict__, "with_regressor": True, "drop_path_rate": 0.0}
    cfg_dp = StratifiedConfig(**{**base, "bn_axis_name": "data"})
    cfg_1 = StratifiedConfig(**base)
    model_dp = Stratified(cfg_dp)
    model_1 = Stratified(cfg_1)
    batch = make_batch(cfg_dp, seed=0, with_shift=True)
    sharded = shard_batch([batch, batch], mesh)
    schedule = multi_step(0.01, [100], 0.1)
    state = create_train_state(
        model_1, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    state_dp = state.replace(apply_fn=model_dp.apply)

    dp = make_dp_train_step(mesh, ignore_label=255,
                            num_classes=cfg_dp.num_classes,
                            offset_weight=0.7)
    from stratified_transformer_tpu.train.step import make_train_step
    single = jax.jit(make_train_step(
        ignore_label=255, num_classes=cfg_1.num_classes, offset_weight=0.7))

    s_1, st_1 = single(state, batch, jax.random.PRNGKey(1))
    s_dp, st_dp = dp(state_dp, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(st_dp["loss"]))
    # offset L1 term is live
    assert float(st_dp.get("loss_offset", st_1.get("loss_offset", 1.0))) > 0
    # DP stats are psum'd over devices (train.py divides by n_devices)
    np.testing.assert_allclose(
        float(st_dp["loss"]) / n_dev, float(st_1["loss"]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(s_1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
