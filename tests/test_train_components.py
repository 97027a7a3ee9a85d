"""Tests for schedulers, losses, metrics, config system."""

import numpy as np
import jax
import jax.numpy as jnp

from stratified_transformer_tpu.train import losses, metrics, schedulers
from stratified_transformer_tpu.utils.config import (
    CfgNode, load_cfg, merge_cfg_from_list)


def test_multistep_with_warmup_matches_reference_formula():
    sched = schedulers.multi_step_with_warmup(
        1.0, [100, 200], 0.1, warmup_iters=10, warmup_ratio=1e-6)
    # reference util/lr.py:38-55
    def ref(s):
        factor = 1.0
        for m in [100, 200]:
            if s >= m:
                factor *= 0.1
        if s <= 10:
            w = 1 - (1 - s / 10) * (1 - 1e-6)
        else:
            w = 1.0
        return factor * w
    for s in [0, 1, 5, 10, 11, 99, 100, 150, 200, 300]:
        # atol covers fp32 rounding of the 1e-6 warmup floor at step 0
        np.testing.assert_allclose(
            float(sched(jnp.asarray(s))), ref(s), rtol=1e-5, atol=2e-8,
            err_msg=f"step {s}")


def test_poly_and_exp():
    p = schedulers.poly(2.0, 100, power=0.9)
    np.testing.assert_allclose(float(p(jnp.asarray(0))), 2.0)
    e = schedulers.exponential(1.0, 10, 0.9)
    np.testing.assert_allclose(float(e(jnp.asarray(10))), 0.9, rtol=1e-6)


def test_from_config_multistep_epoch():
    cfg = {"scheduler": "MultiStep", "scheduler_update": "epoch",
           "base_lr": 1.0, "epochs": 100}
    sched, gran = schedulers.from_config(CfgNode(cfg), iter_per_epoch=10)
    assert gran == "epoch"
    # milestones 60/80 epochs
    assert np.isclose(float(sched(jnp.asarray(599))), 1.0)
    assert np.isclose(float(sched(jnp.asarray(600))), 0.1)
    assert np.isclose(float(sched(jnp.asarray(800))), 0.01)


def test_cross_entropy_ignores_label():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.asarray([0, 1, 255])
    loss = losses.cross_entropy(logits, labels, 255)
    # both real labels predicted confidently -> tiny loss
    assert float(loss) < 1e-3
    # all ignored -> 0
    loss2 = losses.cross_entropy(logits, jnp.asarray([255] * 3), 255)
    assert float(loss2) == 0.0


def test_l1_offset_masks_padding():
    pred = jnp.ones((4, 3))
    tgt = jnp.zeros((4, 3))
    valid = jnp.asarray([True, True, False, False])
    assert np.isclose(float(losses.l1_offset(pred, tgt, valid)), 1.0)


def test_iou_counts():
    pred = jnp.asarray([0, 0, 1, 1, 2])
    target = jnp.asarray([0, 1, 1, 1, 255])
    inter, union, tgt = metrics.intersection_and_union(pred, target, 3, 255)
    np.testing.assert_array_equal(np.asarray(inter), [1, 2, 0])
    np.testing.assert_array_equal(np.asarray(tgt), [1, 3, 0])
    m = metrics.iou_from_counts(inter, union, tgt)
    assert 0 <= m["miou"] <= 1


def test_config_load_and_merge(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "DATA:\n  classes: 13\n  voxel_size: 0.04\n"
        "TRAIN:\n  base_lr: 0.006\n  depths: [2, 2]\n")
    cfg = load_cfg(str(p))
    assert cfg.classes == 13 and cfg.base_lr == 0.006
    cfg2 = merge_cfg_from_list(cfg, ["classes", "20", "base_lr", "0.1"])
    assert cfg2.classes == 20 and np.isclose(cfg2.base_lr, 0.1)
    assert cfg.classes == 13  # original untouched
