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


def test_compress_roundtrip_and_gating():
    from stratified_transformer_tpu.data.compress import (
        compress_batch, widen_batch)
    rng = np.random.default_rng(3)
    batch = {
        "feats": rng.normal(size=(64, 6)).astype(np.float32),
        "offsets": np.array([40, 64], np.int32),
        "labels": rng.integers(0, 13, 64).astype(np.int32),
        "stem_nidx": rng.integers(0, 64, (64, 8)).astype(np.int32),
        "stem_nmask": rng.random((64, 8)) > 0.5,
        "pyramid": {"down": ({"idx": rng.integers(0, 64, 16).astype(
            np.int32), "valid": np.ones(16, bool),
            "offsets": np.array([10, 16], np.int32),
            "knn_idx": rng.integers(0, 64, (16, 4)).astype(np.int32),
            "knn_mask": np.ones((16, 4), bool)},),
            "up": ({"idx": rng.integers(0, 16, (64, 3)).astype(np.int32),
                    "mask": np.ones((64, 3), bool)},),
            "stage_down": ({"is_down": np.zeros(64, bool)},)},
    }
    comp = compress_batch(batch, n_pad=64)
    # indices narrowed, offsets/floats/bools untouched
    assert comp["stem_nidx"].dtype == np.uint16
    assert comp["labels"].dtype == np.uint16
    assert comp["pyramid"]["down"][0]["knn_idx"].dtype == np.uint16
    assert comp["pyramid"]["up"][0]["idx"].dtype == np.uint16
    assert comp["offsets"].dtype == np.int32
    assert comp["pyramid"]["down"][0]["offsets"].dtype == np.int32
    assert comp["feats"].dtype == np.float32
    assert comp["stem_nmask"].dtype == bool
    # ScanNet-scale gate: untouched at n_pad >= 65536
    assert compress_batch(batch, n_pad=65536) is batch

    wide = widen_batch(comp)
    for path in ("stem_nidx", "labels"):
        got = np.asarray(wide[path])
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, batch[path])
    np.testing.assert_array_equal(
        np.asarray(wide["pyramid"]["down"][0]["knn_idx"]),
        batch["pyramid"]["down"][0]["knn_idx"])
    np.testing.assert_array_equal(
        np.asarray(wide["pyramid"]["up"][0]["idx"]),
        batch["pyramid"]["up"][0]["idx"])
    np.testing.assert_array_equal(np.asarray(wide["feats"]), batch["feats"])


def test_compress_never_narrows_negative_or_wide_values():
    """ScanNetv2-style ignore_label -100 (reference config) must survive
    the narrowing path byte-exact: uint16 would wrap -100 -> 65436 and
    break the CE/metrics ignore mask. The gate is STATIC (config
    ignore_label + key allowlist, never per-batch values - a
    data-dependent dtype would retrace the jitted step)."""
    from stratified_transformer_tpu.data.compress import (
        compress_batch, widen_batch)
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 20, 64).astype(np.int32)
    labels[::5] = -100  # unannotated points
    batch = {
        "labels": labels,
        "stem_nidx": rng.integers(0, 64, (64, 8)).astype(np.int32),
        "wide_ids": np.array([0, 70000, 3], np.int64),
    }
    comp = compress_batch(batch, n_pad=64, ignore_label=-100)
    # labels gated off by the negative ignore sentinel; unknown keys ship
    # untouched; index keys still narrow
    assert comp["labels"].dtype == np.int32
    assert comp["wide_ids"].dtype == np.int64
    assert comp["stem_nidx"].dtype == np.uint16
    wide = widen_batch(comp)
    np.testing.assert_array_equal(np.asarray(wide["labels"]), labels)
    assert (np.asarray(wide["labels"]) == -100).sum() == (labels == -100).sum()

    # STATIC gate: a batch with no -100 present must ship the SAME dtypes
    # (jit signature stability batch-to-batch)
    all_annotated = dict(batch, labels=np.abs(labels).astype(np.int32))
    comp2 = compress_batch(all_annotated, n_pad=64, ignore_label=-100)
    assert comp2["labels"].dtype == np.int32

    # non-negative ignore sentinel (s3dis 255): labels narrow
    comp3 = compress_batch(dict(batch, labels=np.abs(labels)), n_pad=64,
                           ignore_label=255)
    assert comp3["labels"].dtype == np.uint16


def test_compressed_step_matches_uncompressed():
    """One jitted train step on a compressed batch must produce EXACTLY
    the stats (and params) of the uncompressed batch: widening restores
    the int32 program bit-for-bit."""
    import dataclasses

    from stratified_transformer_tpu.data.compress import compress_batch
    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step

    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, channels=(16, 32), depths=(1, 1),
        num_heads=(2, 4), num_layers=2, n_pad=256, num_scenes=1,
        band=32, band_per_stage=(32, 32), tile=32, sparse_cap=16,
        drop_path_rate=0.0)
    rng = np.random.default_rng(7)
    n_valid = 200
    xyz = np.zeros((256, 3), np.float32)
    xyz[:n_valid] = rng.uniform(0, 2, (n_valid, 3))
    feats = np.concatenate([rng.normal(size=(256, 3)).astype(np.float32),
                            xyz], 1)
    offsets = np.array([n_valid, 256], np.int32)
    labels = np.where(np.arange(256) < n_valid,
                      rng.integers(0, 5, 256), 255).astype(np.int32)

    from stratified_transformer_tpu.data.collate import (
        PaddedBatch, with_stem_neighbors)
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    pb = PaddedBatch(feats=feats, xyz=xyz, offsets=offsets, labels=labels,
                     stem_nidx=None, stem_nmask=None, target_shift=None)
    pb = with_stem_neighbors(pb, radius=2.5 * cfg.grid_size * cfg.sigma,
                             k=cfg.max_num_neighbors)
    batch = {"feats": feats, "xyz": xyz, "offsets": offsets,
             "labels": labels, "stem_nidx": pb.stem_nidx,
             "stem_nmask": pb.stem_nmask,
             "pyramid": build_geometry_pyramid(xyz, offsets, cfg)}
    comp = compress_batch(batch, cfg.n_pad)
    assert comp["stem_nidx"].dtype == np.uint16

    model = Stratified(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (feats, xyz, offsets),
        multi_step(0.006, [60], 0.1))
    step = jax.jit(make_train_step(255, 5))
    key = jax.random.PRNGKey(1)
    s1, stats1 = step(state, batch, key)
    s2, stats2 = step(state, comp, key)
    assert float(stats1["loss"]) == float(stats2["loss"])
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
