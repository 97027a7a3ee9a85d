"""Whole-scene evaluation driver (reference ``test_backup.py`` protocol).

``python test.py --config configs/<cfg>.yaml model_path <ckpt_dir> [k v ..]``

Per scene: TTA ensemble x voxel-vote chunks x sliding-sphere crops ->
softmax accumulation -> per-class IoU report.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("stratified-transformer-tpu evaluation")
    p.add_argument("--config", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = get_parser()
    from stratified_transformer_tpu.utils.config import (
        load_cfg, merge_cfg_from_list)
    cfg = load_cfg(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)

    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from train import build_model_config
    from stratified_transformer_tpu.models.stratified import Stratified
    from stratified_transformer_tpu.eval import voting
    from stratified_transformer_tpu.train import checkpoint as ckpt
    from stratified_transformer_tpu.train import metrics as M
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.utils.logger import get_logger

    logger = get_logger(cfg.get("save_folder") or None)
    data_name = cfg.get("data_name", "synthetic")
    ncls = int(cfg.get("classes", 13))
    voxel_max = cfg.get("voxel_max", 80000)
    bst = int(cfg.get("batch_size_test", 5))
    import dataclasses

    mcfg = build_model_config(cfg, 1)
    tile = mcfg.tile
    eval_points = int(cfg.get(
        "eval_max_batch_points", bst * (voxel_max or 80000)))
    n_pad = (eval_points + tile - 1) // tile * tile
    mcfg = dataclasses.replace(mcfg, n_pad=n_pad, num_scenes=bst)
    model = Stratified(mcfg)

    # axon runtime workaround, ORDER-CRITICAL: a small fused-model program
    # must execute before ANY full-size fused program, including the
    # template init below (train.py r3 bisection; docs/PERF_NOTES.md)
    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    fused_attention_warmup(mcfg, logger=logger)

    # template state to restore into
    rng = jax.random.PRNGKey(0)
    ex_feats = np.zeros((mcfg.n_pad, mcfg.in_channels), np.float32)
    ex_xyz = np.zeros((mcfg.n_pad, 3), np.float32)
    ex_off = np.full((bst,), mcfg.n_pad // bst, np.int32).cumsum().astype(
        np.int32)
    state = create_train_state(
        model, rng, (ex_feats, ex_xyz, ex_off), multi_step(1e-3, [1]))
    model_path = cfg.get("model_path")
    if model_path:
        state, epoch, _ = ckpt.restore(model_path, state)
        logger.info(f"loaded checkpoint from {model_path} (epoch {epoch})")
    else:
        logger.info("WARNING: no model_path given — evaluating random init")

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def predict_probs(feats, xyz, offsets):
        logits, _ = model.apply(
            variables, feats, xyz, offsets, training=False)
        return jax.nn.softmax(logits, -1)

    # ---- sharded whole-scene inference (spatial blocks + halo) ----
    # Replaces the reference's serial sliding-sphere chunk loop
    # (test_backup.py:238-285) with one data-parallel forward per voxel-vote
    # chunk: each device evaluates a spatial slab padded by the model's
    # receptive halo (parallel/halo.py). ``sharded: true`` in the config (or
    # CLI ``sharded true``) enables it; exactness requires the
    # count-independent sampler (``sharded_down_quota: cells``, default).
    sharded = bool(cfg.get("sharded", False))
    halo_stats: dict = {}
    if sharded:
        from stratified_transformer_tpu.parallel import halo as halo_mod
        from stratified_transformer_tpu.parallel.mesh import make_mesh

        ndev = int(cfg.get("sharded_devices", 0)) or len(jax.devices())
        mesh = make_mesh(ndev)
        block_pad = int(cfg.get("sharded_block_points",
                                voxel_max or 80000))
        block_pad = (block_pad + tile - 1) // tile * tile
        mcfg_b = dataclasses.replace(
            mcfg, n_pad=block_pad, num_scenes=1,
            down_quota=str(cfg.get("sharded_down_quota", "cells")))
        model_b = Stratified(mcfg_b)
        halo_width = float(cfg.get("sharded_halo", 0.0)) or (
            halo_mod.receptive_halo(mcfg_b))
        logger.info(
            f"sharded eval: {ndev} devices, block_pad {block_pad}, "
            f"halo {halo_width:.2f} m, down_quota {mcfg_b.down_quota}")

        @jax.jit
        def predict_blocks(feats_b, xyz_b, offsets_b):
            def one(f_, x_, o_):
                logits, _ = model_b.apply(
                    variables, f_, x_, o_.astype(jnp.int32),
                    training=False, anchor=jnp.zeros((3,), jnp.float32))
                return jax.nn.softmax(logits, -1)
            return jax.vmap(one)(feats_b, xyz_b, offsets_b)

        # On-device halo exchange (ppermute collectives): the host ships
        # only core slabs; boundary points move over ICI
        # (parallel/halo.make_collective_predict). Default on; chunks
        # whose halo exceeds a slab width fall back to host replication.
        collective = bool(cfg.get("sharded_collective", True))
        apply_probs_coll = None
        collective_predict = None
        core_pad = halo_cap = 0
        if collective:
            # per-slab core ~ chunk/ndev; block_pad (the host path's
            # per-device capacity) right-sizes it for chunks up to
            # ndev * block_pad total points
            core_pad = int(cfg.get("sharded_core_points", block_pad))
            core_pad = (core_pad + tile - 1) // tile * tile
            halo_cap = int(cfg.get("sharded_halo_points", core_pad // 2))
            halo_cap = max((halo_cap + tile - 1) // tile * tile, tile)
            b_pad = core_pad + 2 * halo_cap
            mcfg_c = dataclasses.replace(mcfg_b, n_pad=b_pad)
            model_c = Stratified(mcfg_c)

            def apply_probs_coll(f_, x_, o_):
                logits, _ = model_c.apply(
                    variables, f_, x_, o_.astype(jnp.int32),
                    training=False, anchor=jnp.zeros((3,), jnp.float32))
                return jax.nn.softmax(logits, -1)

            # ONE jitted exchange+forward per eval run (shape-keyed)
            collective_predict = halo_mod.make_collective_predict(
                apply_probs_coll, mesh, core_pad, halo_cap)

    # ---- scene source ----
    scenes = []
    if data_name == "s3dis":
        root = cfg["data_root"]
        items = sorted(i[:-4] for i in os.listdir(root)
                       if f"Area_{cfg.get('test_area', 5)}" in i)
        for it in items:
            d = np.load(os.path.join(root, it + ".npy"))
            scenes.append((it, d[:, :3], d[:, 3:6], d[:, 6].astype(np.int64)))
    elif data_name == "scannetv2":
        import torch
        root = os.path.join(cfg["data_root"], "val")
        for f in sorted(os.listdir(root)):
            if not f.endswith(".pth"):
                continue
            d = torch.load(os.path.join(root, f), weights_only=False)
            scenes.append((f[:-4], np.asarray(d[0]), np.asarray(d[1]),
                           np.asarray(d[2]).astype(np.int64)))
    else:  # synthetic
        from stratified_transformer_tpu.data.datasets import SyntheticRooms
        ds = SyntheticRooms(
            num_scenes=int(cfg.get("synthetic_eval_scenes", 2)),
            points=int(cfg.get("synthetic_points", 20000)),
            num_classes=ncls, seed=999)
        for i in range(len(ds)):
            c, f, l, _ = ds.raw_scene(i)
            scenes.append((f"synthetic_{i}", c, f, l.astype(np.int64)))

    feat_is_rgb255 = data_name in ("s3dis", "synthetic")
    inter_sum = np.zeros(ncls)
    union_sum = np.zeros(ncls)
    target_sum = np.zeros(ncls)
    ignore = int(cfg.get("ignore_label", 255))
    for si, (name, coord, feat, label) in enumerate(scenes):
        t0 = time.time()
        if sharded:
            pred, _ = voting.evaluate_scene_sharded(
                predict_blocks, coord, feat, ncls,
                mesh=mesh, halo_width=halo_width, block_pad=block_pad,
                data_name="s3dis" if feat_is_rgb255 else data_name,
                voxel_size=cfg.get("voxel_size", 0.04),
                concat_xyz=bool(cfg.get("concat_xyz", True)),
                stats=halo_stats, apply_probs=apply_probs_coll,
                core_pad=core_pad, halo_cap=halo_cap,
                collective_predict=collective_predict)
        else:
            pred, _ = voting.evaluate_scene(
                predict_probs, coord, feat, ncls,
                data_name="s3dis" if feat_is_rgb255 else data_name,
                voxel_size=cfg.get("voxel_size", 0.04),
                voxel_max=voxel_max, batch_size_test=bst,
                n_pad=mcfg.n_pad, num_scenes=bst,
                concat_xyz=bool(cfg.get("concat_xyz", True)))
        mask = label != ignore
        p, t = pred[mask], label[mask]
        inter = np.bincount(p[p == t], minlength=ncls)[:ncls]
        a_p = np.bincount(p, minlength=ncls)[:ncls]
        a_t = np.bincount(t, minlength=ncls)[:ncls]
        inter_sum += inter
        union_sum += a_p + a_t - inter
        target_sum += a_t
        acc = inter.sum() / max(a_t.sum(), 1)
        logger.info(
            f"Scene [{si + 1}/{len(scenes)}] {name}: acc {acc:.4f} "
            f"({time.time() - t0:.1f}s)")

    if sharded and halo_stats:
        logger.info(
            f"sharded eval stats: {halo_stats.get('blocks_evaluated', 0)} "
            f"blocks, {halo_stats.get('truncated_halo_points', 0)} halo "
            "points truncated (non-zero => raise sharded_block_points); "
            f"collective chunks {halo_stats.get('collective_chunks', 0)} "
            f"(host-replication fallbacks "
            f"{halo_stats.get('collective_fallback_chunks', 0)}, cap-"
            f"dropped {halo_stats.get('halo_cap_dropped', 0)})")
    m = M.iou_from_counts(inter_sum, union_sum, target_sum)
    for c in range(ncls):
        logger.info(
            f"Class_{c:02d} iou/acc {m['iou_class'][c]:.4f}/"
            f"{m['acc_class'][c]:.4f}")
    logger.info(
        f"Val result: mIoU/mAcc/allAcc {m['miou']:.4f}/{m['macc']:.4f}/"
        f"{m['all_acc']:.4f}")


if __name__ == "__main__":
    main()
