"""DCF box-mAP evaluation driver (reference ``test_iou.py`` capability).

``python test_iou.py --config configs/dcf_stratified.yaml model_path <ckpt>``

Per scene: chunked model inference (labels + offsets) -> DBSCAN
instantiation -> axis-aligned boxes -> DetectionMAP vs GT boxes.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("stratified-transformer-tpu box mAP eval")
    p.add_argument("--config", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def predict_scene(predict_fn, coord, feat, n_pad, voxel_max, concat_xyz,
                  num_scenes):
    """Chunked full-scene prediction of (labels, offsets)
    (reference test_iou.py / test.py chunk loop)."""
    from stratified_transformer_tpu.eval.voting import sphere_cover_crops

    n = len(coord)
    logits_acc = None
    shift_acc = np.zeros((n, 3), np.float64)
    count = np.zeros(n, np.float64)
    crops = sphere_cover_crops(coord, voxel_max)
    for s in range(0, len(crops), num_scenes):
        batch = crops[s:s + num_scenes]
        xyz_b = np.zeros((n_pad, 3), np.float32)
        cdim = feat.shape[1] + (3 if concat_xyz else 0)
        feat_b = np.zeros((n_pad, cdim), np.float32)
        offsets = np.zeros((num_scenes,), np.int32)
        pos = 0
        for j, idx in enumerate(batch):
            cc = coord[idx] - coord[idx].min(0)
            ff = feat[idx]
            m = len(idx)
            xyz_b[pos:pos + m] = cc
            feat_b[pos:pos + m] = (
                np.concatenate([ff, cc], 1) if concat_xyz else ff)
            pos += m
            offsets[j] = pos
        offsets[len(batch):] = pos
        logits, shift = predict_fn(feat_b, xyz_b, offsets)
        logits = np.asarray(logits)
        shift = np.asarray(shift)
        pos = 0
        for idx in batch:
            m = len(idx)
            if logits_acc is None:
                logits_acc = np.zeros((n, logits.shape[-1]), np.float64)
            logits_acc[idx] += logits[pos:pos + m]
            shift_acc[idx] += shift[pos:pos + m]
            count[idx] += 1
            pos += m
    count = np.maximum(count, 1)
    return (np.argmax(logits_acc / count[:, None], -1),
            shift_acc / count[:, None])


def main():
    args = get_parser()
    from stratified_transformer_tpu.utils.config import (
        load_cfg, merge_cfg_from_list)
    cfg = load_cfg(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)

    import dataclasses
    import jax
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from train import build_model_config
    from stratified_transformer_tpu.data.datasets import DCF, SyntheticRooms
    from stratified_transformer_tpu.eval import box_map, instantiation
    from stratified_transformer_tpu.models.stratified import Stratified
    from stratified_transformer_tpu.train import checkpoint as ckpt
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.utils.logger import get_logger

    logger = get_logger(None)
    bst = int(cfg.get("batch_size_test", 4))
    voxel_max = cfg.get("voxel_max", 80000)
    mcfg = build_model_config(cfg, 1)
    n_pad = ((bst * voxel_max + mcfg.tile - 1) // mcfg.tile) * mcfg.tile
    mcfg = dataclasses.replace(
        mcfg, n_pad=n_pad, num_scenes=bst, with_regressor=True)
    model = Stratified(mcfg)

    # axon runtime workaround: small fused program BEFORE the full-size
    # template init (docs/PERF_NOTES.md, train.py r3 bisection)
    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    fused_attention_warmup(mcfg, logger=logger)

    ex = (np.zeros((n_pad, mcfg.in_channels), np.float32),
          np.zeros((n_pad, 3), np.float32),
          np.full((bst,), n_pad // bst, np.int32).cumsum().astype(np.int32))
    state = create_train_state(
        model, jax.random.PRNGKey(0), ex, multi_step(1e-3, [1]))
    if cfg.get("model_path"):
        state, epoch, _ = ckpt.restore(cfg["model_path"], state)
        logger.info(f"loaded checkpoint (epoch {epoch})")

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def predict(feats, xyz, offsets):
        return model.apply(variables, feats, xyz, offsets, training=False)

    # scene source: DCF test cubes, or synthetic boxes for smoke runs
    det = box_map.DetectionMAP(cfg.get("overlap_threshold", 0.5))
    data_name = cfg.get("data_name", "synthetic")
    if data_name == "dcf":
        roots = cfg["data_root"]
        ds = DCF(split="test",
                 data_root=[roots] if isinstance(roots, str) else roots,
                 voxel_size=cfg.get("voxel_size", 0.04))
        items = range(len(ds))
        load = lambda i: ds.load_item(ds.files[i])  # noqa: E731
    else:
        logger.info("synthetic smoke: random GT boxes")
        rng = np.random.default_rng(0)
        items = range(2)

        def load(i):
            n = 20000
            coord = rng.uniform(0, 4, (n, 3))
            labels = rng.integers(0, 18, n)
            offsets = rng.normal(0, 0.05, (n, 3))
            boxes = np.sort(rng.uniform(0, 4, (3, 2, 3)), axis=1).reshape(
                3, 6)
            return coord, labels, offsets, np.ones((n, 3)), boxes

    for i in items:
        coord, labels, offsets_gt, feat, params = load(i)
        gt_boxes = np.asarray(params, float).reshape(-1, 6)
        if gt_boxes.shape[1] == 6 and data_name == "dcf":
            # params rows are (centroid, lengths) -> corners
            c, l = gt_boxes[:, :3], gt_boxes[:, 3:]
            gt_boxes = np.concatenate([c - l / 2, c + l / 2], 1)
        t0 = time.time()
        pred_labels, pred_shift = predict_scene(
            predict, np.asarray(coord, np.float32),
            np.asarray(feat, np.float32), n_pad, voxel_max,
            bool(cfg.get("concat_xyz", True)), bst)
        objs = instantiation.instantiate(
            np.asarray(coord), pred_shift, pred_labels)
        n_raw = len(objs)
        if bool(cfg.get("merge_instances", True)):
            # fork bbox merge: partial-IoU + seamlessness agglomeration
            # (reference test.py:296-327 / test_iou.py:374-407)
            objs = instantiation.merge_instances(objs)
        pred_boxes = np.asarray(
            [instantiation.support_to_box(o) for o in objs]).reshape(-1, 6)
        tp, fp, fn = det.evaluate(pred_boxes, gt_boxes)
        logger.info(
            f"scene {i}: {n_raw} -> {len(objs)} objects after merge, "
            f"TP/FP/FN {tp}/{fp}/{fn} ({time.time() - t0:.1f}s)")
    s = det.summary()
    logger.info(f"Detection: {s}")


if __name__ == "__main__":
    main()
