"""Layout-removal inference driver (reference ``test_layoutrm.py``).

The truncated variant of the fork's custom-scene pipeline: load a scene
(.obj vertices or synthetic), clean + axis-align it, run chunked semantic
prediction, and dump per-point label/offset results as colored point
clouds — *no* instantiation / box merging (reference ``test_layoutrm.py:193``
is exactly ``test.py`` with the DBSCAN-instancing tail removed).

``python test_layoutrm.py --config configs/dcf_stratified.yaml [k v ...]``
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("stratified-transformer-tpu layout removal")
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

    import dataclasses
    import jax
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from train import build_model_config
    from test_iou import predict_scene
    from stratified_transformer_tpu.data.ply import (
        load_obj_vertices, save_colored_by_label, write_ply_points)
    from stratified_transformer_tpu.eval import scene_prep
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

    out_dir = cfg.get("result_path", "runs/layoutrm")
    os.makedirs(out_dir, exist_ok=True)

    # scene source: custom .obj meshes (reference data_load_custom,
    # test.py:117-156) or synthetic boxes for smoke runs
    items = []
    if cfg.get("custom_data_root"):
        root = cfg["custom_data_root"]
        for f in sorted(os.listdir(root)):
            if f.endswith(".obj"):
                items.append((f[:-4], os.path.join(root, f)))
    if not items:
        logger.info("synthetic smoke: random box scene")
        items = [("synthetic_0", None)]

    for name, path in items:
        t0 = time.time()
        if path is None:
            rng = np.random.default_rng(0)
            coord = rng.uniform(0, 3, (20000, 3)).astype(np.float32)
        else:
            coord = load_obj_vertices(path).astype(np.float32)
        # DBSCAN outlier cleanup + PCA-OBB axis alignment (reference
        # test.py:122-141)
        coord = scene_prep.prepare_custom_scene(coord)
        feat = np.ones((coord.shape[0], 3), np.float32) * 127.5
        pred_labels, pred_shift = predict_scene(
            predict, coord, feat, n_pad, voxel_max,
            bool(cfg.get("concat_xyz", True)), bst)
        save_colored_by_label(
            os.path.join(out_dir, f"{name}_sem.ply"), coord, pred_labels)
        write_ply_points(
            os.path.join(out_dir, f"{name}_shift.ply"), coord + pred_shift)
        kept = int((pred_labels >= 6).sum())
        logger.info(
            f"{name}: {coord.shape[0]} pts, {kept} non-face pts, "
            f"wrote {out_dir}/{name}_sem.ply ({time.time() - t0:.1f}s)")
    logger.info("layout-removal inference done")


if __name__ == "__main__":
    main()
