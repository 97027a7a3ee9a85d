"""Training driver: ``python train.py --config configs/<cfg>.yaml [k v ...]``.

TPU-native re-design of the reference drivers (``train.py`` /
``train_backup.py``): one process drives the whole chip mesh (no
``mp.spawn``); data parallelism is a ``Mesh`` + ``shard_map`` step with
gradient ``pmean`` and SyncBN ``psum`` (reference DDP + SyncBatchNorm,
``train.py:88-105,152-161``); schedules are pure functions of the step;
checkpoints are orbax pytrees.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import queue
import threading
import time

import numpy as np


def get_parser():
    parser = argparse.ArgumentParser("stratified-transformer-tpu training")
    parser.add_argument("--config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides: key value [key value ...]")
    return parser.parse_args()


def build_model_config(cfg, n_devices):
    from stratified_transformer_tpu.models.stratified import StratifiedConfig

    tile = int(cfg.get("tile", 128))
    scenes_per_device = max(
        int(cfg.get("batch_size", 8)) // max(n_devices, 1), 1)
    n_pad = int(cfg.get("max_batch_points", 140000))
    # per-device flat capacity
    n_pad = max(
        (n_pad // max(n_devices, 1) + tile - 1) // tile * tile, tile)
    fea_dim = int(cfg.get("fea_dim", 6))
    in_ch = fea_dim if cfg.get("concat_xyz", True) else fea_dim - 3
    # Arch switch mirrors the reference driver (train_backup.py:99-129):
    # `arch: swin3d_transformer` selects the fixed-window baseline
    # (model/swin3d_transformer.py:364-453) = dense in-window pairs only
    # with window-quantized RPE bins; explicit use_stratified/rpe_mode
    # keys still win if set.
    arch = str(cfg.get("arch", "stratified_transformer"))
    swin = arch == "swin3d_transformer"
    return StratifiedConfig(
        num_classes=int(cfg.get("classes", 13)),
        in_channels=in_ch,
        channels=tuple(cfg.get("channels")),
        depths=tuple(cfg.get("depths")),
        num_heads=tuple(cfg.get("num_heads")),
        num_layers=int(cfg.get("num_layers")),
        window_size=float(cfg.get("window_size", 4)),
        patch_size=float(cfg.get("patch_size", 1)),
        grid_size=float(cfg.get("grid_size", 0.04)),
        quant_size=float(cfg.get("quant_size", 0.01)),
        downsample_scale=int(cfg.get("downsample_scale", 8)),
        rel_query=bool(cfg.get("rel_query", True)),
        rel_key=bool(cfg.get("rel_key", True)),
        rel_value=bool(cfg.get("rel_value", True)),
        drop_path_rate=float(cfg.get("drop_path_rate", 0.3)),
        concat_xyz=bool(cfg.get("concat_xyz", True)),
        stem_transformer=bool(cfg.get("stem_transformer", True)),
        up_k=int(cfg.get("up_k", 3)),
        ratio=float(cfg.get("ratio", 0.25)),
        k=int(cfg.get("k", 16)),
        max_num_neighbors=int(cfg.get("max_num_neighbors", 34)),
        with_regressor=bool(cfg.get("with_regressor", False)),
        activation=str(cfg.get("activation", "Relu")),
        n_pad=n_pad,
        num_scenes=scenes_per_device,
        band=int(cfg.get("band", 128)),
        tile=tile,
        sparse_cap=int(cfg.get("sparse_cap", 48)),
        sampler=str(cfg.get("sampler", "grid")),
        use_stratified=bool(cfg.get("use_stratified", not swin)),
        rpe_mode=str(cfg.get(
            "rpe_mode", "swin_window" if swin else "stratified")),
        bn_axis_name="data" if (
            n_devices > 1 and cfg.get("sync_bn", True)) else None,
        attn_impl=str(cfg.get("attn_impl", "reference")),
        # r4 postmortem: the "attn_bwd jnp" discriminator run silently
        # no-opped because this key was never plumbed — keep EVERY
        # StratifiedConfig knob reachable from the config/CLI.
        attn_bwd=str(cfg.get("attn_bwd", "pallas")),
        s_band=int(cfg.get("s_band", 128)),
        down_quota=str(cfg.get("down_quota", "scene")),
        sigma=float(cfg.get("sigma", 1.0)),
        mlp_ratio=float(cfg.get("mlp_ratio", 4.0)),
        knn_chunk=int(cfg.get("knn_chunk", 1024)),
        neighbor_method=str(cfg.get("neighbor_method", "grid")),
        neighbor_cap=int(cfg.get("neighbor_cap", 32)),
        grid_knn_chunk=int(cfg.get("grid_knn_chunk", 4096)),
        pallas_interpret=bool(cfg.get("pallas_interpret", False)),
        fused_stages=int(cfg.get("fused_stages", 3)),
        head_group=int(cfg.get("head_group", 6)),
        band_per_stage=(tuple(int(x) for x in cfg.get("band_per_stage"))
                        if cfg.get("band_per_stage") else None),
        w_chunk=int(cfg.get("w_chunk", 128)),
        compute_dtype=cfg.get("compute_dtype"),
        rpe_precision=str(cfg.get("rpe_precision", "highest")),
        qk_precision=str(cfg.get("qk_precision", "highest")),
        tile_batch=int(cfg.get("tile_batch", 16)),
        attn_remat=str(cfg.get("attn_remat", "full")),
    )


def build_dataset(cfg, split, mcfg):
    from stratified_transformer_tpu.data import transforms as T
    from stratified_transformer_tpu.data import datasets

    name = cfg.get("data_name", "synthetic")
    voxel_max = cfg.get("voxel_max")
    aug = bool(cfg.get("aug", False)) and split == "train"
    tfm = None
    if aug:
        tfm = T.Compose([
            T.RandomRotate(along_z=cfg.get("rotate_along_z", True)),
            T.RandomScale(cfg.get("scale_low", 0.8),
                          cfg.get("scale_high", 1.2)),
            T.RandomJitter(cfg.get("jitter_sigma", 0.005),
                           cfg.get("jitter_clip", 0.02)),
            T.RandomDropColor(color_augment=cfg.get("color_augment", 0.0)),
        ])
    if name == "s3dis":
        return datasets.S3DIS(
            split=split, data_root=cfg["data_root"],
            test_area=cfg.get("test_area", 5),
            voxel_size=cfg.get("voxel_size", 0.04), voxel_max=voxel_max,
            transform=tfm, shuffle_index=True,
            loop=cfg.get("loop", 1) if split == "train" else 1)
    if name == "scannetv2":
        return datasets.Scannetv2(
            split="train" if split == "train" else "val",
            data_root=cfg["data_root"],
            voxel_size=cfg.get("voxel_size", 0.02), voxel_max=voxel_max,
            transform=tfm, shuffle_index=True,
            loop=cfg.get("loop", 1) if split == "train" else 1)
    if name == "dcf":
        roots = cfg["data_root"]
        if isinstance(roots, str):
            roots = [roots]
        return datasets.DCF(
            split=split, data_root=roots,
            voxel_size=cfg.get("voxel_size", 0.04),
            sigma=cfg.get("noise_sigma", 0.02), voxel_max=voxel_max,
            shuffle_index=True)
    if name == "synthetic":
        return datasets.SyntheticRooms(
            num_scenes=int(cfg.get("synthetic_scenes", 32)),
            points=int(cfg.get("synthetic_points", 40000)),
            voxel_size=cfg.get("voxel_size", 0.04), voxel_max=voxel_max,
            num_classes=int(cfg.get("classes", 13)), transform=tfm,
            with_shift=bool(cfg.get("with_regressor", False)),
            seed=0 if split == "train" else 10_000, split=split)
    raise ValueError(name)


class BatchLoader:
    """Threaded prefetching batch iterator over a map-style dataset."""

    def __init__(self, dataset, mcfg, cfg, n_devices, shuffle, seed=0):
        self.dataset = dataset
        self.mcfg = mcfg
        self.cfg = cfg
        self.n_devices = n_devices
        self.shuffle = shuffle
        self.seed = seed
        spd = mcfg.num_scenes
        self.scenes_per_batch = spd * n_devices
        self.batches_per_epoch = max(
            len(dataset) // self.scenes_per_batch, 1)
        # Mix3D scene mixing probability (reference collate_fn_limit_mix3d,
        # util/data_util.py:17-58): with prob `mix3d`, consecutive scene
        # pairs are merged into one offset entry.
        self.mix3d_p = float(cfg.get("mix3d", 0.0)) if shuffle else 0.0
        self._mix_rng = np.random.default_rng(seed + 101)

    def _make_batch(self, scene_ids):
        from stratified_transformer_tpu.data.collate import (
            collate_scenes, with_stem_neighbors)
        from stratified_transformer_tpu.data.prepare import with_xyz_concat

        mcfg = self.mcfg
        per_dev = []
        spd = mcfg.num_scenes
        for d in range(self.n_devices):
            ids = scene_ids[d * spd:(d + 1) * spd]
            scenes = [self.dataset[i] for i in ids]
            if self.mix3d_p > 0 and self._mix_rng.random() <= self.mix3d_p:
                from stratified_transformer_tpu.data.collate import (
                    mix3d_pairs)
                scenes = mix3d_pairs(scenes)
            if mcfg.concat_xyz:
                scenes = [with_xyz_concat(s) for s in scenes]
            b = collate_scenes(
                scenes, mcfg.n_pad, spd,
                ignore_label=int(self.cfg.get("ignore_label", 255)))
            # KPConv-stem ball query on the host, in this prefetch worker —
            # overlapped with device compute exactly like the reference's
            # CPU ball_query in the train loop (train.py:324-329).
            b = with_stem_neighbors(
                b, radius=2.5 * mcfg.grid_size * mcfg.sigma,
                k=mcfg.max_num_neighbors)
            d_batch = {"feats": b.feats, "xyz": b.xyz,
                       "offsets": b.offsets, "labels": b.labels,
                       "stem_nidx": b.stem_nidx,
                       "stem_nmask": b.stem_nmask}
            # The host pyramid implements GRID pooling only; under
            # sampler=fps/blocked_fps it would silently override the
            # configured sampler with grid indices — fall back to
            # on-device sampling instead (slower, correct).
            if (bool(self.cfg.get("host_pyramid", True))
                    and mcfg.sampler == "grid"):
                from stratified_transformer_tpu.data.pyramid import (
                    build_geometry_pyramid)
                d_batch["pyramid"] = build_geometry_pyramid(
                    b.xyz, b.offsets, mcfg)
            if b.target_shift is not None:
                d_batch["target_shift"] = b.target_shift
            # uint16 index narrowing halves the tunnel payload of
            # stem_nidx + pyramid indices at n_pad < 65536; the jitted
            # step widens back (data/compress.py)
            if bool(self.cfg.get("compress_payload", True)):
                from stratified_transformer_tpu.data.compress import (
                    compress_batch)
                d_batch = compress_batch(
                    d_batch, mcfg.n_pad,
                    ignore_label=int(self.cfg.get("ignore_label", 255)))
            per_dev.append(d_batch)
        return per_dev

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        if not bool(self.cfg.get("prefetch", True)):
            # Synchronous loader: batches built inline between steps. Use
            # to take the prefetch thread out of the picture when
            # diagnosing axon-runtime faults (host threads active during
            # device execution are a suspect in the fused-path crash).
            for bi in range(self.batches_per_epoch):
                ids = order[bi * self.scenes_per_batch:
                            (bi + 1) * self.scenes_per_batch]
                yield self._make_batch(ids)
            return
        # Ordered multi-worker prefetch: worker w builds batches w, w+W,
        # w+2W, ... into its own bounded queue; the consumer round-robins
        # so batch order (and therefore training) is IDENTICAL to the
        # single-worker loader (tests/test_driver_smokes.py equality
        # test). Most of `_make_batch` is numpy/C++ that releases the
        # GIL (voxelize, grid pyramid, C++ stem query), so 2 workers
        # genuinely overlap on a 2-core host — the measured ~0.6 s/step
        # load-wait is the wall-clock gap between the device step and
        # the training cadence (docs/PERF_NOTES.md round-4 addendum).
        # NOTE mix3d: `_mix_rng` draws once per non-empty batch in
        # `_make_batch`; with W>1 the draw ORDER across batches changes,
        # so mix3d>0 pins W=1 to keep runs bit-reproducible.
        n_workers = max(int(self.cfg.get("prefetch_workers", 2)), 1)
        if self.mix3d_p > 0:
            n_workers = 1
        qs = [queue.Queue(maxsize=2) for _ in range(n_workers)]
        stop = threading.Event()

        def worker(w):
            for bi in range(w, self.batches_per_epoch, n_workers):
                ids = order[bi * self.scenes_per_batch:
                            (bi + 1) * self.scenes_per_batch]
                try:
                    item = self._make_batch(ids)
                except BaseException as e:  # propagate, don't hang the consumer
                    item = e
                # bounded put that honors abandonment: if the consumer
                # stopped iterating (early break / crash re-exec), exit
                # instead of blocking on a full queue forever.
                while not stop.is_set():
                    try:
                        qs[w].put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set() or isinstance(item, BaseException):
                    return

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(self.batches_per_epoch):
                item = qs[bi % n_workers].get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def _handle_step_crash(cfg, logger, save_path, epoch, it, err, attn_impl):
    """Mid-run device-fault handler (never returns).

    Writes ``<save_path>/crash_marker.json`` (what failed, how to resume),
    then either re-execs a FRESH process resuming from the last epoch
    checkpoint (``crash_fallback: reference`` swaps the attention impl to
    the pure-XLA path; ``crash_fallback: resume`` keeps it) or exits with
    rc 17. Exiting promptly matters: a poisoned axon client that lingers
    holds the device grant queue (docs/PERF_NOTES.md round-3 recovery).
    One re-exec max (ST_CRASH_REEXEC guard) — a second crash exits 17.
    """
    import sys

    ckpt_dir = os.path.join(save_path, "ckpt")
    marker = {
        "error": repr(err)[:500], "epoch": epoch + 1, "iter": it + 1,
        "attn_impl": attn_impl, "time": time.time(),
        "resume": ckpt_dir if os.path.isdir(ckpt_dir) else None,
        "note": ("process poisoned after a runtime fault; resume from the "
                 "last epoch checkpoint in a FRESH process "
                 "(docs/PERF_NOTES.md)")}
    try:
        with open(os.path.join(save_path, "crash_marker.json"), "w") as f:
            json.dump(marker, f, indent=1)
    except OSError:
        pass
    logger.info(f"FATAL step crash at epoch {epoch + 1} iter {it + 1}: "
                f"{err!r} - marker written")
    fallback = str(cfg.get("crash_fallback", "none"))
    if (fallback in ("reference", "resume") and marker["resume"]
            and not os.environ.get("ST_CRASH_REEXEC")):
        argv = _fallback_argv(sys.executable, sys.argv, ckpt_dir, fallback)
        logger.info(f"re-exec fallback: {' '.join(argv[1:])}")
        os.environ["ST_CRASH_REEXEC"] = "1"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, argv)  # fresh client; fds close on exec
    raise SystemExit(17)


def _fallback_argv(python, argv, ckpt_dir, fallback):
    """Re-exec command for the crash-fallback path (later ``key value``
    pairs win in ``merge_cfg_from_list``, so appending overrides)."""
    out = [python] + list(argv) + [
        "resume", ckpt_dir, "preflight", "true", "preflight_retries", "8"]
    if fallback == "reference":
        out += ["attn_impl", "reference"]
    return out


def main():
    args = get_parser()
    from stratified_transformer_tpu.utils.config import (
        load_cfg, merge_cfg_from_list)
    cfg = load_cfg(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)

    import jax

    from stratified_transformer_tpu.models.stratified import Stratified
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.parallel.dp import (
        make_dp_train_step, shard_batch)
    from stratified_transformer_tpu.parallel.mesh import make_mesh
    from stratified_transformer_tpu.train import checkpoint as ckpt
    from stratified_transformer_tpu.train import metrics as M
    from stratified_transformer_tpu.train import schedulers
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import (
        make_eval_step, make_train_step)
    from stratified_transformer_tpu.utils.logger import get_logger

    save_path = cfg.get("save_path", "runs/default")
    logger = get_logger(save_path)
    # Optional device preflight (config `preflight: true`): probe the TPU in
    # a throwaway subprocess with a hard timeout BEFORE this process
    # initialises the backend — a wedged axon runtime blocks every client
    # forever with 0 CPU (docs/PERF_NOTES.md round-3: detection + recovery).
    if bool(cfg.get("preflight", False)):
        from tools.preflight import probe_device
        retries = max(int(cfg.get("preflight_retries", 1)), 1)
        for attempt in range(retries):
            pf = probe_device(float(cfg.get("preflight_timeout", 420)),
                              log=logger.info)
            logger.info(f"preflight ({attempt + 1}/{retries}): {pf}")
            if pf["ok"]:
                break
            if attempt + 1 < retries:
                # post-crash wedges heal in ~10-75 min once the stale
                # grant clears (PERF_NOTES round-3 recovery recipe)
                time.sleep(float(cfg.get("preflight_retry_s", 300)))
        else:
            raise SystemExit(
                "TPU preflight failed (wedged runtime?) - aborting before "
                "this process blocks on the device. See docs/PERF_NOTES.md "
                "for the recovery recipe, or set preflight false to force.")
    n_devices = int(cfg.get("n_devices", 0)) or len(jax.devices())
    n_devices = min(n_devices, len(jax.devices()))
    mcfg = build_model_config(cfg, n_devices)
    logger.info(f"devices: {n_devices}; model config: {mcfg}")

    model = Stratified(mcfg)
    train_ds = build_dataset(cfg, "train", mcfg)
    loader = BatchLoader(
        train_ds, mcfg, cfg, n_devices, shuffle=True,
        seed=int(cfg.get("manual_seed", 123)))
    val_loader = None
    if cfg.get("evaluate", False):
        try:
            val_ds = build_dataset(cfg, "val", mcfg)
            val_loader = BatchLoader(
                val_ds, mcfg, cfg, 1, shuffle=False, seed=0)
        except (KeyError, ValueError, FileNotFoundError) as e:
            logger.info(f"no val dataset ({e}); skipping evaluation")
    iter_per_epoch = loader.batches_per_epoch
    logger.info(f"dataset: {len(train_ds)} samples,"
                f" {iter_per_epoch} iters/epoch")

    schedule, _ = schedulers.from_config(cfg, iter_per_epoch)
    example = loader._make_batch(list(range(loader.scenes_per_batch)))[0]
    # axon runtime workaround, ORDER-CRITICAL: the small Mosaic program must
    # execute before ANY full-size fused program — including the flax init
    # below, which traces and executes the fused forward at n_pad. Running
    # init first reproduces the first-Mosaic-program crash at the train
    # step's first execution (r3 bisection: 3/3 crashes with init-first,
    # bench/stability with warmup-first are green; PERF_NOTES round-2/3).
    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    fused_attention_warmup(mcfg, logger=logger)
    rng = jax.random.PRNGKey(int(cfg.get("manual_seed", 123)))
    state = create_train_state(
        model, rng, (example["feats"], example["xyz"], example["offsets"]),
        schedule,
        weight_decay=float(cfg.get("weight_decay", 0.01)),
        transformer_lr_scale=float(cfg.get("transformer_lr_scale", 0.1)),
        optimizer=str(cfg.get("optimizer", "AdamW")),
        grad_clip=cfg.get("max_grad_norm"))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(f"#Model parameters: {n_params}")

    start_epoch = int(cfg.get("start_epoch", 0))
    if cfg.get("resume"):
        state, start_epoch, _ = ckpt.restore(cfg["resume"], state)
        logger.info(f"resumed from {cfg['resume']} at epoch {start_epoch}")

    ignore = int(cfg.get("ignore_label", 255))
    ncls = int(cfg.get("classes", 13))
    offw = float(cfg.get("offset_weight", 1.0))

    # Pack the step statistics into ONE f32 vector inside the jitted step:
    # harvesting the dict costs 5+ separate device->host round trips per
    # iteration (~0.1 s over the tunneled runtime — the same disease as
    # the audit counters, fixed r4). Layout:
    # [loss, loss_seg, loss_offset, points, inter[C], union[C], target[C]]
    import jax.numpy as jnp

    def _pack_stats(stats):
        return jnp.concatenate([
            jnp.stack([stats["loss"], stats["loss_seg"],
                       stats["loss_offset"],
                       stats["points"].astype(jnp.float32)]),
            stats["intersection"].astype(jnp.float32),
            stats["union"].astype(jnp.float32),
            stats["target"].astype(jnp.float32)])

    if n_devices > 1:
        mesh = make_mesh(n_devices)
        dp_step = make_dp_train_step(mesh, ignore, ncls, offw)
        # jit the wrapper so the pack fuses into the sharded step program
        # (an out-of-jit concat would cost one extra dispatch per iter)
        step_fn = jax.jit(
            lambda s, b, r: (lambda st, sts: (st, _pack_stats(sts)))(
                *dp_step(s, b, r)))
    else:
        mesh = None
        inner_step = make_train_step(ignore, ncls, offw)
        step_fn = jax.jit(
            lambda s, b, r: (lambda st, sts: (st, _pack_stats(sts)))(
                *inner_step(s, b, r)),
            # donation + Pallas trips the axon runtime (docs/PERF_NOTES.md)
            donate_argnums=(0,) if mcfg.attn_impl != "fused" else ())
    eval_fn = jax.jit(make_eval_step(ignore, ncls))

    epochs = int(cfg.get("epochs", 100))
    step_rng = jax.random.PRNGKey(7)
    # Fault injection for the crash handler (chaos-test seam):
    # ST_FAULT_INJECT_AT="epoch:iter" (1-based) raises a synthetic runtime
    # fault at that step, exercising the same path as a real
    # INVALID_ARGUMENT from the device (tests/test_driver_smokes.py).
    fault_at = None
    if os.environ.get("ST_FAULT_INJECT_AT"):
        fault_at = tuple(
            int(x) for x in os.environ["ST_FAULT_INJECT_AT"].split(":"))
    log_every = int(cfg.get("print_freq", 1))
    # runtime truncation counters (band / s_band / sparse_cap drop
    # fractions) every print_freq — a real-data density shift must show up
    # in the logs, not silently eat pairs (train/audit.py)
    audit_fn = None
    if (bool(cfg.get("truncation_audit", True))
            and bool(cfg.get("host_pyramid", True))
            and mcfg.sampler == "grid"      # pyramid is grid-only
            and mcfg.use_stratified):
        from stratified_transformer_tpu.train.audit import (
            audit_truncation_packed)

        def audit_fn(b):
            return audit_truncation_packed(
                mcfg, {"xyz": b["xyz"], "offsets": b["offsets"],
                       "pyramid": b["pyramid"]})
    # The audit duplicates every plan build; on a device-resident batch it
    # is cheap but not free (~0.1-0.15 s/line device time + one harvest
    # transfer, measured r4) — run it every `audit_freq`-th logged line.
    audit_freq = int(cfg.get("audit_freq", 4))
    upload_overlap = bool(cfg.get("upload_overlap", False))
    metrics_path = os.path.join(save_path, "metrics.jsonl")
    os.makedirs(save_path, exist_ok=True)

    # TensorBoard scalars, mirroring the reference's tensorboardX writer
    # (reference train.py:19,143,275-276,393-395). Optional: falls back to
    # metrics.jsonl-only logging when tensorboard isn't importable.
    writer = None
    if cfg.get("use_tensorboard", True):
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(os.path.join(save_path, "tb"))
        except Exception:
            logger.info("tensorboard unavailable; metrics.jsonl only")

    def to_device(per_dev):
        """Ship one host batch to the device(s); async under jax dispatch."""
        if mesh is not None:
            return shard_batch(per_dev, mesh)
        return jax.device_put(per_dev[0])

    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        inter_sum = np.zeros(ncls)
        union_sum = np.zeros(ncls)
        target_sum = np.zeros(ncls)
        loss_meter = M.AverageMeter()
        points_total = 0
        # Pipelined driver loop (the wall-clock fix for the ~3x gap between
        # the device step and the training cadence, docs/RESULTS.md r3):
        #   1. dispatch the step on the CURRENT device-resident batch;
        #   2. while the device runs, pop the NEXT host batch from the
        #      prefetch thread (the host BUILD overlap — the big win);
        #   3. block on the step's outputs, then upload the next batch.
        # `upload_overlap: true` additionally device_puts the next batch
        # BEFORE blocking, overlapping the ~0.1-0.2 s tunnel transfer with
        # device compute — measured to trigger the axon INVALID_ARGUMENT
        # runtime fault class at N=40960 (r4 bench e2e, pure-jnp path), so
        # it is OPT-IN until the runtime hardens.
        # The truncation audit is dispatched right after the step on the
        # SAME device-resident arrays: no re-upload, its plan builds queue
        # behind the step and overlap the next host build.
        t_load = t_put = t_blk = 0.0
        it = -1
        itr = iter(loader)
        t0 = time.time()
        cur_host = next(itr, None)
        t_load += time.time() - t0
        cur_dev = to_device(cur_host) if cur_host is not None else None
        while cur_host is not None:
            it += 1
            per_dev, batch = cur_host, cur_dev
            t_iter0 = time.time()
            try:
                state, stats = step_fn(state, batch, step_rng)
                if fault_at == (epoch + 1, it + 1):
                    raise RuntimeError(
                        "INVALID_ARGUMENT: TPU backend error "
                        "(injected via ST_FAULT_INJECT_AT)")
                log_now = (it + 1) % log_every == 0
                audit_stats = None
                if (audit_fn is not None and log_now
                        and (it // log_every) % audit_freq == 0):
                    audit_stats = audit_fn(
                        batch if mesh is None else per_dev[0])
                t0 = time.time()
                cur_host = next(itr, None)
                t_load += time.time() - t0
                cur_dev = None
                if upload_overlap and cur_host is not None:
                    t0 = time.time()
                    cur_dev = to_device(cur_host)
                    t_put += time.time() - t0
                t0 = time.time()
                sarr = np.asarray(stats)      # ONE packed transfer
                t_blk += time.time() - t0
                loss = float(sarr[0]) / max(n_devices if mesh else 1, 1)
                if cur_dev is None and cur_host is not None:
                    t0 = time.time()
                    cur_dev = to_device(cur_host)
                    t_put += time.time() - t0
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:
                # Mid-run runtime fault (the fused-path INVALID_ARGUMENT
                # class, docs/PERF_NOTES.md): the process is POISONED —
                # every later dispatch fails too (r2 bisection), so
                # in-process fallback is impossible. Record a crash
                # marker with resume instructions and exit PROMPTLY (a
                # lingering client holds the axon grant queue); progress
                # since the last epoch checkpoint is lost by design.
                _handle_step_crash(cfg, logger, save_path, epoch, it, e,
                                   mcfg.attn_impl)
            loss_meter.update(loss)
            it_points = int(sarr[3])
            inter_sum += sarr[4:4 + ncls]
            union_sum += sarr[4 + ncls:4 + 2 * ncls]
            target_sum += sarr[4 + 2 * ncls:4 + 3 * ncls]
            points_total += it_points
            if log_now:
                trunc = ""
                if audit_stats is not None:
                    from stratified_transformer_tpu.train.audit import (
                        format_truncation, unpack_truncation)
                    trunc = " " + format_truncation(unpack_truncation(
                        mcfg, np.asarray(audit_stats)))
                dt_wall = time.time() - t_iter0
                pps = it_points / max(dt_wall, 1e-9)
                logger.info(
                    f"Epoch [{epoch + 1}/{epochs}][{it + 1}/"
                    f"{iter_per_epoch}] loss {loss:.4f} "
                    f"({loss_meter.avg:.4f}) {pps:,.0f} pts/s "
                    f"wall {dt_wall * 1e3:.0f}ms{trunc}")
        m = M.iou_from_counts(inter_sum, union_sum, target_sum)
        t_wall_ep = time.time() - t_epoch
        pps_wall = points_total / max(t_wall_ep, 1e-9)
        logger.info(
            f"Train epoch [{epoch + 1}/{epochs}]: mIoU {m['miou']:.4f} "
            f"mAcc {m['macc']:.4f} allAcc {m['all_acc']:.4f} "
            f"({t_wall_ep:.1f}s, {pps_wall:,.0f} pts/s wall; "
            f"load-wait {t_load:.1f}s upload {t_put:.1f}s "
            f"step-block {t_blk:.1f}s)")
        record = {"epoch": epoch + 1, "loss": loss_meter.avg,
                  **{k: m[k] for k in ("miou", "macc", "all_acc")}}

        if val_loader is not None and (
                (epoch + 1) % int(cfg.get("eval_freq", 1)) == 0):
            vi = np.zeros(ncls)
            vu = np.zeros(ncls)
            vt = np.zeros(ncls)
            vloss = M.AverageMeter()
            for per_dev in val_loader:
                _, _, stats = eval_fn(state, per_dev[0])
                vloss.update(float(stats["loss"]))
                vi += np.asarray(stats["intersection"])
                vu += np.asarray(stats["union"])
                vt += np.asarray(stats["target"])
            vm = M.iou_from_counts(vi, vu, vt)
            logger.info(
                f"Val epoch [{epoch + 1}]: loss {vloss.avg:.4f} "
                f"mIoU {vm['miou']:.4f} mAcc {vm['macc']:.4f} "
                f"allAcc {vm['all_acc']:.4f}")
            record.update({"val_loss": vloss.avg,
                           "val_miou": vm["miou"]})

        with open(metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if writer is not None:
            for key, value in record.items():
                if key != "epoch":
                    writer.add_scalar(key, value, epoch + 1)
        if (epoch + 1) % int(cfg.get("save_freq", 1)) == 0:
            ckpt.save(os.path.join(save_path, "ckpt"), state, epoch + 1)
    if writer is not None:
        writer.close()
    logger.info("==>Training done!")


if __name__ == "__main__":
    main()
