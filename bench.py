"""Benchmark harness: train-step throughput (points/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is reported against this framework's own first recorded
number when available (``bench_baseline.json``), else 1.0.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from __graft_entry__ import _example_batch

    # S3DIS-scale operating point: ~40k points over 2 scenes on one chip
    # (the reference trains batch 8 over 4 GPUs = 2 scenes/GPU,
    # config/s3dis yaml: batch_size 8, train_gpu [0,1,2,3]).
    n_pad = 40_960
    num_scenes = 2
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=n_pad, num_scenes=num_scenes,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        # production settings (match configs/s3dis_stratified.yaml):
        # bf16 MXU passes for cRPE one-hot contractions + QK/PV matmuls;
        # per-stage bands sized for <1% in-window pair truncation
        band_per_stage=(128, 128, 384, 192),
        rpe_precision="default", qk_precision="default",
        # Pallas fused kernels (stages 0-1) — stable with the small-program
        # warmup below (docs/PERF_NOTES.md round-2 addendum)
        attn_impl="fused", fused_stages=2, attn_bwd="pallas")
    model = Stratified(cfg)

    from stratified_transformer_tpu.data.collate import with_stem_neighbors
    b = _example_batch(n_pad, num_scenes, cfg.in_channels)
    # stem ball-query on the host (prefetched by the train loader in
    # production — train.py overlaps it with the device step)
    b = with_stem_neighbors(
        b, radius=2.5 * cfg.grid_size * cfg.sigma, k=cfg.max_num_neighbors)
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels, "stem_nidx": b.stem_nidx,
             "stem_nmask": b.stem_nmask,
             # host-built geometry pyramid (prefetched by the train loader
             # in production, overlapped with the device step)
             "pyramid": build_geometry_pyramid(b.xyz, b.offsets, cfg)}

    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    fused_attention_warmup(cfg)

    schedule = multi_step(0.006, [60, 80], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    # NOTE: buffer donation + Pallas custom calls trips an axon-runtime
    # InvalidArgument on repeat executions (docs/PERF_NOTES.md); donation
    # saves only ~150 MB of parameter/optimizer copies here, so it is
    # enabled only on the non-Pallas path.
    donate = (0,) if cfg.attn_impl != "fused" else ()
    step = jax.jit(
        make_train_step(ignore_label=255, num_classes=13),
        donate_argnums=donate)

    rng = jax.random.PRNGKey(1)
    # compile + warmup
    state, stats = step(state, batch, rng)
    jax.block_until_ready(stats["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, batch, rng)
    jax.block_until_ready(stats["loss"])
    dt = (time.perf_counter() - t0) / iters

    points = int(stats["points"])
    pps = points / dt

    base_path = os.path.join(os.path.dirname(__file__),
                             "bench_baseline.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            vs = pps / json.load(f)["value"]
    print(json.dumps({
        "metric": "train_points_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
