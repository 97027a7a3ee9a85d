"""Data-parallel weak-scaling harness.

Runs the sharded train step (`parallel.dp.make_dp_train_step`) over meshes of
1..D devices with a fixed per-device batch and reports points/sec and weak
scaling efficiency (the reference's only parallelism is single-node DP via
DDP, SURVEY.md §2.2-E; BASELINE.md sets >=80% efficiency at N>=2 hosts as the
target). On this container multi-chip hardware is unavailable, so the
harness defaults to a virtual CPU mesh (`--platform cpu`) — the same code
path (`shard_map` + grad pmean + SyncBN psum over ICI) runs unmodified on a
real pod slice; only the device list changes.

python tools/scaling_bench.py [--devices 8] [--n 2048]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n", type=int, default=2048, help="points per device")
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "native"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--production", action="store_true",
                    help="production 4-stage S3DIS architecture (shrunk "
                         "n_pad) instead of the 2-stage probe model")
    ap.add_argument("--baseline", action="store_true",
                    help="also time the UNSHARDED single-device step "
                         "(isolates shard_map/collective harness overhead "
                         "from device-count scaling)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_num_cpu_devices", args.devices)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_scaling_cache")

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.parallel.dp import (
        make_dp_train_step, shard_batch)
    from stratified_transformer_tpu.parallel.mesh import make_mesh
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from __graft_entry__ import _example_batch

    if args.production:
        cfg = StratifiedConfig(
            num_classes=13, in_channels=6, channels=(48, 96, 192, 384),
            depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), num_layers=4,
            n_pad=args.n, num_scenes=args.scenes, band=128,
            band_per_stage=(128, 128, 384, 192), tile=128, sparse_cap=48,
            sampler="grid", bn_axis_name="data")
    else:
        cfg = StratifiedConfig(
            num_classes=13, in_channels=6, channels=(16, 32), depths=(1, 1),
            num_heads=(2, 4), num_layers=2, n_pad=args.n,
            num_scenes=args.scenes, band=32, tile=32, sparse_cap=16,
            sampler="grid", bn_axis_name="data")
    model = Stratified(cfg)

    results = []
    if args.baseline:
        # Unsharded single-device step, same per-device work: quantifies the
        # pure sharding machinery overhead (shard_map + pmean/psum at d=1
        # lower to no-op collectives; any delta vs this is harness cost).
        import dataclasses

        from stratified_transformer_tpu.train.step import make_train_step

        b0 = _example_batch(cfg.n_pad, cfg.num_scenes, 6, seed=0)
        batch0 = {"feats": b0.feats, "xyz": b0.xyz, "offsets": b0.offsets,
                  "labels": b0.labels}
        # plain BN outside shard_map (psum needs a bound mesh axis; the BN
        # moment math is identical to SyncBN at d=1)
        model0 = Stratified(dataclasses.replace(cfg, bn_axis_name=None))
        state = create_train_state(
            model0, jax.random.PRNGKey(0),
            (b0.feats, b0.xyz, b0.offsets), multi_step(0.006, [60, 80], 0.1))
        step = jax.jit(make_train_step(ignore_label=255, num_classes=13))
        rng = jax.random.PRNGKey(1)
        state, stats = step(state, batch0, rng)
        jax.block_until_ready(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, stats = step(state, batch0, rng)
        jax.block_until_ready(stats["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results.append({"devices": 0, "points_per_sec":
                        round(int(stats["points"]) / dt, 1),
                        "step_ms": round(dt * 1e3, 2),
                        "weak_scaling_efficiency": None,
                        "note": "unsharded single-device baseline"})
        print(json.dumps(results[-1]), flush=True)

    base_pps = None
    d_list = [d for d in (1, 2, 4, 8, 16, 32) if d <= args.devices]
    for d in d_list:
        mesh = make_mesh(d)
        batches = [
            {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels}
            for b in (_example_batch(cfg.n_pad, cfg.num_scenes, 6, seed=s)
                      for s in range(d))
        ]
        sharded = shard_batch(batches, mesh)
        b0 = batches[0]
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (b0["feats"], b0["xyz"], b0["offsets"]),
            multi_step(0.006, [60, 80], 0.1))
        step = make_dp_train_step(mesh, ignore_label=255, num_classes=13)
        rng = jax.random.PRNGKey(1)
        state, stats = step(state, sharded, rng)
        jax.block_until_ready(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, stats = step(state, sharded, rng)
        jax.block_until_ready(stats["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        pps = int(stats["points"]) / dt       # stats psum'd over mesh
        if base_pps is None:
            base_pps = pps
        eff = pps / (base_pps * d)
        results.append({"devices": d, "points_per_sec": round(pps, 1),
                        "step_ms": round(dt * 1e3, 2),
                        "weak_scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
