"""Fused-path stability experiment: full S3DIS-scale train step, N iters.

Runs the production train step (attn_impl configurable) in THIS process and
reports per-iteration wall time + loss, catching and classifying any runtime
failure. Used to (in)validate the round-1 "axon INVALID_ARGUMENT" instability
(docs/PERF_NOTES.md addendum) under clean conditions — fresh process, no
prior kills, one process on the chip.

Usage:
    python tools/stability_run.py --iters 100 --impl fused --bwd pallas
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--impl", default="fused",
                    choices=["fused", "reference"])
    ap.add_argument("--bwd", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--fused-stages", type=int, default=2)
    ap.add_argument("--n-pad", type=int, default=40_960)
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--reseed", action="store_true",
                    help="new data each iter (exercises plan variability)")
    ap.add_argument("--no-thread", action="store_true",
                    help="do NOT feed the output state back in (isolates "
                         "the output->input feedback link)")
    ap.add_argument("--launder", default="none",
                    choices=["none", "copy", "host"],
                    help="pass the output state through a copy (device "
                         "round-trip) before reuse")
    ap.add_argument("--sleep", type=float, default=0.0,
                    help="sleep between iterations (dispatch-race probe)")
    ap.add_argument("--warmup", action="store_true",
                    help="execute a small standalone Pallas program before "
                         "the big one (init-order workaround test)")
    ap.add_argument("--warmup-fwd", action="store_true",
                    help="execute a small same-config model forward before "
                         "the big program (kernel-binary preload probe)")
    ap.add_argument("--occupancy", type=float, default=1.0,
                    help="fraction of n_pad filled with valid points "
                         "(train.py's voxel_max batches run ~0.5; probes "
                         "content-dependence of the runtime fault)")
    ap.add_argument("--no-production-warmup", action="store_true",
                    help="SKIP utils/warmup.fused_attention_warmup (the "
                         "workaround every production consumer applies); "
                         "skipping reproduces the first-Mosaic-program "
                         "crash at exec#2 (docs/PERF_NOTES.md)")
    args = ap.parse_args()

    import jax
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from stratified_transformer_tpu.data.collate import with_stem_neighbors
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    from __graft_entry__ import _example_batch

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=args.n_pad, num_scenes=2,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        band_per_stage=(128, 128, 384, 192),
        rpe_precision="default", qk_precision="default",
        attn_impl=args.impl, fused_stages=args.fused_stages,
        attn_bwd=args.bwd)
    model = Stratified(cfg)

    def make_batch(seed):
        import numpy as np
        n_eff = args.n_pad
        if args.occupancy < 1.0:
            n_eff = max(
                256, int(args.n_pad * args.occupancy) // cfg.tile * cfg.tile)
        b = _example_batch(n_eff, 2, cfg.in_channels, seed=seed)
        if n_eff < args.n_pad:
            # re-pad to the full static capacity: valid points unchanged,
            # tail is zero/ignore padding exactly like a voxel_max-limited
            # train.py batch (_replace keeps any future PaddedBatch fields)
            pad = args.n_pad - n_eff
            b = b._replace(
                feats=np.pad(b.feats, ((0, pad), (0, 0))),
                xyz=np.pad(b.xyz, ((0, pad), (0, 0))),
                labels=np.pad(b.labels, (0, pad), constant_values=255))
        b = with_stem_neighbors(
            b, radius=2.5 * cfg.grid_size * cfg.sigma,
            k=cfg.max_num_neighbors)
        return {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
                "labels": b.labels, "stem_nidx": b.stem_nidx,
                "stem_nmask": b.stem_nmask,
                "pyramid": build_geometry_pyramid(b.xyz, b.offsets, cfg)}

    if args.warmup:
        import jax.numpy as jnp
        from stratified_transformer_tpu.ops.pallas.fused_attention import (
            band_attention)
        nw, h, d = 1024, 3, 16
        rk = jax.random.PRNGKey(9)
        qw = jax.random.normal(rk, (nw, h, d), jnp.float32)
        xw = jax.random.uniform(rk, (nw, 3), jnp.float32)
        seg = jnp.arange(nw, dtype=jnp.int32)
        ssw, sew = (seg // 32) * 32, (seg // 32) * 32 + 32
        tbl = jax.random.normal(rk, (64, h, d, 3), jnp.float32) * 0.02

        @jax.jit
        def wfn(q):
            acc, m, den = band_attention(
                q, q, q, xw, ssw, sew, jnp.ones((nw,), bool),
                tbl, tbl, tbl, window_size=0.16, quant_size=0.01,
                scale=0.25, band=128, fast=True)
            return acc.sum()
        t0 = time.perf_counter()
        for _ in range(2):
            jax.block_until_ready(wfn(qw))
        print(f"[stability] pallas warmup done "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    if args.warmup_fwd:
        import dataclasses
        t0 = time.perf_counter()
        wn = 2048
        wcfg = dataclasses.replace(cfg, n_pad=wn)
        wmodel = Stratified(wcfg)
        wb = _example_batch(wn, 2, cfg.in_channels, seed=777)
        wvars = wmodel.init(jax.random.PRNGKey(3), wb.feats, wb.xyz,
                            wb.offsets)

        @jax.jit
        def wfwd(feats, xyz, offsets):
            out = wmodel.apply(wvars, feats, xyz, offsets, training=False)
            return out[0].sum()
        for _ in range(2):
            jax.block_until_ready(wfwd(wb.feats, wb.xyz, wb.offsets))
        print(f"[stability] fwd warmup done "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    if args.impl == "fused" and not args.no_production_warmup:
        from stratified_transformer_tpu.utils.warmup import (
            fused_attention_warmup)
        fused_attention_warmup(cfg)
        print("[stability] production warmup done "
              "(utils/warmup.fused_attention_warmup)", flush=True)

    batch = make_batch(0)
    schedule = multi_step(0.006, [60, 80], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
    donate = (0,) if args.donate else ()
    step = jax.jit(make_train_step(ignore_label=255, num_classes=13),
                   donate_argnums=donate)

    def mem():
        try:
            s = jax.local_devices()[0].memory_stats() or {}
            return (f"in_use={s.get('bytes_in_use', -1)/2**30:.2f}G "
                    f"peak={s.get('peak_bytes_in_use', -1)/2**30:.2f}G "
                    f"limit={s.get('bytes_limit', -1)/2**30:.2f}G")
        except Exception as e:  # plugin may not implement it
            return f"mem_stats_unavailable({type(e).__name__})"

    rng = jax.random.PRNGKey(1)
    print(f"[stability] impl={args.impl} bwd={args.bwd} "
          f"fused_stages={args.fused_stages} n={args.n_pad} "
          f"donate={args.donate} reseed={args.reseed}", flush=True)
    t0 = time.perf_counter()
    ok = 0
    try:
        for i in range(args.iters):
            if args.sleep and i > 0:
                time.sleep(args.sleep)
            if args.reseed and i > 0:
                batch = make_batch(i)
            ts = time.perf_counter()
            new_state, stats = step(state, batch, rng)
            if not args.no_thread:
                state = new_state
                if args.launder == "copy":
                    state = jax.tree.map(lambda x: x.copy(), state)
                elif args.launder == "host":
                    state = jax.device_put(jax.tree.map(
                        lambda x: jax.device_get(x), state))
            loss = float(stats["loss"])
            dt = time.perf_counter() - ts
            ok += 1
            if i < 3 or (i + 1) % 10 == 0:
                print(f"[stability] iter {i:4d} loss={loss:.4f} "
                      f"dt={dt*1e3:.1f}ms {mem()}", flush=True)
    except Exception:
        traceback.print_exc()
        print(json.dumps({"result": "FAIL", "ok_iters": ok,
                          "impl": args.impl, "bwd": args.bwd,
                          "donate": args.donate}), flush=True)
        sys.exit(1)
    total = time.perf_counter() - t0
    pts = args.n_pad * ok / total
    print(json.dumps({"result": "OK", "ok_iters": ok,
                      "impl": args.impl, "bwd": args.bwd,
                      "donate": args.donate,
                      "pts_per_sec": round(pts, 1)}), flush=True)


if __name__ == "__main__":
    main()
