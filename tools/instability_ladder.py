"""Bisect the fused-path runtime instability: run programs of increasing
size in ONE process, several executions each, and report the first program
whose re-execution fails (docs/PERF_NOTES.md round-1 addendum).

python tools/instability_ladder.py [--n-pad 8192] [--iters 4] [--upto P5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(tag, fn, iters):
    print(f"--- {tag}: compiling...", flush=True)
    t0 = time.perf_counter()
    try:
        import jax
        out = fn()
        jax.block_until_ready(out)
        print(f"--- {tag}: exec#1 ok ({time.perf_counter()-t0:.0f}s)",
              flush=True)
        for i in range(1, iters):
            out = fn()
            jax.block_until_ready(out)
            print(f"--- {tag}: exec#{i+1} ok", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"--- {tag}: FAIL", flush=True)
        return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pad", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--skip", default="",
                    help="comma list of tags to skip, e.g. P1,P2")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    import jax
    import jax.numpy as jnp
    import numpy as np
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

    n = args.n_pad
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=n, num_scenes=2,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        band_per_stage=(128, 128, 384, 192),
        rpe_precision="default", qk_precision="default",
        attn_impl="fused", fused_stages=2, attn_bwd="pallas")
    model = Stratified(cfg)

    b = _example_batch(n, 2, cfg.in_channels)
    b = with_stem_neighbors(b, radius=2.5 * cfg.grid_size * cfg.sigma,
                            k=cfg.max_num_neighbors)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels, "stem_nidx": b.stem_nidx,
             "stem_nmask": b.stem_nmask,
             "pyramid": build_geometry_pyramid(b.xyz, b.offsets, cfg)}
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]),
        multi_step(0.006, [60, 80], 0.1))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rng = jax.random.PRNGKey(1)

    # P1: one band kernel op
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        band_attention)
    rk = jax.random.PRNGKey(2)
    h, d = 3, 16
    q = jax.random.normal(rk, (n, h, d), jnp.float32)
    xyz = jnp.asarray(batch["xyz"])
    seg = jnp.arange(n, dtype=jnp.int32)
    ss = (seg // 32) * 32
    se = ss + 32
    valid = jnp.ones((n,), bool)
    tbl = jax.random.normal(rk, (64, h, d, 3), jnp.float32) * 0.02

    @jax.jit
    def p1(q):
        acc, m, den = band_attention(
            q, q, q, xyz, ss, se, valid, tbl, tbl, tbl,
            window_size=0.16, quant_size=0.01, scale=0.25, band=128,
            fast=True)
        return acc.sum()

    # P2: model forward (eval)
    @jax.jit
    def p2(feats, xyz_, offsets):
        out = model.apply(variables, feats, xyz_, offsets, training=False,
                          stem_nidx=batch["stem_nidx"],
                          stem_nmask=batch["stem_nmask"])
        return out[0].sum()

    # P3: grad wrt params, eval mode, sum^2 loss
    @jax.jit
    def p3(params, feats, xyz_, offsets):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                feats, xyz_, offsets, training=False,
                stem_nidx=batch["stem_nidx"],
                stem_nmask=batch["stem_nmask"])
            return (out[0] ** 2).sum()
        g = jax.grad(loss_fn)(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), g, jnp.float32(0))

    # P4: grad + CE + metrics (training mode, batch_stats threaded)
    step_fn = make_train_step(ignore_label=255, num_classes=13)

    @jax.jit
    def p5(st, bt, r):
        return step_fn(st, bt, r)

    ladder = [
        ("P1_band_op", lambda: p1(q)),
        ("P2_forward", lambda: p2(batch["feats"], batch["xyz"],
                                  batch["offsets"])),
        ("P3_grad_eval", lambda: p3(state.params, batch["feats"],
                                    batch["xyz"], batch["offsets"])),
        ("P5_train_step", lambda: p5(state, batch, rng)[1]["loss"]),
    ]
    for tag, fn in ladder:
        if tag in skip:
            print(f"--- {tag}: skipped", flush=True)
            continue
        if not run(tag, fn, args.iters):
            print(f"LADDER RESULT: first failure at {tag}", flush=True)
            return
    print("LADDER RESULT: all programs stable", flush=True)


if __name__ == "__main__":
    main()
