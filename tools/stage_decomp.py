"""Decompose one stage's attention cost by cRPE term (band path, fwd).

For the given stage at its PRODUCTION geometry (band_per_stage widths),
times the jnp band+sparse forward with each cRPE term toggled:

    full | -rel_value | -rel_key | -rel_query | none

plus a tile_batch sweep, and the Pallas band kernel for reference. This
answers VERDICT r3 #5's "where does the stage-2 one-hot traffic actually
go" before committing to a restructure (factorized/Toeplitz cRPE or a
head-looped kernel).

python tools/stage_decomp.py [--stage 2] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

STAGES = {
    0: (40960, 3, 2, 0.16, 0.01, 128),
    1: (10368, 6, 2, 0.32, 0.02, 128),
    2: (2688, 12, 6, 0.64, 0.04, 384),
    3: (768, 24, 2, 1.28, 0.08, 192),
}


def timed(fn, *args, iters=5, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd per variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops import attention as A
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        band_attention)
    from __graft_entry__ import _example_batch

    print(f"devices: {jax.devices()}")
    si = args.stage
    n, h, blocks, ws, qs, band = STAGES[si]
    d = 16
    npad = ((n + 127) // 128) * 128
    b = _example_batch(npad, 2, 6, seed=si)
    xyz = jnp.asarray(b.xyz)
    offsets = jnp.asarray(b.offsets)
    batch_ids = S.offsets_to_batch(offsets, npad)
    valid = S.offsets_to_valid(offsets, npad)
    rng = np.random.default_rng(si)
    q, k, v = (jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
               for _ in range(3))
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tabs = [jnp.asarray(
        rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        for _ in range(3)]
    is_down = jnp.asarray(rng.uniform(size=npad) < 1 / 8) & valid
    aux_pad = ((npad // 8 + 2 + 127) // 128) * 128
    plan = jax.jit(lambda: P.build_attention_plan(
        xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
        sparse_cap=48, aux_pad=aux_pad))()
    print(f"stage{si}: npad={npad} h={h} band={band} nbins={nbins} "
          f"x{blocks} blocks")

    def run(tq, tk, tv, tile_batch=16, use_sparse=True):
        kw = dict(window_size=ws, quant_size=qs, scale=d ** -0.5,
                  band=band, tile=128, tile_batch=tile_batch,
                  rpe_precision="default", qk_precision="default")
        return A.stratified_attention(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, table_q=tq, table_k=tk, table_v=tv,
            sparse_band=plan.sparse_band if use_sparse else None, **kw)

    variants = [
        ("full", tabs[0], tabs[1], tabs[2]),
        ("-rel_value", tabs[0], tabs[1], None),
        ("-rel_key", tabs[0], None, tabs[2]),
        ("-rel_query", None, tabs[1], tabs[2]),
        ("qk-only", tabs[0], tabs[1], None),
        ("none", None, None, None),
    ]
    for name, tq, tk, tv in variants:
        f = jax.jit(lambda tq=tq, tk=tk, tv=tv: run(tq, tk, tv))
        t = timed(f, iters=args.iters)
        extra = ""
        if args.grad:
            g = jax.jit(jax.grad(
                lambda q_, k_, v_, tq=tq, tk=tk, tv=tv: jnp.sum(
                    A.stratified_attention(
                        q_, k_, v_, plan.xyz_sorted, plan.seg_start,
                        plan.seg_end, plan.valid_sorted, table_q=tq,
                        table_k=tk, table_v=tv,
                        sparse_band=plan.sparse_band,
                        window_size=ws, quant_size=qs, scale=d ** -0.5,
                        band=band, tile=128, tile_batch=16,
                        rpe_precision="default", qk_precision="default")),
                argnums=(0, 1, 2)))
            extra = f" | fwd+bwd {timed(g, q, k, v, iters=args.iters):.1f}"
        print(f"  {name:>11}: {t:6.1f} ms{extra}")

    for tb in (4, 8, 32):
        f = jax.jit(lambda tb=tb: run(*tabs, tile_batch=tb))
        print(f"  tile_batch={tb:>2}: {timed(f, iters=args.iters):6.1f} ms")
    f = jax.jit(lambda: run(*tabs, use_sparse=False))
    print(f"  band-only   : {timed(f, iters=args.iters):6.1f} ms")

    f_pal = jax.jit(lambda: band_attention(
        q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
        plan.valid_sorted, *tabs, window_size=ws, quant_size=qs,
        scale=d ** -0.5, band=band, tile=128, w_chunk=128))
    print(f"  pallas-band : {timed(f_pal, iters=args.iters):6.1f} ms")


if __name__ == "__main__":
    main()
