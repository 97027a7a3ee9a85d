"""Micro-benchmark: attention backward — jnp VJP vs Pallas bwd kernels.

One stage-0-shaped block (band + sparse halves, full cRPE).
python tools/bwd_bench.py [--n 8192]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=3)
    ap.add_argument("--dim", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops import attention as A
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.ops.attention_fused import (
        stratified_attention_fused)
    from __graft_entry__ import _example_batch

    print(f"devices: {jax.devices()}")
    n = args.n
    h, d = args.heads, args.dim // args.heads
    ws, qs = 0.16, 0.01
    scale = d ** -0.5

    b = _example_batch(n, 2, 6, seed=0)
    xyz = jnp.asarray(b.xyz)
    offsets = jnp.asarray(b.offsets)
    batch_ids = S.offsets_to_batch(offsets, n)
    valid = S.offsets_to_valid(offsets, n)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tabs = [jnp.asarray(
        rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        for _ in range(3)]

    def build():
        counts = offsets - jnp.concatenate(
            [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
        d_offsets = S.counts_to_offsets(S.floor_ratio_counts(counts, 1.0 / 8))
        d_pad = n // 8 + 2
        d_idx, d_valid = S.grid_pool_sampling(
            xyz, offsets, d_offsets, d_pad, 0.04 * 8 ** 0.5)
        is_down = jnp.zeros((n,), bool).at[d_idx].set(d_valid, mode="drop")
        return P.build_attention_plan(
            xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
            sparse_cap=48, aux_pad=((d_pad + 127) // 128) * 128)

    plan = jax.jit(build)()
    kw = dict(window_size=ws, quant_size=qs, scale=scale, band=128,
              tile=128, s_band=128)

    def loss_jnp(q, k, v, a_, b_, c_):
        out = A.stratified_attention(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, sparse_band=plan.sparse_band,
            table_q=a_, table_k=b_, table_v=c_,
            rpe_precision="default", qk_precision="default", **kw)
        return jnp.sum(out * g)

    def loss_pallas(q, k, v, a_, b_, c_):
        out = stratified_attention_fused(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, sparse_band=plan.sparse_band,
            table_q=a_, table_k=b_, table_v=c_, w_chunk=64,
            rpe_precision="default", qk_precision="default", **kw)
        return jnp.sum(out * g)

    gj = jax.jit(jax.grad(loss_jnp, argnums=(0, 1, 2, 3, 4, 5)))
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5)))
    args6 = (q, k, v, *tabs)
    tj = timed(gj, *args6)
    tp = timed(gp, *args6)
    oj = gj(*args6)
    op = gp(*args6)
    names = "dq dk dv dtq dtk dtv".split()
    errs = {nm: float(np.abs(np.asarray(a) - np.asarray(b)).max()
                      / (np.abs(np.asarray(a)).max() + 1e-9))
            for nm, a, b in zip(names, oj, op)}
    print(f"fwd+bwd: jnp {tj*1e3:.1f} ms | pallas {tp*1e3:.1f} ms")
    print("rel errs:", {k_: f"{v_:.2e}" for k_, v_ in errs.items()})


if __name__ == "__main__":
    main()
