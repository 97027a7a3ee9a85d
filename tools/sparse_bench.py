"""Micro-benchmark: stratified sparse (far-key) half — jnp band layout vs
the Pallas sparse kernel; fp32 vs fast/bf16; parity check against the jnp
path.

Run on the TPU:  python tools/sparse_bench.py [--n 8192]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, *args, iters=10, warmup=3):
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
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--s-band", type=int, default=128)
    ap.add_argument("--w-chunk", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops import attention as A
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        sparse_band_attention)
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
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tabs = [jnp.asarray(
        rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        for _ in range(3)]

    # stage-0 style downsampled member set (grid pool 1/8)
    def build():
        counts = offsets - jnp.concatenate(
            [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
        d_counts = S.floor_ratio_counts(counts, 1.0 / 8)
        d_offsets = S.counts_to_offsets(d_counts)
        d_pad = n // 8 + 2
        cell = 0.04 * 8 ** 0.5
        d_idx, d_valid = S.grid_pool_sampling(
            xyz, offsets, d_offsets, d_pad, cell)
        is_down = jnp.zeros((n,), bool).at[d_idx].set(d_valid, mode="drop")
        aux_pad = ((d_pad + 127) // 128) * 128
        return P.build_attention_plan(
            xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
            sparse_cap=48, aux_pad=aux_pad)

    plan = jax.jit(build)()
    sb = plan.sparse_band
    o = plan.order
    qs_, ks_, vs_ = q, k, v  # already "sorted" stand-ins

    def norm(o3):
        acc, m, den = o3
        return np.asarray(acc) / np.maximum(np.asarray(den), 1e-20)[
            :, :, None]

    def run_jnp(rpe):
        tq, tk, tv = tabs if rpe else (None, None, None)
        f = jax.jit(lambda q, k, v: A.sparse_band_triple(
            q, k, v, plan.xyz_sorted, sb, table_q=tq, table_k=tk,
            table_v=tv, window_size=ws, quant_size=qs, scale=scale,
            s_band=args.s_band, tile=args.tile))
        return timed(f, qs_, ks_, vs_), f(qs_, ks_, vs_)

    def run_pallas(rpe, fast):
        tq, tk, tv = tabs if rpe else (None, None, None)
        f = jax.jit(lambda q, k, v: sparse_band_attention(
            q, k, v, sb, table_q=tq, table_k=tk, table_v=tv,
            window_size=ws, quant_size=qs, scale=scale,
            s_band=args.s_band, tile=args.tile, w_chunk=args.w_chunk,
            fast=fast))
        return timed(f, qs_, ks_, vs_), f(qs_, ks_, vs_)

    for rpe in (False, True):
        tj, oj = run_jnp(rpe)
        tp, op = run_pallas(rpe, False)
        tf, of = run_pallas(rpe, True)
        a = norm(oj)
        scale_ref = np.abs(a).max() + 1e-9
        err32 = np.abs(norm(op) - a).max() / scale_ref
        errbf = np.abs(norm(of) - a).max() / scale_ref
        print(f"rpe={rpe}: jnp {tj*1e3:.2f} ms | pallas {tp*1e3:.2f} ms "
              f"(err {err32:.2e}) | pallas-fast {tf*1e3:.2f} ms "
              f"(err {errbf:.2e})")


if __name__ == "__main__":
    main()
