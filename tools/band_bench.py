"""Micro-benchmark of the Pallas band kernel alone (fwd), fp32 vs fast/bf16.

Run on the TPU:  python tools/band_bench.py [--n 8192]
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
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--w-chunk", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        band_attention)
    from __graft_entry__ import _example_batch

    print(f"devices: {jax.devices()}")
    n = args.n
    h, d = args.heads, args.dim // args.heads
    ws, qs = 0.16, 0.01

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

    plan = jax.jit(lambda: P.build_attention_plan(
        xyz, batch_ids, valid, ws, shifted=False, is_down=None,
        sparse_cap=0))()

    def run(fast, rpe):
        tq, tk, tv = tabs if rpe else (None, None, None)
        f = jax.jit(lambda q, k, v: band_attention(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, tq, tk, tv,
            window_size=ws, quant_size=qs, scale=d ** -0.5,
            band=args.band, tile=args.tile, w_chunk=args.w_chunk,
            fast=fast))
        t = timed(f, q, k, v)
        out = f(q, k, v)
        return t, out

    for rpe in (False, True):
        t32, o32 = run(False, rpe)
        tbf, obf = run(True, rpe)
        # normalised outputs for error comparison
        def norm(o):
            acc, m, den = o
            return np.asarray(acc / np.maximum(np.asarray(den), 1e-20)[
                :, :, None])
        a, bm = norm(o32), norm(obf)
        err = np.abs(a - bm).max() / (np.abs(a).max() + 1e-9)
        print(f"rpe={rpe}: fp32 {t32*1e3:.2f} ms | fast {tbf*1e3:.2f} ms "
              f"| rel-err(fast) {err:.2e}")


if __name__ == "__main__":
    main()
