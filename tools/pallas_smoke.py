"""Minimal native band_attention smoke at a given N (crash repro/bisect).

python tools/pallas_smoke.py [--n 8192] [--rpe] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=3)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--rpe", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        band_attention)

    n, h, d = args.n, args.heads, args.dim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(0, 4, size=(n, 3)).astype(np.float32))
    seg = (np.arange(n) // 128) * 128
    ss = jnp.asarray(seg.astype(np.int32))
    se = jnp.asarray((seg + 128).astype(np.int32))
    valid = jnp.ones((n,), bool)
    ws, qs = 0.16, 0.01
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tq = tk = tv = None
    if args.rpe:
        tq = jnp.asarray(
            rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        tk = jnp.asarray(
            rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        tv = jnp.asarray(
            rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)

    f = jax.jit(lambda: band_attention(
        q, k, v, xyz, ss, se, valid, tq, tk, tv,
        window_size=ws, quant_size=qs, scale=d ** -0.5, band=args.band))
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f()
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"band_attention n={n} rpe={args.rpe}: {t:.2f} ms  "
          f"acc[0,0,0]={float(out[0][0,0,0]):.4f}")


if __name__ == "__main__":
    main()
