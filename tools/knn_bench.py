"""Micro-bench the grid_knn pipeline pieces at the stem operating point.

python tools/knn_bench.py [--n 40960]
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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--k", type=int, default=34)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from stratified_transformer_tpu.ops import neighbors as NB
    from stratified_transformer_tpu.ops import sampling as S
    from __graft_entry__ import _example_batch

    print(f"devices: {jax.devices()}")
    n, k = args.n, args.k
    b = _example_batch(n, 2, 6, seed=0)
    xyz = jnp.asarray(b.xyz)
    offsets = jnp.asarray(b.offsets)
    batch = S.offsets_to_batch(offsets, n)
    valid = S.offsets_to_valid(offsets, n)
    radius = 2.5 * 0.04 * 1.0

    f_grid = jax.jit(lambda: NB.radius_neighbors(
        xyz, batch, xyz, batch, valid, radius, k, method="grid", cap=32))
    print(f"grid topk: {timed(f_grid):.2f} ms")

    f_gx = jax.jit(lambda: NB.radius_neighbors(
        xyz, batch, xyz, batch, valid, radius, k, method="grid", cap=32,
        selector="approx"))
    try:
        t = timed(f_gx)
        ia, ma = f_gx()
        ib, mb = f_grid()
        # recall: fraction of real neighbors found vs exact
        print(f"grid approx: {t:.2f} ms  "
              f"(neighbors/query approx {ma.sum() / valid.sum():.2f} "
              f"vs exact {mb.sum() / valid.sum():.2f})")
    except Exception as e:
        print(f"approx failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
