"""Component micro-benchmarks on the attached accelerator.

Times the hot ops at the S3DIS operating point: attention (fwd, fwd+bwd),
plan construction, kNN, sampling, and a full model train step. Run on TPU:

    python tools/microbench.py [--n 81920] [--scenes 2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, *args, iters=5, warmup=2):
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
    ap.add_argument("--n", type=int, default=81920)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--heads", type=int, default=3)
    ap.add_argument("--dim", type=int, default=48)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--tile-batch", type=int, default=16)
    ap.add_argument("--sparse-cap", type=int, default=48)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.ops import attention as A
    from stratified_transformer_tpu.ops import neighbors as NB
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from __graft_entry__ import _example_batch

    print(f"devices: {jax.devices()}")
    n, B = args.n, args.scenes
    h, d = args.heads, args.dim // args.heads
    ws, qs = 0.16, 0.01

    b = _example_batch(n, B, 6, seed=0)
    xyz = jnp.asarray(b.xyz)
    offsets = jnp.asarray(b.offsets)
    batch_ids = S.offsets_to_batch(offsets, n)
    valid = S.offsets_to_valid(offsets, n)
    print(f"N={n} valid={int(b.offsets[-1])}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tq = jnp.asarray(rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
    tk = jnp.asarray(rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
    tv = jnp.asarray(rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)

    is_down = jnp.asarray(rng.uniform(size=n) < 1 / 8) & valid

    @jax.jit
    def build_plan(xyz, batch_ids, valid, is_down):
        return P.build_attention_plan(
            xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
            sparse_cap=args.sparse_cap)

    t = timed(build_plan, xyz, batch_ids, valid, is_down)
    print(f"plan build: {t * 1e3:.2f} ms")
    plan = build_plan(xyz, batch_ids, valid, is_down)

    def attn(q, k, v, tq, tk, tv):
        return A.stratified_attention(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, sparse_idx=plan.sparse_idx,
            sparse_mask=plan.sparse_mask, table_q=tq, table_k=tk,
            table_v=tv, window_size=ws, quant_size=qs, scale=d ** -0.5,
            band=args.band, tile=args.tile, tile_batch=args.tile_batch)

    fwd = jax.jit(attn)
    t = timed(fwd, q, k, v, tq, tk, tv)
    print(f"attention fwd: {t * 1e3:.2f} ms "
          f"({n / t / 1e6:.1f} Mpts/s)")

    grad = jax.jit(jax.grad(
        lambda *a: jnp.sum(attn(*a)), argnums=(0, 1, 2, 3, 4, 5)))
    t = timed(grad, q, k, v, tq, tk, tv)
    print(f"attention fwd+bwd: {t * 1e3:.2f} ms")

    # kNN: TransitionDown operating point (m = n/4 queries, k=16)
    m = n // 4
    qxyz = xyz[:m]
    qb = batch_ids[:m]
    knn_j = jax.jit(lambda a, bq, r, rb, val: NB.knn(
        a, bq, r, rb, val, 16, chunk=1024))
    t = timed(knn_j, qxyz, qb, xyz, batch_ids, valid)
    print(f"knn(m={m}, k=16): {t * 1e3:.2f} ms")

    # grid-pool sampling
    counts = offsets - jnp.concatenate(
        [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
    new_off = S.counts_to_offsets(S.floor_ratio_counts(counts, 0.125))
    gp = jax.jit(lambda x, o, no: S.grid_pool_sampling(
        x, o, no, n // 8 + B, 0.11))
    t = timed(gp, xyz, offsets, new_off)
    print(f"grid_pool_sampling: {t * 1e3:.2f} ms")

    if not args.skip_model:
        from stratified_transformer_tpu.models.stratified import (
            Stratified, StratifiedConfig)
        from stratified_transformer_tpu.train.schedulers import multi_step
        from stratified_transformer_tpu.train.state import create_train_state
        from stratified_transformer_tpu.train.step import make_train_step

        cfg = StratifiedConfig(
            num_classes=13, in_channels=6, n_pad=n, num_scenes=B,
            band=args.band, tile=args.tile, sparse_cap=args.sparse_cap,
            sampler="grid")
        model = Stratified(cfg)
        batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
                 "labels": b.labels}
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (batch["feats"], batch["xyz"], batch["offsets"]),
            multi_step(0.006, [60, 80]))
        step = jax.jit(make_train_step(255, 13))
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, stats = step(state, batch, key)
        jax.block_until_ready(stats["loss"])
        print(f"train step compile+1st: {time.perf_counter() - t0:.1f} s")
        t = timed(lambda s: step(s, batch, key)[1], state, iters=5)
        pts = int(stats["points"])
        print(f"train step: {t * 1e3:.1f} ms ({pts / t:,.0f} pts/s)")


if __name__ == "__main__":
    main()
