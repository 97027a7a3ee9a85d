"""Decompose the 40k-point train step: time each model phase on the chip.

Times, at the bench operating point (N=40960, 2 scenes, S3DIS config):
stem radius-neighbors, KPConv stem, per-stage plan build, per-stage
attention blocks (fwd / fwd+bwd), TransitionDown (sampling+kNN+pool),
Upsample 3-NN, heads — then full forward and full train step for the
residual. Run: python tools/profile_step.py [--n 40960]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, *args, iters=5, warmup=2):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--scenes", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.ops import neighbors as NB
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from __graft_entry__ import _example_batch

    n, B = args.n, args.scenes
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=n, num_scenes=B,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        rpe_precision="default", qk_precision="default")
    model = Stratified(cfg)
    b = _example_batch(n, B, 6, seed=0)
    feats = jnp.asarray(b.feats)
    xyz = jnp.asarray(b.xyz)
    offsets = jnp.asarray(b.offsets)
    batch_ids = S.offsets_to_batch(offsets, n)
    valid = S.offsets_to_valid(offsets, n)
    print(f"devices: {jax.devices()}  N={n} valid={int(b.offsets[-1])}")

    # --- stem neighbor search (radius, grid cell-list) ---
    radius = 2.5 * cfg.grid_size * cfg.sigma
    f = jax.jit(lambda: NB.radius_neighbors(
        xyz, batch_ids, xyz, batch_ids, valid, radius,
        cfg.max_num_neighbors, chunk=cfg.knn_chunk,
        method=cfg.neighbor_method, cap=cfg.neighbor_cap))
    print(f"stem radius_neighbors: {timed(f):.1f} ms")

    # --- per-stage plan build (with stratified is_down) ---
    rng = np.random.default_rng(0)
    grids = cfg.grid_sizes() if hasattr(cfg, "grid_sizes") else None
    n_i, xyz_i, off_i = n, xyz, offsets
    for i in range(cfg.num_layers):
        ws = cfg.patch_size * cfg.grid_size * cfg.window_size * (2 ** i) \
            if not hasattr(cfg, "window_sizes") else cfg.window_sizes()[i]
        bi = S.offsets_to_batch(off_i, n_i)
        vi = S.offsets_to_valid(off_i, n_i)
        is_down = jnp.asarray(rng.uniform(size=n_i) < 1 / 8) & vi
        aux_pad = ((n_i // 4 + 127) // 128) * 128
        f = jax.jit(lambda xyz_i=xyz_i, bi=bi, vi=vi, ws=ws,
                    is_down=is_down, aux_pad=aux_pad: P.build_attention_plan(
                        xyz_i, bi, vi, ws, shifted=False, is_down=is_down,
                        sparse_cap=cfg.sparse_cap, aux_pad=aux_pad))
        t = timed(f)
        print(f"stage{i} N={n_i} plan build: {t:.1f} ms  (x2 parities)")
        if i < cfg.num_layers - 1:
            n_next = max(1, int(n_i // 4 + 128) // 128 * 128)
            m = int(off_i[-1]) // 4
            xyz_i = xyz_i[:n_next]
            off_i = jnp.asarray(
                [m // B * (j + 1) for j in range(B)], jnp.int32)
            n_i = n_next

    # --- TransitionDown kNN at stage-0 scale (grid cell-list) ---
    m0 = ((n // 4) + 127) // 128 * 128
    q_xyz = xyz[:m0]
    q_b = batch_ids[:m0]
    f = jax.jit(lambda: NB.grid_knn(
        q_xyz, q_b, xyz, batch_ids, valid, cfg.k,
        cell=cfg.grid_size * 3.0, cap=cfg.neighbor_cap))
    print(f"down0 grid_knn(m={m0},k={cfg.k}): {timed(f):.1f} ms")

    # --- full forward ---
    schedule = multi_step(0.006, [60, 80], 0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (feats, xyz, offsets), schedule)

    fwd = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, feats, xyz, offsets,
        training=False))
    print(f"forward (eval): "
          f"{timed(fwd, state.params, state.batch_stats):.1f} ms")

    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels}
    step = jax.jit(make_train_step(ignore_label=255, num_classes=13),
                   donate_argnums=(0,))
    rngk = jax.random.PRNGKey(1)
    state2, stats = step(state, batch, rngk)
    jax.block_until_ready(stats["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state2, stats = step(state2, batch, rngk)
    jax.block_until_ready(stats["loss"])
    t = (time.perf_counter() - t0) / iters * 1e3
    print(f"train step: {t:.1f} ms ({n / t * 1e3:,.0f} pts/s)")


if __name__ == "__main__":
    main()
