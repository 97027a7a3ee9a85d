"""Per-stage attention timing (jnp production path) at S3DIS configs.

For each stage: band-only, band+sparse, fwd and fwd+bwd, at production
precision; plus the Pallas band kernel fwd for comparison.

python tools/attn_stages.py
"""

from __future__ import annotations

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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
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
    # (stage, N_pad, h, blocks, window, quant, downsample_scale)
    stages = [
        (0, 40960, 3, 2, 0.16, 0.01),
        (1, 10368, 6, 2, 0.32, 0.02),
        (2, 2688, 12, 6, 0.64, 0.04),
        (3, 768, 24, 2, 1.28, 0.08),
    ]
    d = 16
    total_fb = 0.0
    for (si, n, h, blocks, ws, qs) in stages:
        npad = ((n + 127) // 128) * 128
        b = _example_batch(npad, 2, 6, seed=si)
        xyz = jnp.asarray(b.xyz)
        offsets = jnp.asarray(b.offsets)
        batch_ids = S.offsets_to_batch(offsets, npad)
        valid = S.offsets_to_valid(offsets, npad)
        rng = np.random.default_rng(si)
        q = jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
        nbins = 2 * int((2 * ws + 1e-4) // qs)
        tabs = [jnp.asarray(
            rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
            for _ in range(3)]
        is_down = jnp.asarray(rng.uniform(size=npad) < 1 / 8) & valid
        aux_pad = ((npad // 8 + 2 + 127) // 128) * 128
        plan = jax.jit(lambda: P.build_attention_plan(
            xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
            sparse_cap=48, aux_pad=aux_pad))()

        kw = dict(window_size=ws, quant_size=qs, scale=d ** -0.5,
                  band=128, tile=128, tile_batch=16,
                  rpe_precision="default", qk_precision="default")

        def attn(q, k, v, t0, t1, t2, sb):
            return A.stratified_attention(
                q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, table_q=t0, table_k=t1, table_v=t2,
                sparse_band=sb, **kw)

        f_band = jax.jit(lambda q, k, v: attn(q, k, v, *tabs, None))
        f_full = jax.jit(
            lambda q, k, v: attn(q, k, v, *tabs, plan.sparse_band))
        g_full = jax.jit(jax.grad(
            lambda *a: jnp.sum(attn(*a, plan.sparse_band)),
            argnums=(0, 1, 2, 3, 4, 5)))
        t_band = timed(f_band, q, k, v)
        t_full = timed(f_full, q, k, v)
        t_grad = timed(g_full, q, k, v, *tabs)

        f_pal = jax.jit(lambda q, k, v: band_attention(
            q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, *tabs, window_size=ws, quant_size=qs,
            scale=d ** -0.5, band=128, tile=128, w_chunk=128))
        t_pal = timed(f_pal, q, k, v)

        stage_fb = t_grad * blocks
        total_fb += stage_fb
        print(f"stage{si} N={npad} h={h} x{blocks}: "
              f"band {t_band:.1f} | +sparse {t_full:.1f} | "
              f"fwd+bwd {t_grad:.1f} (x{blocks} = {stage_fb:.0f}) | "
              f"pallas-band {t_pal:.1f} ms")
    print(f"total attention fwd+bwd: {total_fb:.0f} ms (x2 parities shared)")


if __name__ == "__main__":
    main()
