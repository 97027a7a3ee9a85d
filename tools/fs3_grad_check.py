"""Stage-2 fused-vs-jnp GRADIENT parity at production geometry (native).

Motivated by the r4 fs3_train plateau: with `fused_stages 3 head_group 6`
the training trajectory tracks the baselines exactly through epoch ~5 and
then freezes at mIoU ~0.128 while stages-0-1-fused reaches 0.21 by epoch
12 (same seed) — symptom of a stage-2 kernel backward pathology that only
appears at real scale (the documented Mosaic lesson: masked-logit exp
overflow appears native-only, "test at scale!").

Compares forward outputs and all six gradients (q, k, v, tq, tk, tv) of
`stratified_attention_fused(head_group=6)` vs the jnp path at the
stage-2 production operating point (N=2688, h=12, band=384, s_band=128),
plus NaN/inf counts. One chip shot, prints max abs/rel diffs.

python tools/fs3_grad_check.py [--stage 2] [--head-group 6]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

STAGES = {
    0: (40960, 3, 0.16, 0.01, 128),
    1: (10368, 6, 0.32, 0.02, 128),
    2: (2688, 12, 0.64, 0.04, 384),
    3: (768, 24, 1.28, 0.08, 192),
}


def rng_snap(c, cell):
    """Small jitter around cell centers (points near but not exactly on
    quantization boundaries — the documented bin-flip hot zone)."""
    r = np.random.default_rng(7)
    return (cell / 2 + r.uniform(-cell * 0.05, cell * 0.05, c.shape)
            ).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--head-group", type=int, default=6)
    ap.add_argument("--half", choices=["both", "band", "sparse"],
                    default="both",
                    help="bisect: compare only the band half (sparse "
                         "dropped on both paths) or only the sparse half")
    ap.add_argument("--band", type=int, default=0,
                    help="override the stage's band width (bisect the "
                         "band-width dependence)")
    ap.add_argument("--shifted", action="store_true",
                    help="probe the SHIFTED-parity window plan (the r4 "
                         "static probes only covered shifted=False)")
    ap.add_argument("--grid-coords", action="store_true",
                    help="snap coords to the stage's pooling-grid cell "
                         "centers (real stage-2 inputs are grid reps, "
                         "not uniform random)")
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

    n, h, ws, qs, band = STAGES[args.stage]
    if args.band:
        band = args.band
    d = 16
    npad = ((n + 127) // 128) * 128
    b = _example_batch(npad, 2, 6, seed=args.stage)
    coords = np.asarray(b.xyz)
    if args.grid_coords:
        # stage-i inputs are grid-pool representatives: coordinates of
        # points that survived pooling at cell ~ grid*2^(i-1)*2 — snap to
        # a realistic lattice neighborhood instead of uniform random
        cell = 0.04 * (2 ** args.stage)
        coords = (np.floor(coords / cell) * cell
                  + rng_snap(coords, cell)).astype(np.float32)
    xyz = jnp.asarray(coords)
    offsets = jnp.asarray(b.offsets)
    batch_ids = S.offsets_to_batch(offsets, npad)
    valid = S.offsets_to_valid(offsets, npad)
    rng = np.random.default_rng(args.stage)
    q, k, v = (jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
               for _ in range(3))
    nbins = 2 * int((2 * ws + 1e-4) // qs)
    tabs = tuple(jnp.asarray(
        rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        for _ in range(3))
    cot = jnp.asarray(rng.normal(size=(npad, h, d)).astype(np.float32))
    is_down = jnp.asarray(rng.uniform(size=npad) < 1 / 8) & valid
    aux_pad = ((npad // 8 + 2 + 127) // 128) * 128
    plan = jax.jit(lambda: P.build_attention_plan(
        xyz, batch_ids, valid, ws, shifted=bool(args.shifted),
        is_down=is_down, sparse_cap=48, aux_pad=aux_pad))()
    print(f"stage{args.stage}: npad={npad} h={h} band={band} "
          f"nbins={nbins} head_group={args.head_group} "
          f"shifted={args.shifted} grid_coords={args.grid_coords}",
          flush=True)

    kw = dict(window_size=ws, quant_size=qs, scale=d ** -0.5, band=band,
              tile=128)
    sb_jnp = plan.sparse_band if args.half in ("both", "sparse") else None
    # band-only jnp == band half; sparse-only fused uses debug_skip
    skip = {"both": (), "band": ("sparse",), "sparse": ("band",)}[args.half]

    def loss_jnp(q_, k_, v_, a, bb, c):
        if args.half == "sparse":
            # sparse half alone: unnormalised triple from the jnp helper
            acc, m, den = A.sparse_band_triple(
                q_ * (d ** -0.5), k_, v_, plan.xyz_sorted,
                plan.sparse_band, table_q=a, table_k=bb, table_v=c,
                window_size=ws, quant_size=qs, scale=1.0, s_band=128,
                tile=128, tile_batch=16, rpe_precision="default",
                qk_precision="default")
            out = acc / jnp.maximum(den, 1e-20)[:, :, None]
            return jnp.sum(out * cot), out
        out = A.stratified_attention(
            q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, table_q=a, table_k=bb, table_v=c,
            sparse_band=sb_jnp, tile_batch=16,
            rpe_precision="default", qk_precision="default", **kw)
        return jnp.sum(out * cot), out

    def loss_fused(q_, k_, v_, a, bb, c):
        if args.half != "both":
            # forward-only bisect (no custom VJP on the raw halves)
            from stratified_transformer_tpu.ops.attention_fused import (
                _fwd_impl)
            out, _, _ = _fwd_impl(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, None, None, a, bb, c,
                sparse_band=plan.sparse_band, s_band=128, w_chunk=128,
                fast=True, interpret=False, head_group=args.head_group,
                debug_skip=skip, **kw)
            return jnp.sum(out * cot), out
        out = stratified_attention_fused(
            q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, table_q=a, table_k=bb, table_v=c,
            sparse_band=plan.sparse_band, s_band=128, w_chunk=128,
            rpe_precision="default", qk_precision="default",
            head_group=args.head_group, **kw)
        return jnp.sum(out * cot), out

    if args.half == "both":
        gj = jax.jit(jax.value_and_grad(
            loss_jnp, argnums=tuple(range(6)), has_aux=True))
        gf = jax.jit(jax.value_and_grad(
            loss_fused, argnums=tuple(range(6)), has_aux=True))
        (lj, outj), grj = gj(q, k, v, *tabs)
        (lf, outf), grf = gf(q, k, v, *tabs)
    else:
        (lj, outj) = jax.jit(loss_jnp)(q, k, v, *tabs)
        (lf, outf) = jax.jit(loss_fused)(q, k, v, *tabs)
        grj = grf = ()
    print(f"loss jnp {float(lj):.6g} fused {float(lf):.6g}", flush=True)

    def stats(name, a, bb):
        a = np.asarray(a)
        bb = np.asarray(bb)
        bad = np.isnan(bb).sum() + np.isinf(bb).sum()
        d = np.abs(a - bb)
        denom = np.maximum(np.abs(a), 1e-6)
        print(f"  {name:>4}: max abs {d.max():.3e} "
              f"max rel {(d / denom).max():.3e} "
              f"mean rel {(d / denom).mean():.3e} "
              f"nan/inf(fused) {bad}", flush=True)

    stats("out", outj, outf)
    for nm, a, bb in zip("q k v tq tk tv".split(), grj, grf):
        stats(f"d{nm}", a, bb)


if __name__ == "__main__":
    main()
