"""Native stage-2 probe: Pallas backward vs exact jnp VJP, same forward.

Round-4's "attn_bwd jnp discriminator" never actually switched the
backward (train.py did not plumb the `attn_bwd` key — the run's log shows
`attn_bwd='pallas'`), so the Pallas backward was NEVER exonerated. The
stage-2 configuration (band 384 = 3 * tile 128) is the ONLY user of the
multi-tile shifted-diagonal dk/dv re-composition
(ops/pallas/fused_attention_bwd.py:390-403), and interpret-mode tests pass
— so if the backward is the fs3 culprit it is Mosaic-native-only.

This probe runs the SAME `stratified_attention_fused` forward with
`bwd_impl=pallas` vs `bwd_impl=jnp` at the stage-2 production operating
point at HIGHEST precision (the failing run's setting, fs3_train log):
forward outputs must be bit-identical, so any gradient difference beyond
fp32 reassociation noise convicts the backward kernels natively.

python tools/fs3_bwd_check.py [--stage 2] [--head-group 6] [--shifted]
                              [--fast] [--band N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--head-group", type=int, default=6)
    ap.add_argument("--shifted", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="bf16 fast mode (default: highest precision, "
                         "matching the plateaued run's config)")
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--grid-coords", action="store_true")
    ap.add_argument("--no-sparse", action="store_true",
                    help="build the plan without stratified sparse keys "
                         "(band half only) - bisects band vs sparse bwd")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode on CPU at the SAME shapes "
                         "(discriminates logic bug vs Mosaic-native)")
    ap.add_argument("--n", type=int, default=0,
                    help="override the stage's point count")
    ap.add_argument("--save", default="",
                    help="write fwd outputs + grads to <save>.npz for "
                         "offline native-vs-interpret comparison")
    args = ap.parse_args()

    if args.interpret:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops import sampling as S
    from stratified_transformer_tpu.ops.attention_fused import (
        stratified_attention_fused)
    from __graft_entry__ import _example_batch

    n, h, ws, qs, band = STAGES[args.stage]
    if args.band:
        band = args.band
    if args.n:
        n = args.n
    d = 16
    npad = ((n + 127) // 128) * 128
    b = _example_batch(npad, 2, 6, seed=args.stage)
    coords = np.asarray(b.xyz)
    if args.grid_coords:
        cell = 0.04 * (2 ** args.stage)
        r = np.random.default_rng(7)
        coords = (np.floor(coords / cell) * cell + cell / 2
                  + r.uniform(-cell * 0.05, cell * 0.05, coords.shape)
                  ).astype(np.float32)
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
    is_down = (None if args.no_sparse
               else jnp.asarray(rng.uniform(size=npad) < 1 / 8) & valid)
    aux_pad = ((npad // 8 + 2 + 127) // 128) * 128
    plan = jax.jit(lambda: P.build_attention_plan(
        xyz, batch_ids, valid, ws, shifted=bool(args.shifted),
        is_down=is_down, sparse_cap=48, aux_pad=aux_pad))()

    prec = "default" if args.fast else "highest"
    print(f"stage{args.stage}: npad={npad} h={h} band={band} tile=128 "
          f"nbins={nbins} hg={args.head_group} shifted={args.shifted} "
          f"precision={prec}", flush=True)

    def loss(bwd_impl):
        def f(q_, k_, v_, a, bb, c):
            out = stratified_attention_fused(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, table_q=a, table_k=bb, table_v=c,
                sparse_band=plan.sparse_band, s_band=128, w_chunk=128,
                rpe_precision=prec, qk_precision=prec,
                head_group=args.head_group, bwd_impl=bwd_impl,
                window_size=ws, quant_size=qs, scale=d ** -0.5,
                band=band, tile=128, interpret=args.interpret)
            return jnp.sum(out * cot), out
        return jax.jit(jax.value_and_grad(
            f, argnums=tuple(range(6)), has_aux=True))

    (lp, outp), gp = loss("pallas")(q, k, v, *tabs)
    print(f"pallas bwd done, loss {float(lp):.6f}", flush=True)
    (lj, outj), gj = loss("jnp")(q, k, v, *tabs)
    print(f"jnp    bwd done, loss {float(lj):.6f}", flush=True)

    same_fwd = np.array_equal(np.asarray(outp), np.asarray(outj))
    print(f"forward bit-identical: {same_fwd}", flush=True)

    # fused forward vs the JNP forward (not just pallas-vs-pallas):
    # at highest precision any difference beyond ~1e-5 norm-rel is a
    # native kernel defect in the FORWARD too.
    from stratified_transformer_tpu.ops import attention as A
    out_ref = jax.jit(lambda: A.stratified_attention(
        q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
        plan.valid_sorted, table_q=tabs[0], table_k=tabs[1],
        table_v=tabs[2], sparse_band=plan.sparse_band, s_band=128,
        rpe_precision=prec, qk_precision=prec,
        window_size=ws, quant_size=qs, scale=d ** -0.5,
        band=band, tile=128))()
    a = np.asarray(out_ref, np.float64)
    bb = np.asarray(outp, np.float64)
    dd = np.abs(a - bb)
    nrel = np.linalg.norm(dd) / max(np.linalg.norm(a), 1e-12)
    worst = np.unravel_index(np.argmax(dd), dd.shape)
    print(f"  fwd(fused vs jnp): norm-rel {nrel:.3e} maxabs {dd.max():.3e}"
          f" at {worst} (jnp {a[worst]:.4e} fused {bb[worst]:.4e})",
          flush=True)

    verdict_bad = False
    for nm, a, bb in zip("q k v tq tk tv".split(), gj, gp):
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        dd = np.abs(a - bb)
        # GLOBAL norm-relative metric (per-element rel explodes on zeros)
        nrel = np.linalg.norm(dd) / max(np.linalg.norm(a), 1e-12)
        cos = float((a * bb).sum() /
                    max(np.linalg.norm(a) * np.linalg.norm(bb), 1e-12))
        worst = np.unravel_index(np.argmax(dd), dd.shape)
        print(f"  d{nm}: norm-rel {nrel:.3e} cos {cos:.6f} "
              f"maxabs {dd.max():.3e} at {worst} "
              f"(jnp {a[worst]:.4e} pallas {bb[worst]:.4e}) "
              f"nan/inf {np.isnan(bb).sum() + np.isinf(bb).sum()}",
              flush=True)
        if nrel > (0.05 if args.fast else 1e-3) or cos < 0.999:
            verdict_bad = True
    print("VERDICT:", "BACKWARD DIVERGES" if verdict_bad else
          "backward within rounding", flush=True)

    if args.save:
        np.savez(args.save,
                 out_pallas=np.asarray(outp),
                 out_jnp_ref=np.asarray(out_ref),
                 **{f"g{nm}_pallas": np.asarray(x)
                    for nm, x in zip("q k v tq tk tv".split(), gp)},
                 **{f"g{nm}_jnp": np.asarray(x)
                    for nm, x in zip("q k v tq tk tv".split(), gj)})
        print(f"saved {args.save}.npz", flush=True)


if __name__ == "__main__":
    main()
