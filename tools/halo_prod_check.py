"""Production-config sharded-inference exactness check (one chip, one shot).

VERDICT r2 weak #7: the pytest halo exactness proof
(`tests/test_halo.py::test_sharded_real_model_matches_full_forward`) runs a
2-stage model because a *production* 4-stage scene is CPU-infeasible: the
count-independent quota condition (occupied grid cells <= capacity at every
pyramid level, see below) forces S3DIS-like density (~1/voxel^2 = 625/m^2),
and the production receptive halo (depths (2,2,6,2): ~20 m — attention hops
dominate, `parallel.halo.receptive_halo`) forces a scene many tens of meters
long => >100k points. That is an easy single-forward on the TPU but minutes
per forward on the 2-core CPU suite.

This tool runs the full production S3DIS architecture (4 stages, depths
(2,2,6,2), heads (3,6,12,24), grid 0.04, window 4, `down_quota="cells"`,
`sampler="grid"`, grid kNN with global origins) on a corridor scene sized so
NO capacity/quota cap binds, evaluates it (a) as one whole-scene forward and
(b) as `--blocks` spatial slabs with the derived receptive halo
(`parallel.halo.partition_scene`, same packing as
`halo.sharded_scene_probs`), and reports the max |prob| difference over core
points plus wall times. Exactness conditions and their derivation:
docs/DISTRIBUTED.md. Blocks run sequentially on the one available chip —
the multi-chip path shards the identical block batch over the mesh
(`eval/voting.evaluate_scene_sharded`); block-forward results do not depend
on which device runs them.

Quota condition (why density is pinned): with `down_quota="cells"` every
occupied cell keeps a representative, so the per-level static capacity
(n_i/8 for stratified keys, n_i/4 for TransitionDown) must exceed the
occupied-cell count. For a surface of area A at density rho, level i has
n_i = n/4^i points and A/(c*2^i)^2 occupied cells of size c*2^i — both
shrink 4x per level, so one condition covers all levels: rho >= 8/c0^2
(c0 = grid*sqrt(8) for stratified keys; the TransitionDown cell 2*grid
gives rho >= 1/grid^2 = 625/m^2, the binding one).

Usage: python tools/halo_prod_check.py [--length 100] [--blocks 4]
           [--out docs/artifacts/halo_prod_check.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def corridor_scene(length, width, wall_h, rho, seed=0):
    """Floor + two walls at uniform surface density rho (pts/m^2)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    nf = int(length * width * rho)
    nw = int(length * wall_h * rho)
    f = rng.uniform(0, 1, (nf, 3)) * [length, width, 0.02]
    w1 = rng.uniform(0, 1, (nw, 3)) * [length, 0.02, wall_h]
    w2 = rng.uniform(0, 1, (nw, 3)) * [length, 0.02, wall_h]
    w2[:, 1] += width - 0.02
    coord = np.concatenate([f, w1, w2]).astype(np.float32)
    feat = rng.normal(size=(len(coord), 3)).astype(np.float32)
    return coord, feat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=float, default=100.0)
    ap.add_argument("--width", type=float, default=1.5)
    ap.add_argument("--wall-h", type=float, default=0.3)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--rho", type=float, default=720.0,
                    help="surface density pts/m^2 (>= 625 so no quota "
                         "binds; 720 = 15%% margin)")
    ap.add_argument("--depths", type=int, nargs=4, default=[2, 2, 6, 2])
    ap.add_argument("--halo-scale", type=float, default=1.0,
                    help="multiply the derived receptive halo (diagnose "
                         "truncation-vs-noise: err unchanged at 1.5 => "
                         "numerical)")
    ap.add_argument("--out", default="docs/artifacts/halo_prod_check.json")
    args = ap.parse_args()

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.parallel import halo

    t00 = time.perf_counter()

    def log(msg):
        print(f"[halo-prod +{time.perf_counter() - t00:6.1f}s] {msg}",
              flush=True)

    coord, feat = corridor_scene(
        args.length, args.width, args.wall_h, args.rho)
    n = len(coord)
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=0, num_scenes=1,
        channels=(48, 96, 192, 384), depths=tuple(args.depths),
        num_heads=(3, 6, 12, 24), num_layers=4,
        grid_size=0.04, window_size=4.0, patch_size=1, quant_size=0.01,
        downsample_scale=8, band=128, band_per_stage=(128, 128, 384, 192),
        tile=128, sparse_cap=48, sampler="grid", down_quota="cells",
        neighbor_method="grid", stem_transformer=True, drop_path_rate=0.0,
        attn_impl="reference")
    hw = halo.receptive_halo(cfg) * args.halo_scale
    log(f"scene: {n} pts over {args.length} m, receptive halo {hw:.2f} m "
        f"(scale {args.halo_scale}), devices {jax.devices()}")

    blocks = halo.partition_scene(coord, args.blocks, hw)
    block_n = max(len(b["idx"]) for b in blocks)
    block_pad = ((block_n + 127) // 128) * 128
    n_pad_full = ((n + 127) // 128) * 128
    log(f"blocks: {[len(b['idx']) for b in blocks]}, block_pad {block_pad}, "
        f"full pad {n_pad_full}")
    assert block_pad < n_pad_full, (
        "blocks cover the whole scene - lengthen the corridor")

    origin = coord.min(0)

    def pack(idx, n_pad):
        c = np.zeros((n_pad, 3), np.float32)
        c[:len(idx)] = coord[idx] - origin
        f = np.zeros((n_pad, 6), np.float32)
        f[:len(idx)] = np.concatenate([feat[idx], c[:len(idx)]], 1)
        return f, c, np.array([len(idx)], np.int32)

    def make_predict(n_pad):
        mcfg = dataclasses.replace(cfg, n_pad=n_pad, num_scenes=1)
        model = Stratified(mcfg)

        def predict(variables, feats_, xyz_, off_):
            logits, _ = model.apply(
                variables, feats_, xyz_, off_, training=False,
                anchor=jnp.zeros((3,), jnp.float32))
            return jax.nn.softmax(logits, -1)
        return model, jax.jit(predict)

    _, predict_full = make_predict(n_pad_full)
    ff, cf, of = pack(np.arange(n), n_pad_full)
    # init at a tiny n_pad and reuse: params/batch-stats are size-independent
    model_i, _ = make_predict(1280)
    fi, ci, oi = pack(np.arange(min(n, 1280)), 1280)
    variables = model_i.init(jax.random.PRNGKey(0), fi, ci, oi)
    log("params initialised (1280-pt init; params are size-independent)")

    t0 = time.perf_counter()
    full = np.asarray(predict_full(variables, ff, cf, of))[:n]
    t_full_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    full = np.asarray(predict_full(variables, ff, cf, of))[:n]
    t_full = time.perf_counter() - t0
    log(f"full forward: compile+exec {t_full_compile:.1f}s, steady "
        f"{t_full:.2f}s")

    # fp32 reassociation NOISE FLOOR: the identical scene evaluated at a
    # different static padding (different tile count -> different
    # reduction/sort associativity, same math). Any |Δprob| at or below
    # this level is numerical, not a halo-truncation effect — the r4
    # run's 4.1e-6 needed exactly this control (12 attention blocks
    # compound ~1e-7/op reassociation well past the 2-stage toy's 5e-7).
    _, predict_full2 = make_predict(n_pad_full + 256)
    ff2, cf2, of2 = pack(np.arange(n), n_pad_full + 256)
    full2 = np.asarray(predict_full2(variables, ff2, cf2, of2))[:n]
    err_floor = float(np.abs(full2 - full).max())
    log(f"reassociation noise floor (padding control): {err_floor:.2e}")

    _, predict_block = make_predict(block_pad)
    out = np.zeros((n, 13), np.float64)
    t_blocks = []
    for b, blk in enumerate(blocks):
        idx = blk["idx"]
        assert len(idx) <= block_pad
        fb, cb, ob = pack(idx, block_pad)
        t0 = time.perf_counter()
        probs = np.asarray(predict_block(variables, fb, cb, ob))
        t_blocks.append(time.perf_counter() - t0)
        sel = np.where(blk["core"])[0]
        out[idx[sel]] = probs[sel]
        log(f"block {b}: {len(idx)} pts in {t_blocks[-1]:.2f}s")

    err = float(np.abs(out - full).max())
    # where does the worst error live? truncation clusters at block
    # boundaries; reassociation noise is position-independent.
    perr = np.abs(out - full).max(1)                      # [n]
    # internal slab edges, recomputed exactly as partition_scene cuts them
    edges = np.quantile(coord[:, 0], np.linspace(0, 1, args.blocks + 1))[1:-1]
    dist_edge = np.min(np.abs(
        coord[:, 0:1] - np.asarray(edges)[None, :]), axis=1)
    far = dist_edge > hw / 2
    err_far = float(perr[far].max()) if far.any() else 0.0
    err_near = float(perr[~far].max()) if (~far).any() else 0.0
    log(f"err far-from-boundary {err_far:.2e} vs near {err_near:.2e} "
        f"(floor {err_floor:.2e})")
    # a control block run with a sub-window halo must diverge
    blocks_bad = halo.partition_scene(coord, args.blocks, 0.05)
    bad_n = max(len(b["idx"]) for b in blocks_bad)
    bad_pad = ((bad_n + 127) // 128) * 128
    _, predict_bad = make_predict(bad_pad)
    out_bad = np.zeros((n, 13), np.float64)
    for blk in blocks_bad:
        idx = blk["idx"]
        fb, cb, ob = pack(idx, bad_pad)
        probs = np.asarray(predict_bad(variables, fb, cb, ob))
        sel = np.where(blk["core"])[0]
        out_bad[idx[sel]] = probs[sel]
    err_bad = float(np.abs(out_bad - full).max())

    result = {
        "n_points": n,
        "config": "s3dis production 4-stage",
        "depths": list(args.depths),
        "receptive_halo_m": round(hw, 3),
        "blocks": args.blocks,
        "block_pad": block_pad,
        "full_pad": n_pad_full,
        "max_abs_prob_err_exact": err,
        "noise_floor_padding_control": err_floor,
        "err_far_from_boundary": err_far,
        "err_near_boundary": err_near,
        "max_abs_prob_err_subwindow_control": err_bad,
        "t_full_s": round(t_full, 3),
        "t_block_s": [round(t, 3) for t in t_blocks],
        "serial_block_sum_s": round(sum(t_blocks), 3),
        "projected_4chip_wall_s": round(max(t_blocks), 3),
        # exact-to-the-numerical-floor: the sharded error must sit at the
        # reassociation noise level (or the absolute 2e-6 bar) AND the
        # sub-window control must diverge an order of magnitude above it.
        # (10x, not more: with random-init params the probabilities are
        # near-flat, so even destroying the receptive field moves |Δprob|
        # by only ~1e-4 — measured r4: err 4.1e-6 == noise floor 4.9e-6,
        # no boundary clustering, control 8.5e-5 = 17x.)
        "ok": bool(err <= max(2e-6, 3 * err_floor)
                   and err_bad > 10 * max(err, err_floor, 1e-9)),
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
