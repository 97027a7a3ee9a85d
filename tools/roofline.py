"""Analytic roofline for the attention step (VERDICT r3 weak #2).

Per (stage, op-class) this computes, from the StratifiedConfig arithmetic
alone (no chip needed):

  * MXU flops        — QK^T/PV contractions + the one-hot cRPE matmuls
                       (the framework's gather-free bias evaluation);
  * VPU ops          — one-hot construction (compares), exp, masks;
  * min HBM bytes    — inputs read once + outputs written once, tables
                       read once per tile-batch, intermediates assumed
                       FUSED (never spilled): a hard lower bound;
  * spill HBM bytes  — the same with the [T, W, 3L] one-hots and [T,h,W]
                       probabilities materialised to HBM: the upper bound
                       if XLA fails to fuse them.

and the implied time lower bound  t >= max(mxu, vpu, hbm_min)  per stage,
compared (when ``--measured`` is given) against measured per-stage times.

Peaks (override via env): ST_PEAK_FLOPS (bf16 MXU, default 1.97e14),
ST_PEAK_FLOPS_F32 (default 4.9e13), ST_PEAK_VPU (elementwise fp32 ops/s,
default 7.9e11 — 8x128 lanes * 4 ALUs * 940 MHz * 2, a v5e estimate),
ST_PEAK_HBM (default 8.19e11 B/s).

The point of this table (docs/PERF_NOTES.md "Roofline"): the measured step
is far from BOTH the MXU and HBM roofs — the binding resource is the
VPU/layout work around the one-hot cRPE — so "speed-of-light" claims must
be made against the VPU/fusion bound, and the headroom column is real.

Usage: python tools/roofline.py [--n-pad 40960] [--json out.json]
           [--measured stage0=48,stage1=19,stage2=11,stage3=7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stage_geometry(cfg, n_pad):
    """Per-stage attention geometry for the production architecture."""
    stages = []
    n = n_pad
    for i in range(cfg.num_layers):
        tile = cfg.tile
        band = (cfg.band_per_stage[i]
                if cfg.band_per_stage is not None else cfg.band)
        ws = cfg.window_sizes()[i]
        qs = cfg.quant_sizes()[i]
        lq = int((2 * ws + 1e-4) // qs)
        nbins = 2 * lq
        h = cfg.num_heads[i]
        d = cfg.channels[i] // h
        stages.append({
            "stage": i, "n": n, "heads": h, "head_dim": d,
            "depth": cfg.depths[i], "tile": tile,
            "w_band": tile + 2 * band,          # dense band keys per tile
            "s_band": cfg.s_band,               # sparse aux keys per tile
            "nbins": nbins, "l3": 3 * nbins,
        })
        if i + 1 < cfg.num_layers:
            n = max(((int(n * cfg.ratio) + cfg.num_scenes + tile - 1)
                     // tile) * tile, tile)
    return stages


def op_model(g, use_rpe=(True, True, True)):
    """flops/ops/bytes for ONE attention block at stage geometry ``g``.

    Dense band + sparse halves share the formulas with W = w_band or
    s_band. Bytes are fp32 (rpe_precision/qk_precision "default" stages
    bf16 MXU passes but stage IO stays fp32 in the jnp path).
    """
    t, h, d, l3 = g["tile"], g["heads"], g["head_dim"], g["l3"]
    n = g["n"]
    n_tiles = n // t
    rq, rk, rv = use_rpe
    out = {}
    for half, w in (("band", g["w_band"]), ("sparse", g["s_band"])):
        # --- MXU flops per tile ---
        qk_pv = 2 * 2 * t * w * h * d                 # QK^T + PV
        crpe = 0
        crpe += rq * (2 * t * h * d * l3 + 2 * t * h * w * l3)   # q-bias
        crpe += rk * (2 * w * h * d * l3 + 2 * t * h * w * l3)   # k-bias
        crpe += rv * (2 * t * h * w * l3 + 2 * t * h * l3 * d)   # v-mass
        # --- VPU ops per tile (dominant terms) ---
        vpu = (t * w * 3 * (g["nbins"] + 4)   # one-hot compares + rel/quant
               + t * h * w * 3                # mask/where/exp on logits
               + t * h * w)                   # online-softmax adds
        # --- HBM bytes per tile ---
        io_min = 4 * (t * h * d * 2           # q in, out acc
                      + w * h * d * 2         # k, v band slice
                      + (t + w) * 3           # xyz
                      + t * h * 2)            # m, den stats
        tables = 4 * (rq + rk + rv) * l3 * h * d
        spill = 4 * (3 * t * w * g["nbins"]   # ohs (fp32 worst case)
                     + t * h * w)             # probabilities
        out[half] = {
            "mxu_qkpv_gflops": n_tiles * qk_pv / 1e9,
            "mxu_crpe_gflops": n_tiles * crpe / 1e9,
            "vpu_gops": n_tiles * vpu / 1e9,
            "hbm_min_mb": (n_tiles * io_min + tables) / 1e6,
            "hbm_spill_mb": n_tiles * spill / 1e6,
        }
    return out


def bounds(tot, peaks):
    mxu_ms = 1e3 * (tot["mxu_qkpv_gflops"] + tot["mxu_crpe_gflops"]) \
        * 1e9 / peaks["mxu"]
    vpu_ms = 1e3 * tot["vpu_gops"] * 1e9 / peaks["vpu"]
    hbm_ms = 1e3 * tot["hbm_min_mb"] * 1e6 / peaks["hbm"]
    spill_ms = 1e3 * tot["hbm_spill_mb"] * 1e6 / peaks["hbm"]
    return {"mxu_ms": mxu_ms, "vpu_ms": vpu_ms, "hbm_min_ms": hbm_ms,
            "hbm_spill_ms": spill_ms,
            "bound_ms": max(mxu_ms, vpu_ms, hbm_ms),
            "binding": max(
                (("mxu", mxu_ms), ("vpu", vpu_ms), ("hbm", hbm_ms)),
                key=lambda kv: kv[1])[0]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pad", type=int, default=40960)
    ap.add_argument("--fwd-bwd-factor", type=float, default=3.0,
                    help="flops multiplier for fwd+bwd (grad wrt 2 matmul "
                         "operands ~ 3x fwd)")
    ap.add_argument("--measured", default="",
                    help="stageI=ms,... measured fwd ms/block to annotate")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from stratified_transformer_tpu.models.stratified import StratifiedConfig

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=args.n_pad, num_scenes=2,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        band_per_stage=(128, 128, 384, 192))
    peaks = {"mxu": float(os.environ.get("ST_PEAK_FLOPS", 1.97e14)),
             "vpu": float(os.environ.get("ST_PEAK_VPU", 7.9e11)),
             "hbm": float(os.environ.get("ST_PEAK_HBM", 8.19e11))}
    measured = {}
    for part in filter(None, args.measured.split(",")):
        k, v = part.split("=")
        measured[k] = float(v)

    rows = []
    print(f"peaks: mxu {peaks['mxu']/1e12:.0f}T bf16, "
          f"vpu {peaks['vpu']/1e9:.0f}G ops/s, "
          f"hbm {peaks['hbm']/1e9:.0f} GB/s;  n_pad={args.n_pad}")
    hdr = (f"{'stage':>5} {'half':>6} {'mxu G':>8} {'crpe G':>8} "
           f"{'vpu G':>7} {'minMB':>7} {'spillMB':>8} "
           f"{'bound ms':>8} {'binding':>7}")
    print(hdr)
    for g in stage_geometry(cfg, args.n_pad):
        per = op_model(g)
        for half in ("band", "sparse"):
            tot = per[half]
            b = bounds(tot, peaks)
            rows.append({**g, "half": half, **tot, **b})
            print(f"{g['stage']:>5} {half:>6} "
                  f"{tot['mxu_qkpv_gflops']:8.1f} "
                  f"{tot['mxu_crpe_gflops']:8.1f} "
                  f"{tot['vpu_gops']:7.2f} {tot['hbm_min_mb']:7.1f} "
                  f"{tot['hbm_spill_mb']:8.0f} {b['bound_ms']:8.2f} "
                  f"{b['binding']:>7}")
        both = {k: per["band"][k] + per["sparse"][k] for k in per["band"]}
        b = bounds(both, peaks)
        blocks = g["depth"]
        meas = measured.get(f"stage{g['stage']}")
        note = ""
        if meas is not None:
            note = (f"  measured {meas:.1f} ms/block fwd -> "
                    f"{meas / max(b['bound_ms'], 1e-9):.0f}x above bound")
        print(f"{g['stage']:>5} {'TOTAL':>6} x{blocks} blocks: "
              f"bound {b['bound_ms']:.2f} ms/block fwd "
              f"({args.fwd_bwd_factor:.0f}x fwd+bwd "
              f"{args.fwd_bwd_factor * b['bound_ms']:.2f}){note}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"peaks": peaks, "rows": rows}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
