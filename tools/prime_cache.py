"""Pre-populate the persistent compile cache for the production configs.

The fused path's COLD startup cost is a ~26-minute host-side Mosaic
compile (`train_fused_r03.log`: ``fused-path warmup done in 1571s``); the
persistent cache at ``/root/.jax_cache`` reduces a fresh ``train.py`` to
seconds of cache lookups. This tool runs exactly the compile-inducing
prefix of the training driver — fused warmup, flax init, train-step
lower+compile — for each requested (config, attn_impl) pair, WITHOUT any
training execution, so one invocation after an image rebuild (or cache
wipe) pays the tax once for every later process.

Usage:
  python tools/prime_cache.py [--config configs/synthetic_smoke.yaml]
      [--impls reference,fused] [--n-pad 40960] [--skip-preflight]

Prints per-phase wall times; run ``train.py`` afterwards and compare its
startup to the cold numbers in docs/RESULTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def prime(config_path, impl, n_pad, opts):
    import jax

    import train as train_mod
    from stratified_transformer_tpu.data.collate import with_stem_neighbors
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from stratified_transformer_tpu.utils.config import (
        load_cfg, merge_cfg_from_list)
    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    from __graft_entry__ import _example_batch

    cfg = load_cfg(config_path)
    cfg = merge_cfg_from_list(
        cfg, ["attn_impl", impl, "max_batch_points", str(n_pad)] + opts)
    mcfg = train_mod.build_model_config(cfg, 1)
    t0 = time.perf_counter()

    def mark(msg):
        print(f"[prime {impl} +{time.perf_counter() - t0:7.1f}s] {msg}",
              flush=True)

    b = _example_batch(mcfg.n_pad, mcfg.num_scenes, mcfg.in_channels)
    b = with_stem_neighbors(b, radius=2.5 * mcfg.grid_size * mcfg.sigma,
                            k=mcfg.max_num_neighbors)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels, "stem_nidx": b.stem_nidx,
             "stem_nmask": b.stem_nmask}
    if mcfg.sampler == "grid":
        batch["pyramid"] = build_geometry_pyramid(b.xyz, b.offsets, mcfg)
    mark("batch built")

    # ORDER-CRITICAL on the axon runtime: small fused program first
    # (docs/PERF_NOTES.md "train.py-specific fused crash").
    fused_attention_warmup(mcfg)
    mark("fused warmup done" if mcfg.attn_impl == "fused"
         else "warmup skipped (jnp path)")

    from stratified_transformer_tpu.models.stratified import Stratified
    model = Stratified(mcfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]),
        multi_step(0.006, [60, 80], 0.1))
    mark("init executed")

    donate = (0,) if mcfg.attn_impl != "fused" else ()
    step = jax.jit(make_train_step(ignore_label=255, num_classes=13),
                   donate_argnums=donate)
    step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    mark("train step compiled (cache populated)")

    from stratified_transformer_tpu.train.step import make_eval_step
    jax.jit(make_eval_step(255, 13)).lower(state, batch).compile()
    mark("eval step compiled")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic_smoke.yaml")
    ap.add_argument("--impls", default="reference,fused")
    ap.add_argument("--n-pad", type=int, default=40960)
    ap.add_argument("--skip-preflight", action="store_true")
    ap.add_argument("opts", nargs="*", default=[],
                    help="extra `key value` config overrides")
    args = ap.parse_args()

    if not args.skip_preflight:
        from tools.preflight import probe_device
        pf = probe_device(420)
        print(f"preflight: {pf}", flush=True)
        if not pf["ok"]:
            raise SystemExit(3)

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    for impl in args.impls.split(","):
        prime(args.config, impl.strip(), args.n_pad, list(args.opts))


if __name__ == "__main__":
    main()
