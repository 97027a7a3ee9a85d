"""Sweep attention impl/precision variants at the bench operating point.

python tools/attn_sweep.py [--n 40960]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40960)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.train.step import make_train_step
    from __graft_entry__ import _example_batch

    n, B = args.n, args.scenes
    b = _example_batch(n, B, 6, seed=0)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels}

    def run(tag, **over):
        cfg = StratifiedConfig(
            num_classes=13, in_channels=6, n_pad=n, num_scenes=B,
            band=128, tile=128, sparse_cap=48, sampler="grid", **over)
        model = Stratified(cfg)
        schedule = multi_step(0.006, [60, 80], 0.1)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (batch["feats"], batch["xyz"], batch["offsets"]), schedule)
        step = jax.jit(make_train_step(ignore_label=255, num_classes=13),
                       donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)
        state, stats = step(state, batch, rng)
        jax.block_until_ready(stats["loss"])
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            state, stats = step(state, batch, rng)
        jax.block_until_ready(stats["loss"])
        t = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:40s} {t:8.1f} ms  {n / t * 1e3:10,.0f} pts/s  "
              f"loss {float(stats['loss']):.4f}")

    which = args.which
    variants = {
        "ref-hi": ("reference / highest", {}),
        "ref-rpe": ("reference / rpe=default",
                    dict(rpe_precision="default")),
        "ref-rpeqk": ("reference / rpe+qk=default",
                      dict(rpe_precision="default",
                           qk_precision="default")),
        "ref-bf16": ("reference / rpe+qk=default + bf16 dtype",
                     dict(rpe_precision="default", qk_precision="default",
                          compute_dtype="bfloat16")),
        "tb48": ("rpe+qk=default tile_batch=48",
                 dict(rpe_precision="default", qk_precision="default",
                      tile_batch=48)),
        "tb80": ("rpe+qk=default tile_batch=80",
                 dict(rpe_precision="default", qk_precision="default",
                      tile_batch=80)),
        "savep": ("rpe+qk=default remat=save_p",
                  dict(rpe_precision="default", qk_precision="default",
                       attn_remat="save_p")),
        "fused-hi": ("fused / highest", dict(attn_impl="fused")),
        "fused-rpeqk": ("fused / rpe+qk=default",
                        dict(attn_impl="fused", rpe_precision="default",
                             qk_precision="default")),
    }
    for key, (tag, over) in variants.items():
        if which in ("all", key):
            run(tag, **over)


if __name__ == "__main__":
    main()
