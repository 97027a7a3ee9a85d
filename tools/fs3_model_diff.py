"""Full-model forward diff at the PLATEAUED fs3 checkpoint (real batch).

The fs3 plateau does not reproduce under static kernel probes (random or
grid-snapped data, shifted or not — all show the uniform fast-mode ~0.9%
profile that healthy stages also show). This tool attacks it from the
top: load the plateaued `fused_stages 3` checkpoint, build the SAME
training batch the run saw (same loader, same seed), and compare the
full-model forward under

    A. attn_impl=fused, fused_stages=3, head_group=6 (the plateaued run)
    B. attn_impl=fused, fused_stages=2              (the healthy default)
    C. attn_impl=reference                          (pure XLA)

with identical weights. |logits| diffs A-C vs B-C separate "stage-2
kernels diverge on real data" from "uniform fast-mode noise".

python tools/fs3_model_diff.py [--ckpt /tmp/fs3_train/ckpt]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _flatten(tree, prefix=()):
    """Depth-first (module-order) flatten of a nested intermediates dict;
    flax sows __call__ outputs as tuples."""
    if isinstance(tree, dict):
        for k in tree:
            yield from _flatten(tree[k], prefix + (k,))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            yield from _flatten(v, prefix + (i,))
    else:
        yield prefix, tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/fs3_train/ckpt")
    ap.add_argument("--layerwise", action="store_true",
                    help="capture every module output (flax "
                         "capture_intermediates) for impls A and C and "
                         "report the FIRST diverging block on this batch")
    args = ap.parse_args()

    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import jax

    import train as train_mod
    from stratified_transformer_tpu.models.stratified import Stratified
    from stratified_transformer_tpu.train import checkpoint as ckpt
    from stratified_transformer_tpu.train.schedulers import multi_step
    from stratified_transformer_tpu.train.state import create_train_state
    from stratified_transformer_tpu.utils.config import (
        load_cfg, merge_cfg_from_list)

    cfg = load_cfg("configs/synthetic_smoke.yaml")
    cfg = merge_cfg_from_list(cfg, [
        "synthetic_scenes", "16", "synthetic_points", "30000",
        "voxel_max", "20000", "rpe_precision", "default",
        "qk_precision", "default", "attn_impl", "fused",
        "fused_stages", "3", "head_group", "6"])
    mcfg = train_mod.build_model_config(cfg, 1)
    ds = train_mod.build_dataset(cfg, "train", mcfg)
    loader = train_mod.BatchLoader(ds, mcfg, cfg, 1, shuffle=True, seed=123)
    [batch] = loader._make_batch(list(range(loader.scenes_per_batch)))
    print("batch built", flush=True)

    from stratified_transformer_tpu.utils.warmup import (
        fused_attention_warmup)
    fused_attention_warmup(mcfg)
    print("warmup done", flush=True)

    model = Stratified(mcfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["feats"], batch["xyz"], batch["offsets"]),
        multi_step(0.006, [60, 80], 0.1))
    state, epoch, _ = ckpt.restore(args.ckpt, state)
    print(f"restored epoch {epoch}", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(m_cfg):
        mdl = Stratified(m_cfg)

        @jax.jit
        def f():
            logits, _ = mdl.apply(
                variables, batch["feats"], batch["xyz"], batch["offsets"],
                training=False, stem_nidx=batch.get("stem_nidx"),
                stem_nmask=batch.get("stem_nmask"),
                pyramid=batch.get("pyramid"))
            return logits
        return np.asarray(f())

    if args.layerwise:
        def fwd_cap(m_cfg):
            mdl = Stratified(m_cfg)

            @jax.jit
            def f():
                _, inter = mdl.apply(
                    variables, batch["feats"], batch["xyz"],
                    batch["offsets"], training=False,
                    stem_nidx=batch.get("stem_nidx"),
                    stem_nmask=batch.get("stem_nmask"),
                    pyramid=batch.get("pyramid"),
                    capture_intermediates=True, mutable=["intermediates"])
                return inter["intermediates"]
            return jax.tree.map(np.asarray, f())

        ia = fwd_cap(mcfg)
        print("A intermediates done", flush=True)
        ic = fwd_cap(dataclasses.replace(mcfg, attn_impl="reference"))
        print("C intermediates done", flush=True)
        flat_a = {"/".join(str(k) for k in p): v for p, v in
                  _flatten(ia)}
        flat_c = {"/".join(str(k) for k in p): v for p, v in
                  _flatten(ic)}
        print(f"{len(flat_a)} captured tensors; per-module max rel diff "
              f"(model order):")
        for key in flat_a:
            a, c = flat_a[key], flat_c.get(key)
            if c is None or a.shape != c.shape or a.dtype.kind not in "f":
                continue
            d = np.abs(a.astype(np.float64) - c.astype(np.float64))
            scale = np.abs(c).astype(np.float64).mean() + 1e-12
            print(f"  {key}: maxabs {d.max():.4e} "
                  f"meanrel {d.mean() / scale:.4e}", flush=True)
        return

    la = fwd(mcfg)
    print("A (fs3 hg6) done", flush=True)
    lb = fwd(dataclasses.replace(mcfg, fused_stages=2, head_group=0))
    print("B (fs2) done", flush=True)
    lc = fwd(dataclasses.replace(mcfg, attn_impl="reference"))
    print("C (reference) done", flush=True)

    n_valid = int(batch["offsets"][-1])

    def rep(name, x, y):
        d = np.abs(x - y)[:n_valid]
        print(f"  {name}: max {d.max():.4e} mean {d.mean():.4e} "
              f"argmax-disagree "
              f"{(x[:n_valid].argmax(1) != y[:n_valid].argmax(1)).mean():.4f}",
              flush=True)

    print("logit diffs over valid points:")
    rep("A(fs3) vs C(ref)", la, lc)
    rep("B(fs2) vs C(ref)", lb, lc)
    rep("A(fs3) vs B(fs2)", la, lb)


if __name__ == "__main__":
    main()
