"""Probe the post-failure state of the axon client: what does the SECOND
error say, do device attrs expose a reset, does waiting heal the worker?"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from stratified_transformer_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from tools.instability_ladder import run  # noqa: F401 (path setup)

    # reproduce the failure: mixed fwd program, 2 execs
    import subprocess  # noqa: F401
    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)
    from stratified_transformer_tpu.data.collate import with_stem_neighbors
    from stratified_transformer_tpu.data.pyramid import build_geometry_pyramid
    from __graft_entry__ import _example_batch

    n = 40960
    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=n, num_scenes=2,
        band=128, tile=128, sparse_cap=48, sampler="grid",
        band_per_stage=(128, 128, 384, 192),
        rpe_precision="default", qk_precision="default",
        attn_impl="fused", fused_stages=2, attn_bwd="pallas")
    model = Stratified(cfg)
    b = _example_batch(n, 2, cfg.in_channels)
    b = with_stem_neighbors(b, radius=2.5 * cfg.grid_size * cfg.sigma,
                            k=cfg.max_num_neighbors)
    batch = {"feats": b.feats, "xyz": b.xyz, "offsets": b.offsets,
             "labels": b.labels, "stem_nidx": b.stem_nidx,
             "stem_nmask": b.stem_nmask,
             "pyramid": build_geometry_pyramid(b.xyz, b.offsets, cfg)}
    variables = model.init(jax.random.PRNGKey(0), batch["feats"],
                           batch["xyz"], batch["offsets"])

    @jax.jit
    def fwd(feats, xyz, offsets):
        out = model.apply(variables, feats, xyz, offsets, training=False,
                          stem_nidx=batch["stem_nidx"],
                          stem_nmask=batch["stem_nmask"])
        return out[0].sum()

    dev = jax.devices()[0]
    print("device attrs:", [a for a in dir(dev) if not a.startswith("__")],
          flush=True)
    client = dev.client
    print("client attrs:", [a for a in dir(client) if not a.startswith("__")],
          flush=True)

    failed_at = None
    for i in range(8):
        try:
            v = fwd(batch["feats"], batch["xyz"], batch["offsets"])
            jax.block_until_ready(v)
            print(f"exec#{i+1} ok", flush=True)
        except Exception as e:
            failed_at = i
            print(f"exec#{i+1} FAILED: {type(e).__name__}: {e}", flush=True)
            break

    if failed_at is None:
        print("no failure reproduced this time", flush=True)
        return

    # probe 1: immediate small op -> what does ITS error say?
    try:
        r = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        jax.block_until_ready(r)
        print("small op after failure: OK", flush=True)
    except Exception as e:
        print(f"small op after failure: {type(e).__name__}: {e}", flush=True)

    # probe 2: wait for a worker restart, then retry
    for wait in (5, 20, 60):
        time.sleep(wait)
        try:
            r = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            jax.block_until_ready(r)
            print(f"small op after +{wait}s: OK", flush=True)
            break
        except Exception as e:
            print(f"small op after +{wait}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # probe 3: retry the big program
    try:
        v = fwd(batch["feats"], batch["xyz"], batch["offsets"])
        jax.block_until_ready(v)
        print("big program retry: OK", flush=True)
    except Exception as e:
        print(f"big program retry: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
