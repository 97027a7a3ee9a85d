"""Fused-path warmup: a small same-config model forward executed before the
production-size program.

Works around an axon-runtime fault (docs/PERF_NOTES.md round-2 addendum):
when the production-size train step is the FIRST Mosaic-containing program a
process executes, its SECOND execution crashes the TPU worker
(`INVALID_ARGUMENT: TPU backend error`, process poisoned afterwards) — 5/5
reproductions at N=40960 and N=8192. Executing one small model forward first
(same kernel specializations: tile/band/w_chunk/heads) makes the big program
stable across 20-100-iteration runs (3/3 green). Root cause is inside the
axon PJRT plugin (API 0.54 vs framework 0.90); kernels are bounds-audited
and run clean in isolation at every size.

Cost: one extra ~60s compile (cached across runs) + ~100 ms execution.
"""

from __future__ import annotations

import dataclasses
import os
import time


def fused_kernels_warmup(cfg, logger=None):
    """Kernels-only warmup: one tiny fwd+bwd `stratified_attention_fused`
    per fused stage at the PRODUCTION static kernel parameters.

    Rationale (round-5 measurement, docs/RESULTS.md): the model-forward
    warmup program is ~66 MB of StableHLO, and even on a PERSISTENT-CACHE
    HIT the axon plugin recompiles server-side on executable load —
    ~515 s per process, every process. The workaround only needs a SMALL
    Mosaic-containing program to execute before the first full-size one;
    a kernels-only program (~1 MB) loads in seconds while still
    exercising the same kernel specializations (tile, band_i, w_chunk,
    heads-per-group, nbins_i, fwd + bwd, band + sparse).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stratified_transformer_tpu.ops import plan as plan_mod
    from stratified_transformer_tpu.ops import sampling
    from stratified_transformer_tpu.ops.attention_fused import (
        stratified_attention_fused)

    t0 = time.perf_counter()
    tile = cfg.tile
    n = 2 * tile
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    offsets = jnp.asarray([n // 2, n], jnp.int32)
    batch = sampling.offsets_to_batch(offsets, n)
    valid = sampling.offsets_to_valid(offsets, n)
    is_down = jnp.asarray(rng.uniform(size=n) < 0.25) & valid
    wss = cfg.window_sizes()
    qss = cfg.quant_sizes()
    bands = (cfg.band_per_stage if cfg.band_per_stage is not None
             else (cfg.band,) * cfg.num_layers)
    for i in range(cfg.layer_start,
                   min(cfg.fused_stages, cfg.num_layers)):
        h = cfg.num_heads[i]
        d = cfg.channels[i] // h
        ws, qs = wss[i], qss[i]
        nbins = 2 * int((2 * ws + 1e-4) // qs)
        plan = plan_mod.build_attention_plan(
            jnp.asarray(xyz), batch, valid, ws, shifted=False,
            is_down=is_down, sparse_cap=cfg.sparse_cap, aux_pad=128)
        q, k, v = (jnp.asarray(
            rng.normal(size=(n, h, d)).astype(np.float32))
            for _ in range(3))
        tabs = tuple(jnp.asarray(
            rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
            for _ in range(3))
        def loss(q_, k_, v_, a, b, c):
            out = stratified_attention_fused(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start,
                plan.seg_end, plan.valid_sorted,
                sparse_band=plan.sparse_band,
                table_q=a, table_k=b, table_v=c,
                window_size=ws, quant_size=qs, scale=d ** -0.5,
                band=bands[i], tile=tile, w_chunk=cfg.w_chunk,
                s_band=cfg.s_band,
                rpe_precision=cfg.rpe_precision,
                qk_precision=cfg.qk_precision,
                head_group=cfg.head_group,
                interpret=cfg.pallas_interpret,
                bwd_impl=cfg.attn_bwd)
            return jnp.sum(out * out)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
        jax.block_until_ready(g(q, k, v, *tabs))
    msg = (f"fused kernels warmup done in "
           f"{time.perf_counter() - t0:.0f}s (axon runtime workaround, "
           f"utils/warmup.py)")
    if logger is not None:
        logger.info(msg)


def fused_attention_warmup(cfg, n: int = 2048, logger=None):
    """Run a small Mosaic-containing program before the first full-size
    fused step (axon workaround; see module docstring).

    Default mode "kernels" (round-5): tiny per-stage fwd+bwd kernel
    calls — loads in seconds instead of the model-forward program's
    ~515 s server-side recompile-on-load. Set ``ST_WARMUP_MODE=model``
    for the original small-model-forward program.

    No-op unless ``cfg.attn_impl == "fused"``. Call once per process
    before the first full-size step.
    """
    if getattr(cfg, "attn_impl", "reference") != "fused":
        return
    if os.environ.get("ST_WARMUP_MODE", "kernels") == "kernels":
        return fused_kernels_warmup(cfg, logger=logger)
    import jax
    import numpy as np

    from stratified_transformer_tpu.models.stratified import Stratified

    t0 = time.perf_counter()
    n = max(n, 2 * cfg.tile)
    n = (n // cfg.tile) * cfg.tile
    wcfg = dataclasses.replace(cfg, n_pad=n, num_scenes=2)
    model = Stratified(wcfg)
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 2.0, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, wcfg.in_channels)).astype(np.float32)
    offsets = np.array([n // 2, n], np.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, xyz, offsets)

    @jax.jit
    def fwd(feats, xyz, offsets):
        out = model.apply(variables, feats, xyz, offsets, training=False)
        return out[0].sum()

    for _ in range(2):
        jax.block_until_ready(fwd(feats, xyz, offsets))
    msg = (f"fused-path warmup done in {time.perf_counter() - t0:.0f}s "
           f"(axon runtime workaround, utils/warmup.py)")
    if logger is not None:
        logger.info(msg)
