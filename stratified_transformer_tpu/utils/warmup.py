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
import time


def fused_attention_warmup(cfg, n: int = 2048, logger=None):
    """Run two small eval forwards of `Stratified(cfg @ n_pad=n)`.

    No-op unless ``cfg.attn_impl == "fused"``. Call once per process before
    the first full-size step.
    """
    if getattr(cfg, "attn_impl", "reference") != "fused":
        return
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
