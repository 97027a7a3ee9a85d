"""Is the FUSED warmup program's cache key stable across processes?

Same-code same-config fused runs each paid ~650 s of warmup compile today
(5 distinct jit_fwd keys in /root/.jax_cache). Small-pallas and pure-jnp
programs key deterministically (tools/cache_key_probe.py; CPU double-
lowering of the jnp model hashes identically), so the suspect is the
Mosaic custom-call payload serialization in the FUSED model's lowering.

Lowers (does NOT compile) the exact warmup program on the axon backend,
prints the module-text hash and the jax cache key. Run twice, diff.

python tools/warmup_key_probe.py
"""

import hashlib
import sys

sys.path.insert(0, ".")

from stratified_transformer_tpu.utils import enable_persistent_cache
enable_persistent_cache()

import dataclasses  # noqa: E402
import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    from stratified_transformer_tpu.models.stratified import (
        Stratified, StratifiedConfig)

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, channels=(48, 96, 192, 384),
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), num_layers=4,
        n_pad=2048, num_scenes=2, band=128,
        band_per_stage=(128, 128, 384, 192),
        tile=128, sparse_cap=48, sampler="grid",
        attn_impl="fused", fused_stages=3, head_group=6,
        rpe_precision="default", qk_precision="default")
    model = Stratified(cfg)
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 2.0, (2048, 3)).astype(np.float32)
    feats = rng.normal(size=(2048, 6)).astype(np.float32)
    offsets = np.array([1024, 2048], np.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, xyz, offsets)

    @jax.jit
    def fwd(feats, xyz, offsets):
        out = model.apply(variables, feats, xyz, offsets, training=False)
        return out[0].sum()

    lowered = fwd.lower(feats, xyz, offsets)
    txt = lowered.as_text()
    print("module text sha256:",
          hashlib.sha256(txt.encode()).hexdigest()[:16], "len", len(txt),
          flush=True)

    # the jax persistent-cache key for this module
    from jax._src import cache_key as ck
    from jax._src.interpreters import mlir as jmlir  # noqa: F401

    module = lowered._lowering.stablehlo()
    backend = jax.devices()[0].client
    devices = np.asarray([jax.devices()[0]])
    opts = lowered.compile_args["compile_options"] if isinstance(
        getattr(lowered, "compile_args", None), dict) else None
    if opts is None:
        from jax._src import compiler
        opts = compiler.get_compile_options(1, 1)
    key = ck.get(module, devices, opts, backend)
    print("cache key:", key[:80], flush=True)


if __name__ == "__main__":
    main()
