"""Does Mosaic compute the cRPE bin formula differently from XLA-TPU?

The fused kernels and the jnp path share one formula
(`ops/pallas/common.rel_bins_chunk`):

    rel  = round(rel * 1e5) / 1e5
    bin  = floor((rel + 2*window - 1e-4) / quant)

If Mosaic lowers the fp32 divide (TPU has no native fp32 divide — it is
reciprocal + Newton fixup) differently from XLA, values near bin
boundaries flip, which would explain the native-only fused-vs-jnp
divergence (interpret mode shares XLA's lowering and is clean).

Runs the formula over a dense sweep of rel values INCLUDING exact bin
boundaries and 1-ulp neighbourhoods, in a minimal Pallas kernel vs plain
jnp, on the TPU; prints the count + examples of differing bins.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from stratified_transformer_tpu.utils import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ws, qs = 0.64, 0.04            # stage-2 operating point
    n = 1 << 16
    rng = np.random.default_rng(0)
    # dense sweep: random rels + exact boundaries + 1e-5 lattice points
    bins = np.arange(64)
    bounds = (bins * qs - 2 * ws + 1e-4).astype(np.float32)
    lattice = np.round(rng.uniform(-2 * ws, 2 * ws, n - 4 * 64) * 1e5) / 1e5
    rel = np.concatenate([
        lattice.astype(np.float32),
        bounds, np.nextafter(bounds, -np.inf), np.nextafter(bounds, np.inf),
        bounds + 1e-5,
    ]).astype(np.float32)
    rel = np.tile(rel[: (len(rel) // 256) * 256], 1).reshape(-1, 256)

    def formula(x):
        r = jnp.round(x * 1e5) / 1e5
        return jnp.floor((r + 2.0 * ws - 1e-4) / qs).astype(jnp.int32)

    def kernel(x_ref, o_ref):
        o_ref[:] = formula(x_ref[:])

    x = jnp.asarray(rel)
    got_pl = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
    )(x)
    got_jnp = jax.jit(formula)(x)
    a = np.asarray(got_pl)
    b = np.asarray(got_jnp)
    diff = a != b
    print(f"total {a.size} values; differing bins: {diff.sum()}")
    if diff.any():
        idx = np.argwhere(diff)[:10]
        for i, j in idx:
            print(f"  rel={rel[i, j]!r}  mosaic={a[i, j]}  xla={b[i, j]}")
    # also: which side matches float64 ground truth?
    r64 = np.round(rel.astype(np.float64) * 1e5) / 1e5
    gt = np.floor((r64 + 2.0 * ws - 1e-4) / qs).astype(np.int64)
    print(f"mosaic vs fp64 ground truth: {(a != gt).sum()} differ")
    print(f"xla    vs fp64 ground truth: {(b != gt).sum()} differ")


if __name__ == "__main__":
    main()
