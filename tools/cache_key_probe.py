"""Which cache-key component is nondeterministic across axon processes?

Every fused process pays ~650 s of Mosaic warmup compile despite the
persistent cache (BENCH_r04, VERDICT weak #4): same-config processes write
DIFFERENT jit_fwd keys (5 distinct entries in /root/.jax_cache). The key =
hash(computation, jaxlib version, backend version, XLA flags,
compile_options, accelerator_config, compression, custom_hook); this probe
jits a tiny Mosaic kernel with cache-key DEBUG logging on and prints the
per-component hashes — run it twice (two processes) and diff.

python tools/cache_key_probe.py
"""

import logging
import sys

sys.path.insert(0, ".")

from stratified_transformer_tpu.utils import enable_persistent_cache
enable_persistent_cache()

logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
for noisy in ("jax._src.compiler", "jax._src.interpreters",
              "jax._src.dispatch", "absl"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


@jax.jit
def f(x):
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(x)


x = jnp.ones((128, 128), jnp.float32)
print("platform:", jax.devices()[0].platform)
print("platform_version:", jax.devices()[0].client.platform_version)
print("result ok:", float(f(x).sum()))
