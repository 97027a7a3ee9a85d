"""Config, logging, misc utilities."""

from stratified_transformer_tpu.utils.config import (  # noqa: F401
    CfgNode,
    load_cfg,
    merge_cfg_from_list,
)
from stratified_transformer_tpu.utils.logger import get_logger  # noqa: F401


def enable_persistent_cache(path="/root/.jax_cache"):
    """Persistent XLA compilation cache — first-compile costs are minutes on
    small hosts; subsequent runs hit the cache."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
