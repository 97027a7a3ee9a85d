"""Parallelism: device meshes, data-parallel training, sharded inference.

Replaces the reference's single-node DDP/NCCL stack (``train.py:88-105,
152-161``, ``DistributedSampler`` :199-204) with ``jax.sharding.Mesh`` +
``shard_map``: scenes sharded over the ``data`` axis, gradient ``pmean`` over
ICI, SyncBN via ``psum`` inside the model, multi-host via
``jax.distributed.initialize``.
"""

from stratified_transformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
)
from stratified_transformer_tpu.parallel.dp import (  # noqa: F401
    make_dp_train_step,
    shard_batch,
)
