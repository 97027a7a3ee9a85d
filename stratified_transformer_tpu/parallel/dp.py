"""Data-parallel training over a mesh via ``shard_map``.

Layout: every device owns one padded flat micro-batch; batch arrays carry a
leading device axis ``[D, ...]`` sharded over the mesh's ``data`` axis.
Gradients are ``pmean``-ed inside the mapped function (DDP-allreduce
equivalent) and the optimizer step runs replicated, so parameters stay
identical across devices. SyncBN statistics ``psum`` over the same axis
inside `MaskedBatchNorm` (set ``StratifiedConfig.bn_axis_name="data"``).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stratified_transformer_tpu.train.step import make_train_step


def shard_batch(batches, mesh: Mesh):
    """Stack per-device host batches [D, ...] and device_put sharded."""
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), stacked)


def make_dp_train_step(mesh: Mesh, ignore_label, num_classes,
                       offset_weight=1.0, axis_name="data"):
    """Sharded train step: ``(state, batch[D,...], rng) -> (state, stats)``.

    ``state`` is replicated; ``stats`` are globally reduced (psum).
    """
    inner = make_train_step(
        ignore_label, num_classes, offset_weight, axis_name=axis_name)

    def local_step(state, batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)  # [1, ...] -> [...]
        return inner(state, batch, rng)

    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
