"""Jittable train / eval steps.

Replaces the reference's per-batch loop body (``train.py:314-358``): forward,
CE(+L1) loss, backward, optimizer step, IoU counters — one XLA program.
Under data parallelism the same step runs inside ``shard_map`` with gradient
``pmean`` over the mesh (the reference's DDP allreduce, ``train.py:152-161``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.data import compress
from stratified_transformer_tpu.ops import sampling
from stratified_transformer_tpu.train import losses, metrics


def make_train_step(ignore_label, num_classes, offset_weight=1.0,
                    axis_name: Optional[str] = None):
    """Returns ``train_step(state, batch, rng) -> (state, stats)``.

    ``batch`` is a dict with ``feats/xyz/offsets/labels`` (+ optional
    ``target_shift``) — see ``data.collate.PaddedBatch``.
    """

    def train_step(state, batch, rng):
        # uint16 payload narrowing (data/compress.py) widens back here —
        # a fused no-op when the loader shipped int32
        batch = compress.widen_batch(batch)
        n = batch["xyz"].shape[0]
        valid = sampling.offsets_to_valid(batch["offsets"], n)
        step_rng = jax.random.fold_in(rng, state.step)
        dp_rng, do_rng = jax.random.split(step_rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (logits, shift), updated = state.apply_fn(
                variables, batch["feats"], batch["xyz"], batch["offsets"],
                training=True, mutable=["batch_stats"],
                stem_nidx=batch.get("stem_nidx"),
                stem_nmask=batch.get("stem_nmask"),
                pyramid=batch.get("pyramid"),
                rngs={"droppath": dp_rng, "dropout": do_rng})
            loss_seg = losses.cross_entropy(
                logits, batch["labels"], ignore_label, valid)
            loss = loss_seg
            loss_off = jnp.zeros((), jnp.float32)
            if shift is not None and batch.get("target_shift") is not None:
                loss_off = losses.l1_offset(
                    shift, batch["target_shift"], valid)
                loss = loss + offset_weight * loss_off
            return loss, (updated["batch_stats"], logits, loss_seg, loss_off)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_stats, logits, loss_seg, loss_off = aux
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        state = state.apply_gradients(grads, new_stats)

        pred = jnp.argmax(logits, -1)
        inter, union, target = metrics.intersection_and_union(
            pred, batch["labels"], num_classes, ignore_label, valid)
        stats = {
            "loss": loss, "loss_seg": loss_seg, "loss_offset": loss_off,
            "intersection": inter, "union": union, "target": target,
            "points": jnp.sum(valid),
        }
        if axis_name is not None:
            stats = jax.tree.map(
                lambda x: jax.lax.psum(x, axis_name), stats)
        return state, stats

    return train_step


def make_split_train_step(ignore_label, num_classes, offset_weight=1.0):
    """Two-program train step: grad (model fwd+bwd + metrics) and a pure
    optimizer update.

    The axon TPU runtime intermittently fails (`INVALID_ARGUMENT`) when a
    single program combines Pallas custom calls with the full optimizer
    state threading (docs/PERF_NOTES.md); splitting isolates the Pallas
    work in a small-state program and keeps the optax update Pallas-free.
    Two dispatches cost ~1 ms against a multi-hundred-ms step.

    Returns ``step(state, batch, rng) -> (state, stats)`` with the same
    contract as `make_train_step` (no donation).
    """

    @jax.jit
    def grad_step(state, batch, rng):
        # jit prunes unused args (keep_unused=False default): the optimizer
        # state never enters this program.
        batch = compress.widen_batch(batch)
        n = batch["xyz"].shape[0]
        valid = sampling.offsets_to_valid(batch["offsets"], n)
        step_rng = jax.random.fold_in(rng, state.step)
        dp_rng, do_rng = jax.random.split(step_rng)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            (logits, shift), updated = state.apply_fn(
                variables, batch["feats"], batch["xyz"], batch["offsets"],
                training=True, mutable=["batch_stats"],
                stem_nidx=batch.get("stem_nidx"),
                stem_nmask=batch.get("stem_nmask"),
                pyramid=batch.get("pyramid"),
                rngs={"droppath": dp_rng, "dropout": do_rng})
            loss_seg = losses.cross_entropy(
                logits, batch["labels"], ignore_label, valid)
            loss = loss_seg
            loss_off = jnp.zeros((), jnp.float32)
            if shift is not None and batch.get("target_shift") is not None:
                loss_off = losses.l1_offset(
                    shift, batch["target_shift"], valid)
                loss = loss + offset_weight * loss_off
            return loss, (updated["batch_stats"], logits, loss_seg, loss_off)

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_stats, logits, loss_seg, loss_off = aux
        pred = jnp.argmax(logits, -1)
        inter, union, target = metrics.intersection_and_union(
            pred, batch["labels"], num_classes, ignore_label, valid)
        stats = {
            "loss": loss, "loss_seg": loss_seg, "loss_offset": loss_off,
            "intersection": inter, "union": union, "target": target,
            "points": jnp.sum(valid),
        }
        return grads, new_stats, stats

    @jax.jit
    def opt_step(state, grads, new_stats):
        return state.apply_gradients(grads, new_stats)

    def step(state, batch, rng):
        grads, new_stats, stats = grad_step(state, batch, rng)
        return opt_step(state, grads, new_stats), stats

    return step


def make_eval_step(ignore_label, num_classes, axis_name=None):
    """Forward-only step returning logits + IoU counters (val loop,
    reference ``train_backup.py:397-409`` / ``validate``)."""

    def eval_step(state, batch):
        batch = compress.widen_batch(batch)
        n = batch["xyz"].shape[0]
        valid = sampling.offsets_to_valid(batch["offsets"], n)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits, shift = state.apply_fn(
            variables, batch["feats"], batch["xyz"], batch["offsets"],
            training=False,
            stem_nidx=batch.get("stem_nidx"),
            stem_nmask=batch.get("stem_nmask"),
            pyramid=batch.get("pyramid"))
        loss = losses.cross_entropy(
            logits, batch["labels"], ignore_label, valid)
        pred = jnp.argmax(logits, -1)
        inter, union, target = metrics.intersection_and_union(
            pred, batch["labels"], num_classes, ignore_label, valid)
        stats = {"loss": loss, "intersection": inter, "union": union,
                 "target": target, "points": jnp.sum(valid)}
        if axis_name is not None:
            stats = jax.tree.map(
                lambda x: jax.lax.psum(x, axis_name), stats)
        return logits, shift, stats

    return eval_step
