"""Train state + optimizer construction.

Optimizer mirrors the reference exactly (``train.py:126-138``): AdamW at
``base_lr`` with weight decay, and a 0.1x learning-rate scale on every
parameter whose path contains ``blocks`` (``transformer_lr_scale``).
The scale is applied to the *final* AdamW update (gradient step + decoupled
weight decay), which is precisely what a torch param-group with
``lr = base_lr * scale`` does.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=params, opt_state=opt_state,
            batch_stats=new_batch_stats)


def _path_contains(path, needle):
    return any(needle in str(getattr(k, "key", k)) for k in path)


def lr_scale_by_path(params, needle="blocks", scale=0.1):
    """Pytree of per-param LR multipliers (reference param-group split)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: scale if _path_contains(path, needle) else 1.0,
        params)


def _scale_updates(scales):
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def make_optimizer(params, schedule, weight_decay=0.01,
                   transformer_lr_scale=0.1, optimizer="AdamW",
                   momentum=0.9, grad_clip=None):
    """AdamW/SGD with blocks-scaled LR (reference ``train.py:126-138``)."""
    if optimizer == "AdamW":
        base = optax.adamw(
            learning_rate=schedule, weight_decay=weight_decay,
            b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer == "SGD":
        base = optax.chain(
            optax.sgd(learning_rate=schedule, momentum=momentum),
            optax.add_decayed_weights(weight_decay),
        )
    else:
        raise ValueError(optimizer)
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(base)
    parts.append(_scale_updates(
        lr_scale_by_path(params, "blocks", transformer_lr_scale)))
    return optax.chain(*parts)


def create_train_state(model, rng, example_batch, schedule, *,
                       weight_decay=0.01, transformer_lr_scale=0.1,
                       optimizer="AdamW", grad_clip=None):
    feats, xyz, offsets = example_batch
    init_fn = jax.jit(
        lambda rngs, f, x, o: model.init(rngs, f, x, o, training=False))
    variables = init_fn(
        {"params": rng, "droppath": jax.random.fold_in(rng, 1)},
        feats, xyz, offsets)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(
        params, schedule, weight_decay, transformer_lr_scale, optimizer,
        grad_clip=grad_clip)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
