"""Losses: masked cross-entropy (ignore_label) + L1 offset regression.

Reference: ``nn.CrossEntropyLoss(ignore_index=ignore_label)`` +
``offset_weight * L1Loss(pred_shift, target_shift)`` (``train.py:123-124,
341-345``); label-smoothing variant at ``util/common_util.py:180-185``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, ignore_label, valid=None, smoothing=0.0):
    """Mean CE over non-ignored valid points."""
    mask = labels != ignore_label
    if valid is not None:
        mask &= valid
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if smoothing > 0.0:
        n_class = logits.shape[-1]
        one_hot = jax.nn.one_hot(safe, n_class) * (1 - smoothing) + (
            smoothing / n_class)
        nll = -jnp.sum(one_hot * logp, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(mask, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)


def l1_offset(pred_shift, target_shift, valid):
    """Mean absolute error over valid points (reference ``l1loss``)."""
    err = jnp.abs(pred_shift.astype(jnp.float32) -
                  target_shift.astype(jnp.float32))
    err = jnp.where(valid[:, None], err, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid) * 3, 1)
