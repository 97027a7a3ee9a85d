"""LR schedules as pure ``step -> lr`` functions (optax-compatible).

Re-derivation of ``util/lr.py`` + the driver's selection logic
(``train.py:218-246``): MultiStep (epoch-updated), MultiStepWithWarmup
(step-updated, milestones at 60%/80% of training), Poly, PolyWithWarmup,
Squared, Exp. All return multiplicative factors applied to ``base_lr``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _warmup_coeff(step, warmup_iters, warmup_ratio):
    """Linear warmup: ``1 - (1 - s/w) * (1 - ratio)`` for s <= w
    (``util/lr.py:25-29``)."""
    coeff = 1.0 - (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
    return jnp.where(step <= warmup_iters, coeff, 1.0)


def multi_step(base_lr, milestones: Sequence[int], gamma=0.1):
    """torch ``MultiStepLR`` (epoch-stepped in the reference)."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        factor = gamma ** jnp.sum(step >= ms)
        return base_lr * factor
    return schedule


def multi_step_with_warmup(base_lr, milestones, gamma=0.1,
                           warmup_iters=1500, warmup_ratio=1e-6):
    """``MultiStepWithWarmup`` (``util/lr.py:38-55``)."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        factor = gamma ** jnp.sum(step >= ms)
        return base_lr * factor * _warmup_coeff(
            step, warmup_iters, warmup_ratio)
    return schedule


def poly(base_lr, max_iter, power=0.9):
    def schedule(step):
        return base_lr * (1.0 - step / (max_iter + 1)) ** power
    return schedule


def poly_with_warmup(base_lr, max_iter, power=1.0, warmup_iters=1500,
                     warmup_ratio=1e-6):
    def schedule(step):
        coeff = (1.0 - step / (max_iter + 1)) ** power
        return base_lr * coeff * _warmup_coeff(
            step, warmup_iters, warmup_ratio)
    return schedule


def squared(base_lr, max_iter):
    return poly(base_lr, max_iter, power=2.0)


def exponential(base_lr, step_size, gamma=0.9):
    def schedule(step):
        return base_lr * gamma ** (step / step_size)
    return schedule


def step_lr(base_lr, step_size, gamma=0.1):
    """torch ``StepLR`` (``util/lr.py`` initialize_scheduler)."""

    def schedule(step):
        return base_lr * gamma ** (step // step_size)
    return schedule


def one_cycle(max_lr, total_steps, pct_start=0.3, div_factor=25.0,
              final_div_factor=1e4):
    """``OneCycleLR`` (cos anneal): warmup to ``max_lr`` then cosine decay
    (``util/lr.py`` initialize_scheduler OneCycleLR branch)."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = pct_start * total_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = initial + (max_lr - initial) * jnp.minimum(step / up, 1.0)
        t = jnp.clip((step - up) / jnp.maximum(total_steps - up, 1), 0, 1)
        anneal = final + (max_lr - final) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step <= up, warm, anneal)
    return schedule


def from_config(cfg, iter_per_epoch):
    """Build the schedule exactly as the reference driver does
    (``train.py:218-246``). Returns (schedule_fn, update_granularity) where
    granularity is "step" or "epoch"; epoch-updated schedules are expressed
    as step functions of ``step // iter_per_epoch``.
    """
    name = cfg.get("scheduler", "MultiStep")
    update = cfg.get("scheduler_update", "epoch")
    base_lr = cfg["base_lr"]
    epochs = cfg["epochs"]
    if name == "MultiStepWithWarmup":
        milestones = [int(epochs * 0.6) * iter_per_epoch,
                      int(epochs * 0.8) * iter_per_epoch]
        return multi_step_with_warmup(
            base_lr, milestones, 0.1, cfg.get("warmup_iters", 1500),
            cfg.get("warmup_ratio", 1e-6)), "step"
    if name == "MultiStep":
        ms = cfg.get("milestones")
        if ms is not None and not isinstance(ms, (list, tuple)):
            # CLI override: "36,48" (the config coercer may have turned
            # it into a "(36, 48)" tuple repr - strip brackets)
            ms = [x for x in
                  str(ms).strip("()[] ").replace(" ", "").split(",") if x]
        if ms:
            ms_epochs = [int(x) for x in ms]
        else:
            ms_epochs = [int(epochs * 0.6), int(epochs * 0.8)]
        gamma = cfg.get("gamma", 0.1)
        inner = multi_step(base_lr, ms_epochs, gamma)
        return (lambda step: inner(step // iter_per_epoch)), "epoch"
    if name == "Poly":
        power = cfg.get("power", 0.9)
        if update == "epoch":
            inner = poly(base_lr, epochs, power)
            return (lambda step: inner(step // iter_per_epoch)), "epoch"
        return poly(base_lr, epochs * iter_per_epoch, power), "step"
    raise ValueError(f"No such scheduler {name}")
