"""Segmentation metrics (jittable) + host-side meters.

``intersection_and_union`` mirrors ``util/common_util.py:45-72``; under a
data-parallel mesh the sums are global (the reference all_reduces them,
``train_backup.py:397-409``; XLA's sharded reductions do it implicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def intersection_and_union(pred, target, num_classes, ignore_label,
                           valid=None):
    """Returns (intersection[num_classes], union[...], target[...]) counts."""
    mask = target != ignore_label
    if valid is not None:
        mask &= valid
    pred = jnp.where(mask, pred, num_classes)
    target = jnp.where(mask, target, num_classes)
    inter = jnp.where(pred == target, pred, num_classes)

    def hist(x):
        return jnp.bincount(x, length=num_classes + 1)[:num_classes]

    area_inter = hist(inter)
    area_pred = hist(pred)
    area_target = hist(target)
    union = area_pred + area_target - area_inter
    return area_inter, union, area_target


def iou_from_counts(inter, union, target):
    """Per-class IoU / accuracy + means (host-side numpy)."""
    inter = np.asarray(inter, np.float64)
    union = np.asarray(union, np.float64)
    target = np.asarray(target, np.float64)
    iou = inter / np.maximum(union, 1e-10)
    acc = inter / np.maximum(target, 1e-10)
    return {
        "iou_class": iou,
        "acc_class": acc,
        "miou": float(iou.mean()),
        "macc": float(acc.mean()),
        "all_acc": float(inter.sum() / max(target.sum(), 1e-10)),
    }


class AverageMeter:
    """Running average (reference ``util/common_util.py:13-28``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def memory_use():
    """Device memory usage in GB (reference ``util/common_util.py:170-177``
    ``memory_use`` analogue via jax memory_stats)."""
    import jax

    out = {}
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        out[str(dev)] = {
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2 ** 30,
            "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2 ** 30,
        }
    return out
