"""Batch collation into static padded device arrays.

The reference batches ragged scenes by concatenation + cumulative ``offset``
(``util/data_util.py:103-122``) and truncates the batch at
``max_batch_points`` (``collate_fn_limit`` :61-79, dropping whole trailing
scenes). Here the same flat layout is padded to a static ``(n_pad, num_scenes)``
capacity so a single XLA program serves every batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np


class PaddedBatch(NamedTuple):
    """Flat padded batch (all numpy/host; device put by the train loop).

    xyz: ``[n_pad, 3]`` float32; feats: ``[n_pad, C]`` float32;
    labels: ``[n_pad]`` int32 (ignore_label on padding);
    offsets: ``[num_scenes]`` int32 cumulative scene sizes (padding scenes
    repeat the last offset => zero-size);
    target_shift: optional ``[n_pad, 3]`` float32 (DCF offset regression).
    """

    xyz: np.ndarray
    feats: np.ndarray
    labels: np.ndarray
    offsets: np.ndarray
    target_shift: Optional[np.ndarray] = None
    stem_nidx: Optional[np.ndarray] = None
    stem_nmask: Optional[np.ndarray] = None


def mix3d_pairs(scenes, rng=None):
    """Mix3D-style scene mixing (reference ``collate_fn_mix3d``,
    ``util/data_util.py:17-58``): consecutive scene pairs are merged into
    one mixed scene (features/labels concatenated; coordinates kept —
    the reference recenters each constituent before mixing upstream).
    Odd trailing scene passes through."""
    out = []
    i = 0
    while i < len(scenes):
        if i + 1 < len(scenes):
            a, b = scenes[i], scenes[i + 1]
            m = {
                "xyz": np.concatenate([a["xyz"], b["xyz"]]),
                "feats": np.concatenate([a["feats"], b["feats"]]),
                "labels": np.concatenate([a["labels"], b["labels"]]),
            }
            if "target_shift" in a and "target_shift" in b:
                m["target_shift"] = np.concatenate(
                    [a["target_shift"], b["target_shift"]])
            out.append(m)
            i += 2
        else:
            out.append(scenes[i])
            i += 1
    return out


def collate_scenes(
    scenes: Sequence[dict],
    n_pad: int,
    num_scenes: int,
    ignore_label: int = 255,
    max_batch_points: Optional[int] = None,
):
    """Collate per-scene dicts {xyz, feats, labels[, target_shift]}.

    Scenes are taken in order while the running point total fits both
    ``max_batch_points`` (reference semantics) and the static ``n_pad``
    capacity; later scenes are dropped (reference ``collate_fn_limit``
    drops them the same way and logs a warning).
    """
    limit = n_pad if max_batch_points is None else min(n_pad, max_batch_points)
    kept = []
    total = 0
    for s in scenes[:num_scenes]:
        n = len(s["xyz"])
        if kept and total + n > limit:
            break
        if n > limit:
            continue
        kept.append(s)
        total += n

    c = kept[0]["feats"].shape[1]
    xyz = np.zeros((n_pad, 3), np.float32)
    feats = np.zeros((n_pad, c), np.float32)
    labels = np.full((n_pad,), ignore_label, np.int32)
    has_shift = "target_shift" in kept[0]
    shift = np.zeros((n_pad, 3), np.float32) if has_shift else None

    offsets = np.zeros((num_scenes,), np.int32)
    pos = 0
    for i in range(num_scenes):
        if i < len(kept):
            s = kept[i]
            n = len(s["xyz"])
            xyz[pos:pos + n] = s["xyz"]
            feats[pos:pos + n] = s["feats"]
            labels[pos:pos + n] = s["labels"]
            if has_shift:
                shift[pos:pos + n] = s["target_shift"]
            pos += n
        offsets[i] = pos
    return PaddedBatch(
        xyz=xyz, feats=feats, labels=labels, offsets=offsets,
        target_shift=shift)


def with_stem_neighbors(batch: PaddedBatch, radius: float, k: int):
    """Attach host-computed KPConv-stem radius neighbors to a batch.

    Mirrors the reference's CPU ball_query inside the train loop
    (``train.py:324-329``, ``radius = 2.5 * grid_size * sigma``,
    ``K = max_num_neighbors``), keeping the query off the device critical
    path. Uses the C++ grid-hash query (``cpp/ingest.cpp``) with a numpy
    fallback. Empty slots fall back to the point's own index (mask False),
    matching the device path's gather-safe convention.
    """
    from stratified_transformer_tpu.data import native

    n_pad = len(batch.xyz)
    total = int(batch.offsets[-1])
    idx = np.zeros((n_pad, k), np.int32)
    mask = np.zeros((n_pad, k), bool)
    if total > 0:
        raw = native.radius_neighbors(
            batch.xyz[:total], np.asarray(batch.offsets, np.int64),
            float(radius), int(k))
        ok = raw >= 0
        own = np.arange(total, dtype=np.int32)[:, None]
        idx[:total] = np.where(ok, raw, own)
        mask[:total] = ok
    return batch._replace(stem_nidx=idx, stem_nmask=mask)
