"""Sharded whole-scene inference: spatial block partition + halo points.

The reference evaluates large scenes with a *serial* chunk loop
(``test_backup.py:238-285``). Here a scene is partitioned into ``D`` spatial
slabs along its longest horizontal axis — one per device — and every slab is
padded with a halo of neighbor points wide enough to cover the model's
receptive field, so each device's forward pass is exact for its core points:

  halo >= top-stage large window (2 * window * 2^(L-1)) + kNN pooling /
  interpolation reach. Default = 2.5x the top-stage window size.

Slabs are batched on a leading device axis and evaluated under a
data-parallel mesh (same layout as ``parallel.dp``); only core-point logits
are scattered back. The host-side partitioner replicates halo points (a
cross-device ``ppermute`` exchange is the on-device upgrade path once block
partitioning itself moves on-device).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def receptive_halo(cfg) -> float:
    """Conservative receptive-field halo width for a `StratifiedConfig`."""
    top_window = cfg.window_sizes()[cfg.num_layers - 1]
    return 2.5 * top_window


def partition_scene(coord, n_blocks, halo, min_points_per_block=1):
    """Split a scene into slabs of equal point count along the longest
    horizontal axis, each with halo replication.

    Returns a list of dicts: {idx: global indices of block points (core +
    halo), core: bool mask over idx}.
    """
    coord = np.asarray(coord)
    extent = coord.max(0) - coord.min(0)
    axis = int(np.argmax(extent[:2])) if coord.shape[1] >= 2 else 0
    x = coord[:, axis]
    # equal-count slab edges
    qs = np.quantile(x, np.linspace(0, 1, n_blocks + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    blocks = []
    for b in range(n_blocks):
        lo, hi = qs[b], qs[b + 1]
        core = (x >= lo) & (x < hi)
        with_halo = (x >= lo - halo) & (x < hi + halo)
        idx = np.where(with_halo)[0]
        if len(idx) < min_points_per_block:
            idx = np.arange(min(len(coord), min_points_per_block))
            blocks.append({"idx": idx,
                           "core": np.zeros(len(idx), bool)})
            continue
        blocks.append({"idx": idx, "core": core[idx]})
    return blocks


def sharded_scene_probs(
    predict_probs: Callable,
    coord,
    feat,
    num_classes,
    *,
    mesh,
    n_pad,
    concat_xyz=True,
    halo=0.5,
):
    """Evaluate one big scene across the mesh's devices.

    Args:
      predict_probs: jitted ``(feats [D, n_pad, C], xyz [D, n_pad, 3],
        offsets [D, 1]) -> probs [D, n_pad, num_classes]`` sharded over the
        leading axis.
      coord/feat: full-resolution scene arrays (feat already scaled).
      mesh: 1-D device mesh.
      n_pad: per-device flat capacity.

    Returns ``probs [N, num_classes]`` for every point (cores exact; points
    never core in any block — impossible by construction — zero).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.devices.size
    blocks = partition_scene(coord, d, halo)
    feats_b = np.zeros((d, n_pad, feat.shape[1] + (3 if concat_xyz else 0)),
                       np.float32)
    xyz_b = np.zeros((d, n_pad, 3), np.float32)
    offsets_b = np.zeros((d, 1), np.int32)
    kept = []
    for b, blk in enumerate(blocks):
        idx = blk["idx"]
        if len(idx) > n_pad:
            # truncate farthest halo points first, never core
            order = np.argsort(~blk["core"], kind="stable")
            idx = idx[order[:n_pad]]
            core = blk["core"][order[:n_pad]]
        else:
            core = blk["core"]
        kept.append((idx, core))
        # Anchor every block at the GLOBAL scene min so all blocks share one
        # window grid (the model anchors windows at the batch min coord,
        # reference model/stratified_transformer.py:277-280) — block results
        # then agree with the whole-scene forward wherever the halo covers
        # the receptive field.
        c = np.asarray(coord[idx], np.float32) - np.asarray(
            coord.min(0), np.float32)
        f = np.asarray(feat[idx], np.float32)
        fcat = np.concatenate([f, c], 1) if concat_xyz else f
        xyz_b[b, :len(idx)] = c
        feats_b[b, :len(idx)] = fcat
        offsets_b[b, 0] = len(idx)

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    put = lambda a: jax.device_put(a, sharding)  # noqa: E731
    probs = np.asarray(predict_probs(
        put(feats_b), put(xyz_b), put(offsets_b)))

    out = np.zeros((len(coord), num_classes), np.float64)
    for b, (idx, core) in enumerate(kept):
        sel = np.where(core)[0]
        out[idx[sel]] = probs[b, sel]
    return out
