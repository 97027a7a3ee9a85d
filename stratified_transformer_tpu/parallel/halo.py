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
    """Receptive-field halo width (along the slab axis) for a
    `StratifiedConfig`.

    Influence propagates one hop per attention block: a query reads keys
    in its small window (axis reach ``ws_i``) and stratified far keys in
    its large window (axis reach ``2*ws_i``), so stage ``i`` contributes
    ``depths[i] * 2 * ws_i``. Pooling edges add their kNN search reach:
    with the grid cell-list method the search visits one ring of cells,
    so a TransitionDown/Upsample edge reaches at most ``2 * knn_cell``
    (the hard bound of ``ops.neighbors.grid_knn``); the KPConv stem adds
    its ball-query radius. This is a hard bound for ``neighbor_method=
    "grid"``; for "brute" kNN the pooling terms are practical (density-
    based) rather than worst-case bounds.

    Exactness additionally requires count-independent downsampling
    (``down_quota: "cells"``) — per-scene quotas make selection depend on
    the block's total point count (see StratifiedConfig.down_quota).
    """
    ws = cfg.window_sizes()
    gs = cfg.grid_sizes()
    r = 2.5 * cfg.grid_size * cfg.sigma            # stem ball query
    for i in range(cfg.layer_start, cfg.num_layers):
        r += cfg.depths[i] * 2.0 * ws[i]           # attention hops
    if not cfg.stem_transformer:                   # stem TransitionDown
        r += 2.0 * (gs[0] * 3.0)
    for i in range(cfg.layer_start, cfg.num_layers - 1):
        r += 2.0 * (gs[i] * 3.0)                   # TransitionDown kNN
    for i in range(cfg.layer_start, cfg.num_layers - 1):
        r += 2.0 * (gs[i] * 6.0)                   # Upsample 3-NN (knn_cell
    if not cfg.stem_transformer:                   # = fine_grid * 6)
        r += 2.0 * (gs[0] * 6.0)
    return r


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
                           "core": np.zeros(len(idx), bool),
                           "halo_depth": np.zeros(len(idx), np.float32)})
            continue
        # distance beyond the core slab — the capacity-overflow drop order
        # (farthest halo points go first; core points are never dropped)
        xd = x[idx]
        depth = np.maximum(np.maximum(lo - xd, xd - hi), 0.0)
        blocks.append({"idx": idx, "core": core[idx],
                       "halo_depth": depth.astype(np.float32)})
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
    stats=None,
):
    """Evaluate one big scene across the mesh's devices.

    Args:
      predict_probs: jitted ``(feats [D, n_pad, C], xyz [D, n_pad, 3],
        offsets [D, 1]) -> probs [D, n_pad, num_classes]`` sharded over the
        leading axis.
      coord/feat: full-resolution scene arrays (feat already scaled).
      mesh: 1-D device mesh.
      n_pad: per-device flat capacity.
      stats: optional dict, filled with {"truncated_halo_points",
        "block_points"} — non-zero truncation means the halo no longer
        fully covers the receptive field (core results degrade from exact
        to approximate).

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
    truncated = 0
    for b, blk in enumerate(blocks):
        idx = blk["idx"]
        if len(idx) > n_pad:
            # truncate DEEPEST halo points first (distance beyond the core
            # slab), never core; stable so in-block index order — which
            # downstream tie-breaks rely on — is preserved after re-sort.
            truncated += len(idx) - n_pad
            order = np.argsort(blk["halo_depth"], kind="stable")[:n_pad]
            order.sort()                       # restore global index order
            idx = idx[order]
            core = blk["core"][order]
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

    if stats is not None:
        stats["truncated_halo_points"] = truncated
        stats["block_points"] = [len(i) for i, _ in kept]

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    put = lambda a: jax.device_put(a, sharding)  # noqa: E731
    probs = np.asarray(predict_probs(
        put(feats_b), put(xyz_b), put(offsets_b)))

    out = np.zeros((len(coord), num_classes), np.float64)
    for b, (idx, core) in enumerate(kept):
        sel = np.where(core)[0]
        out[idx[sel]] = probs[b, sel]
    return out
