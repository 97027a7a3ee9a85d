"""Host-side geometry pyramid: downsampling + kNN graphs on the CPU.

Everything the model's TransitionDown / Upsample / stratified-key machinery
derives from coordinates alone — grid-pool sample indices, per-level kNN,
3-NN upsample indices, per-stage downsample membership — can be computed on
the host prefetch thread and shipped with the batch, exactly like the
reference computes its stem ball_query on CPU inside the train loop
(``train.py:324-329``). Device cost at the 40k operating point: ~60-70 ms
of sampling sorts + cell-list kNN per step.

`host_grid_pool` replicates ``ops.sampling.grid_pool_sampling`` semantics
(center-most point per cell, per-scene rank cap, scene-first fill) so host
and device paths agree wherever coordinates are not exactly on cell
boundaries; the host is AUTHORITATIVE when a pyramid is supplied, so 1-ulp
boundary differences only change which equally-valid representative is
picked.
"""

from __future__ import annotations

import numpy as np


def host_grid_pool(xyz, offsets, new_offsets, out_pad, cell_size):
    """numpy replica of ``ops.sampling.grid_pool_sampling``.

    Returns ``(idx [out_pad] int32, valid [out_pad] bool)``.
    """
    xyz = np.asarray(xyz, np.float32)
    offsets = np.asarray(offsets, np.int64)
    new_offsets = np.asarray(new_offsets, np.int64)
    n = len(xyz)
    total = int(offsets[-1])
    idx_out = np.zeros(out_pad, np.int32)
    valid_out = np.zeros(out_pad, bool)

    if total:
        mins = xyz[:total].min(0)
    else:
        mins = np.zeros(3, np.float32)
    cells = np.floor((xyz[:total] - mins) / np.float32(cell_size))
    center = (cells + 0.5) * np.float32(cell_size) + mins
    d2c = ((xyz[:total] - center) ** 2).sum(-1)

    start = 0
    new_start = 0
    for s in range(len(offsets)):
        end = int(offsets[s])
        ns, ne = new_start, int(new_offsets[s])
        count = ne - ns
        # scene-first fill (gathers stay in-scene)
        first = start if end > start else 0
        idx_out[ns:ne] = first
        if end > start and count > 0:
            c = cells[start:end].astype(np.int64)
            hi = c.max(0) + 1                # exact packing, no collisions
            key = (c[:, 0] * hi[1] + c[:, 1]) * hi[2] + c[:, 2]
            # representative = min distance-to-center per cell, first wins;
            # reps emitted in CELL-KEY order with rank capping, matching
            # ops.sampling.grid_pool_sampling's write order
            order = np.lexsort((np.arange(end - start), d2c[start:end], key))
            k_s = key[order]
            head = np.ones(len(k_s), bool)
            head[1:] = k_s[1:] != k_s[:-1]
            take = order[head][:count] + start
            m = len(take)
            idx_out[ns:ns + m] = take.astype(np.int32)
            valid_out[ns:ns + m] = True
        start = end
        new_start = ne
    return idx_out, valid_out


def floor_ratio_counts(offsets, ratio):
    """Per-scene ``floor(count * ratio) + 1`` targets -> new offsets
    (mirrors ``ops.sampling.floor_ratio_counts`` / reference
    ``model/stratified_transformer.py:99-101``)."""
    offsets = np.asarray(offsets, np.int64)
    counts = np.diff(np.concatenate([[0], offsets]))
    new_counts = np.where(counts > 0, (counts * ratio).astype(np.int64) + 1,
                          0)
    return np.cumsum(new_counts)


def occupied_cell_counts(xyz, offsets, cell_size):
    """Per-scene occupied-cell counts -> new offsets (the host mirror of
    ``down_quota: "cells"`` — ops.sampling.grid_pool_sampling_all)."""
    xyz = np.asarray(xyz, np.float32)
    offsets = np.asarray(offsets, np.int64)
    total = int(offsets[-1])
    mins = xyz[:total].min(0) if total else np.zeros(3, np.float32)
    cells = np.floor((xyz[:total] - mins) / np.float32(cell_size)).astype(
        np.int64)
    counts = []
    start = 0
    for s in range(len(offsets)):
        end = int(offsets[s])
        if end > start:
            counts.append(len(np.unique(
                cells[start:end], axis=0)))
        else:
            counts.append(0)
        start = end
    return np.cumsum(np.asarray(counts, np.int64))


def _round_up(n, m):
    return (n + m - 1) // m * m


def build_geometry_pyramid(xyz, offsets, mcfg):
    """Host pyramid for a `StratifiedConfig`-shaped model.

    Returns a pytree dict:
      down:  per TransitionDown level — {"idx", "valid", "offsets",
             "knn_idx", "knn_mask"} (kNN of pooled points vs their level).
      up:    per Upsample (decoder order) — {"idx", "mask"} 3-NN of fine
             points vs coarse points.
      stage_down: per transformer stage — {"is_down"} stratified member
             mask at that stage's level.
    All shapes are static given mcfg; padding is gather-safe.
    """
    from stratified_transformer_tpu.data import native

    cfg = mcfg
    xyz = np.asarray(xyz, np.float32)
    offsets64 = np.asarray(offsets, np.int64)

    levels = [(xyz, offsets64, len(xyz))]
    down = []
    grid_sizes = cfg.grid_sizes()

    # mirror the model's level structure
    level_specs = []
    if not cfg.stem_transformer:
        level_specs.append(("stem_down", 0))
    for i in range(cfg.layer_start, cfg.num_layers - 1):
        level_specs.append(("down", i))

    n_cur = cfg.n_pad
    cells_quota = getattr(cfg, "down_quota", "scene") == "cells"
    for _, i in level_specs:
        cur_xyz, cur_off, _ = levels[-1]
        out_pad = _round_up(int(n_cur * cfg.ratio) + cfg.num_scenes,
                            cfg.tile)
        if cells_quota:
            new_off = np.minimum(occupied_cell_counts(
                cur_xyz, cur_off, grid_sizes[i] * 2.0), out_pad)
        else:
            new_off = floor_ratio_counts(cur_off, cfg.ratio)
        idx, valid = host_grid_pool(
            cur_xyz, cur_off, new_off, out_pad, grid_sizes[i] * 2.0)
        new_xyz = cur_xyz[idx]
        knn_idx = native.knn(new_xyz, _pad_offsets(new_off, out_pad),
                             cur_xyz, cur_off, cfg.k)
        knn_mask = (knn_idx >= 0) & valid[:, None]
        own = np.where(valid, idx, 0)[:, None].astype(np.int32)
        knn_idx = np.where(knn_mask, knn_idx, own).astype(np.int32)
        off32 = np.asarray(new_off, np.int32)
        down.append({"idx": idx, "valid": valid, "offsets": off32,
                     "knn_idx": knn_idx, "knn_mask": knn_mask})
        levels.append((new_xyz, new_off, out_pad))
        n_cur = out_pad

    # decoder: 3-NN of each finer level against the coarser one
    up = []
    for li in range(len(levels) - 1, 0, -1):
        fine_xyz, fine_off, _ = levels[li - 1]
        coarse_xyz, coarse_off, _ = levels[li]
        up_idx, up_d2 = native.knn(
            fine_xyz, fine_off, coarse_xyz, coarse_off, cfg.up_k,
            with_dist=True)
        up_mask = up_idx >= 0
        up_idx = np.where(up_mask, up_idx, 0).astype(np.int32)
        up.append({"idx": up_idx, "mask": up_mask})

    # stratified member masks per transformer stage
    stage_down = []
    if cfg.use_stratified:
        lvl = 1 if not cfg.stem_transformer else 0
        for i in range(cfg.layer_start, cfg.num_layers):
            cur_xyz, cur_off, n_lvl = levels[lvl]
            cnts = np.diff(np.concatenate([[0], cur_off]))
            # n // scale + 1 per non-empty scene — matches the device path
            # (sampling.floor_ratio_counts) and the reference
            # (model/stratified_transformer.py:283-285). "cells" mode
            # mirrors grid_pool_sampling_all (count-independent).
            d_pad = n_lvl // cfg.downsample_scale + cfg.num_scenes
            cell = grid_sizes[i] * float(cfg.downsample_scale) ** 0.5
            if cells_quota:
                d_off = np.minimum(
                    occupied_cell_counts(cur_xyz, cur_off, cell), d_pad)
            else:
                d_off = np.cumsum(
                    np.where(cnts > 0, cnts // cfg.downsample_scale + 1, 0))
            d_idx, d_valid = host_grid_pool(
                cur_xyz, cur_off, d_off, d_pad, cell)
            is_down = np.zeros(n_lvl, bool)
            is_down[d_idx[d_valid]] = True
            stage_down.append({"is_down": is_down})
            lvl += 1

    return {"down": tuple(down), "up": tuple(up),
            "stage_down": tuple(stage_down)}


def _pad_offsets(new_off, out_pad):
    """Offsets padded so the flat capacity tail belongs to no scene."""
    return np.asarray(new_off, np.int64)
