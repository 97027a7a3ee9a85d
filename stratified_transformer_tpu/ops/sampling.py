"""Point down-sampling: exact farthest-point sampling and grid pooling.

Reference semantics (``lib/pointops2/src/sampling/sampling_cuda_kernel.cu:14-129``
via ``pointops.furthestsampling``, ``functions/pointops.py:14-31``): per batch
segment, start from the segment's first point and iteratively add the point
with the maximal distance to the already-selected set; emit indices packed
scene-contiguously (reference offset convention).

Data layout convention (used framework-wide, mirrors the reference's ragged
batching: flat ``[N_pad]`` arrays + traced cumulative ``offsets [B]``,
``train.py:319-321``): points of scene ``b`` occupy flat positions
``[offsets[b-1], offsets[b])``; positions ``>= offsets[-1]`` are padding.
``N_pad`` and ``B`` are static; ``offsets`` values are traced.

Exact FPS is inherently sequential in the number of samples (the reference's
CUDA kernel runs the same serial loop per scene). It is provided for parity
experiments; `grid_pool_sampling` is the fast TPU-friendly alternative
(deterministic center-most-point-per-cell) with per-scene count caps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = float(1e10)  # python float: no backend init at import (multi-host)


def offsets_to_batch(offsets, n_pad):
    """Scene id per flat position; padding tail gets id ``B`` (out of range).

    Mirrors the reference's batch-id derivation from offsets
    (``train.py:319-321``).
    """
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    return jnp.searchsorted(offsets, idx, side="right").astype(jnp.int32)


def offsets_to_valid(offsets, n_pad):
    return jnp.arange(n_pad, dtype=jnp.int32) < offsets[-1]


def floor_ratio_counts(counts, ratio):
    """Per-scene target counts ``int(n * ratio) + 1``.

    Matches both reference formulas: ``TransitionDown``'s
    ``int(n*ratio)+1`` (``model/stratified_transformer.py:98-100``) and
    ``BasicLayer``'s ``n // downsample_scale + 1``
    (``model/stratified_transformer.py:283-285``) for ``ratio = 1/scale``.
    """
    return (jnp.floor(counts.astype(jnp.float32) * ratio)).astype(jnp.int32) + 1


def counts_to_offsets(counts):
    return jnp.cumsum(counts).astype(jnp.int32)


def _scene_starts(offsets):
    return jnp.concatenate([jnp.zeros((1,), offsets.dtype), offsets[:-1]])


def _segment_argmax(score, batch, num_scenes, n):
    """Index of the max-score point per scene (first index on ties)."""
    seg_max = jax.ops.segment_max(score, batch, num_segments=num_scenes + 1)
    seg_max = seg_max[:num_scenes]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_max = score >= seg_max[jnp.clip(batch, 0, num_scenes - 1)]
    is_max &= batch < num_scenes
    cand = jnp.where(is_max, idx, n)
    arg = jax.ops.segment_min(cand, batch, num_segments=num_scenes + 1)
    return jnp.clip(arg[:num_scenes], 0, n - 1).astype(jnp.int32)


def farthest_point_sampling(xyz, offsets, new_offsets, out_pad, *, max_steps=None):
    """Exact per-scene FPS (reference ``pointops.furthestsampling``).

    Args:
      xyz: ``[N_pad, 3]`` float.
      offsets: ``[B]`` traced cumulative scene sizes.
      new_offsets: ``[B]`` traced cumulative sample counts (see
        `floor_ratio_counts` + `counts_to_offsets`).
      out_pad: static output capacity (``>= new_offsets[-1]`` or samples are
        truncated).
      max_steps: static loop bound; defaults to ``out_pad`` (the single-scene
        worst case). Pass a lower bound when the per-scene max is known.

    Returns:
      ``idx [out_pad]`` int32 indices into the flat input (scene-contiguous
      packing per ``new_offsets``), and ``valid [out_pad]`` bool.
    """
    n = xyz.shape[0]
    num_scenes = offsets.shape[0]
    if max_steps is None:
        max_steps = out_pad
    batch = offsets_to_batch(offsets, n)
    valid = offsets_to_valid(offsets, n)
    starts = _scene_starts(offsets).astype(jnp.int32)
    new_starts = _scene_starts(new_offsets).astype(jnp.int32)
    new_counts = new_offsets - new_starts

    xyz32 = xyz.astype(jnp.float32)
    scene_counts = offsets - starts

    out = jnp.zeros((out_pad,), jnp.int32)
    # Step 0: the first point of every (non-empty) scene.
    first = jnp.clip(starts, 0, n - 1)
    write0 = jnp.where((new_counts > 0) & (scene_counts > 0), new_starts, out_pad)
    out = out.at[write0].set(first, mode="drop")

    min_d = jnp.where(valid, BIG, -BIG)

    def body(state, j):
        out, min_d, cur = state
        # Distance of every point to its scene's most recent selection.
        sel_xyz = xyz32[cur]  # [B, 3]
        d = jnp.sum((xyz32 - sel_xyz[jnp.clip(batch, 0, num_scenes - 1)]) ** 2, -1)
        min_d = jnp.minimum(min_d, jnp.where(valid, d, -BIG))
        nxt = _segment_argmax(min_d, batch, num_scenes, n)
        write = jnp.where(
            (j < new_counts) & (j < scene_counts), new_starts + j, out_pad
        )
        out = out.at[write].set(nxt, mode="drop")
        return (out, min_d, nxt), None

    (out, _, _), _ = jax.lax.scan(
        body, (out, min_d, first), jnp.arange(1, max_steps, dtype=jnp.int32)
    )
    out_valid = jnp.arange(out_pad, dtype=jnp.int32) < new_offsets[-1]
    return out, out_valid


def _grid_reps(xyz, offsets, out_pad, cell_size, origin):
    """Shared core of the grid poolers: center-most representative per cell.

    Returns ``(rep_orig, rep_batch, is_rep, starts, batch, n, num_scenes)``
    in KEY-SORTED space (scene-major, then x/y/z cell lexicographic).
    """
    n = xyz.shape[0]
    num_scenes = offsets.shape[0]
    batch = offsets_to_batch(offsets, n)
    valid = offsets_to_valid(offsets, n)
    starts = _scene_starts(offsets).astype(jnp.int32)

    xyz32 = xyz.astype(jnp.float32)
    if origin is None:
        mins = jnp.min(jnp.where(valid[:, None], xyz32, BIG), axis=0)
    else:
        mins = jnp.asarray(origin, jnp.float32)
    cells = jnp.floor((xyz32 - mins) / cell_size).astype(jnp.int32)
    hi = jnp.max(jnp.where(valid[:, None], cells, 0), axis=0) + 1
    key = jnp.clip(batch, 0, num_scenes)
    for a in range(3):
        key = key * hi[a] + jnp.where(valid, cells[:, a], 0)
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    key_s = key[order]
    center = (cells.astype(jnp.float32) + 0.5) * cell_size + mins
    d2c = jnp.sum((xyz32 - center) ** 2, -1)
    d2c_s = d2c[order]

    idx = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg_id = jnp.cumsum(head) - 1
    seg_min = jax.ops.segment_min(d2c_s, seg_id, num_segments=n)
    is_rep = (d2c_s <= seg_min[seg_id]) & (key_s != jnp.iinfo(jnp.int32).max)
    # break ties: first position in segment with the min distance
    first_min = jax.ops.segment_min(
        jnp.where(is_rep, idx, n), seg_id, num_segments=n
    )
    is_rep = is_rep & (idx == first_min[seg_id])
    return order, batch[order], is_rep, starts, batch, n, num_scenes


def grid_pool_sampling(xyz, offsets, new_offsets, out_pad, cell_size,
                       origin=None):
    """Fast approximate FPS: keep the center-most point of each grid cell.

    ``origin``: optional explicit ``[3]`` grid anchor. Default is the batch
    min of valid points; sharded halo inference passes the global scene
    anchor so every block shares one cell grid (parallel/halo.py).

    Deterministic, O(N log N), fully parallel. Per-scene sample counts are
    capped at the `new_offsets` targets (extra representatives are dropped in
    flat order); if a scene yields fewer representatives than its target the
    remaining output slots alias the scene's first point and are marked
    invalid via the per-slot count comparison downstream.

    NOTE on the per-scene cap: the targets come from ``floor_ratio_counts``
    — a function of the scene's TOTAL point count. When the cap binds, which
    cells are dropped depends on that global count, so block-local results
    can't match whole-scene results (the halo-exactness property).
    `grid_pool_sampling_all` is the count-independent variant used by
    sharded inference.

    Returns the same ``(idx, valid)`` contract as `farthest_point_sampling`.
    """
    n = xyz.shape[0]
    num_scenes = offsets.shape[0]
    new_starts = _scene_starts(new_offsets).astype(jnp.int32)
    new_counts = (new_offsets - new_starts).astype(jnp.int32)
    rep_orig, rep_batch, is_rep, starts, batch, n, num_scenes = _grid_reps(
        xyz, offsets, out_pad, cell_size, origin)
    # rank of each representative within its scene (flat sorted order)
    inc = is_rep.astype(jnp.int32)
    cum = jnp.cumsum(inc)
    scene_first = jax.ops.segment_min(
        jnp.where(is_rep, cum - 1, n), rep_batch, num_segments=num_scenes + 1
    )[:num_scenes]
    rank = (cum - 1) - scene_first[jnp.clip(rep_batch, 0, num_scenes - 1)]

    nc = new_counts[jnp.clip(rep_batch, 0, num_scenes - 1)]
    ok = is_rep & (rep_batch < num_scenes) & (rank < nc)
    write = jnp.where(ok, new_starts[jnp.clip(rep_batch, 0, num_scenes - 1)] + rank, out_pad)

    # Default every slot to its scene's first point so gathers stay in-scene.
    out = jnp.zeros((out_pad,), jnp.int32)
    slot = jnp.arange(out_pad, dtype=jnp.int32)
    slot_batch = jnp.searchsorted(new_offsets, slot, side="right").astype(jnp.int32)
    out = jnp.clip(starts, 0, n - 1)[jnp.clip(slot_batch, 0, num_scenes - 1)]
    out = out.at[write].set(rep_orig, mode="drop")

    produced = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.clip(rep_batch, 0, num_scenes - 1),
        num_segments=num_scenes,
    )
    produced = jnp.minimum(produced, new_counts)
    slot_rank = slot - _scene_starts(new_offsets)[jnp.clip(slot_batch, 0, num_scenes - 1)]
    out_valid = (slot_batch < num_scenes) & (
        slot_rank < produced[jnp.clip(slot_batch, 0, num_scenes - 1)]
    )
    return out, out_valid


def grid_pool_sampling_all(xyz, offsets, out_pad, cell_size, origin=None):
    """`grid_pool_sampling` WITHOUT the per-scene count quota: every
    occupied cell keeps its representative (up to the static ``out_pad``
    capacity).

    Selection then depends only on local geometry and the (global) grid
    ``origin`` — the property sharded halo inference needs for block-local
    forwards to equal the whole-scene forward (``parallel/halo.py``): a
    count-derived quota would drop different cells in a block than in the
    full scene. The reference has no analogue (its FPS take exactly
    ``n//scale+1`` points, ``model/stratified_transformer.py:283-285``);
    this is the TPU build's deterministic-geometry sampler for the
    ``down_quota: "cells"`` config mode.

    Returns ``(idx [out_pad], valid [out_pad], new_offsets [B])`` —
    ``new_offsets`` are the dynamic per-scene representative counts
    (cumulative), clipped to ``out_pad``.
    """
    rep_orig, rep_batch, is_rep, starts, batch, n, num_scenes = _grid_reps(
        xyz, offsets, out_pad, cell_size, origin)

    rep_counts = jax.ops.segment_sum(
        is_rep.astype(jnp.int32), jnp.clip(rep_batch, 0, num_scenes - 1),
        num_segments=num_scenes)
    new_offsets = jnp.minimum(
        jnp.cumsum(rep_counts), out_pad).astype(jnp.int32)
    new_starts = _scene_starts(new_offsets).astype(jnp.int32)
    new_counts = (new_offsets - new_starts).astype(jnp.int32)

    # rank of each representative within its scene (flat sorted order)
    inc = is_rep.astype(jnp.int32)
    cum = jnp.cumsum(inc)
    scene_first = jax.ops.segment_min(
        jnp.where(is_rep, cum - 1, n), rep_batch, num_segments=num_scenes + 1
    )[:num_scenes]
    rank = (cum - 1) - scene_first[jnp.clip(rep_batch, 0, num_scenes - 1)]

    nc = new_counts[jnp.clip(rep_batch, 0, num_scenes - 1)]
    ok = is_rep & (rep_batch < num_scenes) & (rank < nc)
    write = jnp.where(
        ok, new_starts[jnp.clip(rep_batch, 0, num_scenes - 1)] + rank,
        out_pad)

    slot = jnp.arange(out_pad, dtype=jnp.int32)
    slot_batch = jnp.searchsorted(
        new_offsets, slot, side="right").astype(jnp.int32)
    out = jnp.clip(starts, 0, n - 1)[jnp.clip(slot_batch, 0, num_scenes - 1)]
    out = out.at[write].set(rep_orig, mode="drop")
    out_valid = slot < new_offsets[-1]
    return out, out_valid, new_offsets


def blocked_fps(xyz, offsets, new_offsets, out_pad, cell_size, *,
                block_cap=256, max_quota=None):
    """Parallel approximate FPS: exact FPS *within* spatial blocks, vmapped.

    The scene is cut into grid blocks of ``cell_size``; each block runs the
    reference FPS recurrence (seed = first point, iteratively add farthest)
    over its own points with a quota proportional to its population. All
    blocks advance in lockstep, so the sequential depth is ``max_quota``
    instead of the per-scene sample count — hundreds of times shallower
    than exact FPS at room scale, with near-identical dispersion.

    Same output contract as `farthest_point_sampling` (scene-contiguous
    packing per ``new_offsets``).
    """
    n = xyz.shape[0]
    num_scenes = offsets.shape[0]
    batch = offsets_to_batch(offsets, n)
    valid = offsets_to_valid(offsets, n)
    starts = _scene_starts(offsets).astype(jnp.int32)
    new_starts = _scene_starts(new_offsets).astype(jnp.int32)
    new_counts = (new_offsets - new_starts).astype(jnp.int32)
    scene_counts = (offsets - starts).astype(jnp.int32)
    ratio = jnp.where(
        scene_counts > 0,
        new_counts.astype(jnp.float32) /
        jnp.maximum(scene_counts, 1).astype(jnp.float32), 0.0)

    xyz32 = jnp.asarray(xyz, jnp.float32)
    mins = jnp.min(jnp.where(valid[:, None], xyz32, BIG), axis=0)
    cells = jnp.floor((xyz32 - mins) / cell_size).astype(jnp.int32)
    hi = jnp.max(jnp.where(valid[:, None], cells, 0), axis=0) + 1
    key = jnp.clip(batch, 0, num_scenes)
    for a in range(3):
        key = key * hi[a] + jnp.where(valid, cells[:, a], 0)
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    # padded per-block member lists (same machinery as sparse_key_table)
    from stratified_transformer_tpu.ops import windows as _win

    table, table_keys = _win.sparse_key_table(key, valid, block_cap)
    used = table_keys != jnp.iinfo(jnp.int32).max          # [N] rows
    member_count = jnp.sum(table >= 0, axis=1)             # [N]
    blk_batch = jnp.where(
        used,
        batch[jnp.clip(table[:, 0], 0, n - 1)], num_scenes)
    quota = jnp.ceil(
        member_count.astype(jnp.float32) *
        ratio[jnp.clip(blk_batch, 0, num_scenes - 1)]).astype(jnp.int32)
    quota = jnp.where(used, jnp.minimum(quota, member_count), 0)
    if max_quota is None:
        max_quota = block_cap

    # vmapped in-block FPS
    tbl_cl = jnp.clip(table, 0, n - 1)
    pts = xyz32[tbl_cl]                                    # [N, cap, 3]
    member_ok = table >= 0

    def block_fps(p, ok, q):
        # p [cap,3]; ok [cap]; q scalar quota
        cap = p.shape[0]
        mind = jnp.where(ok, BIG, -BIG)
        sel0 = jnp.int32(0)
        chosen = jnp.zeros((cap,), bool).at[0].set(q > 0)

        def body(state, j):
            mind, last, chosen = state
            dd = jnp.sum((p - p[last]) ** 2, -1)
            mind = jnp.minimum(mind, jnp.where(ok, dd, -BIG))
            mind = jnp.where(chosen, -BIG, mind)
            nxt = jnp.argmax(mind).astype(jnp.int32)
            take = j < q
            chosen = chosen.at[nxt].set(take | chosen[nxt])
            return (mind, jnp.where(take, nxt, last), chosen), None

        (_, _, chosen), _ = jax.lax.scan(
            body, (mind, sel0, chosen),
            jnp.arange(1, max_quota, dtype=jnp.int32))
        return chosen

    chosen = jax.vmap(block_fps)(pts, member_ok, quota)    # [N, cap]
    sel_flat = (chosen & member_ok).reshape(-1)
    idx_flat = tbl_cl.reshape(-1)

    # pack per scene (flat order), truncating to per-scene targets
    sel_batch = jnp.where(
        sel_flat, batch[idx_flat], num_scenes)
    order = jnp.argsort(
        jnp.where(sel_flat, sel_batch, num_scenes + 1), stable=True)
    sb_sorted = sel_batch[order]
    idx_sorted = idx_flat[order]
    pos = jnp.arange(sel_flat.shape[0], dtype=jnp.int32)
    scene_first = jax.ops.segment_min(
        jnp.where(sb_sorted < num_scenes, pos, sel_flat.shape[0]),
        jnp.clip(sb_sorted, 0, num_scenes - 1), num_segments=num_scenes)
    rank = pos - scene_first[jnp.clip(sb_sorted, 0, num_scenes - 1)]
    nc = new_counts[jnp.clip(sb_sorted, 0, num_scenes - 1)]
    ok = (sb_sorted < num_scenes) & (rank < nc)
    write = jnp.where(
        ok, new_starts[jnp.clip(sb_sorted, 0, num_scenes - 1)] + rank,
        out_pad)

    slot = jnp.arange(out_pad, dtype=jnp.int32)
    slot_batch = jnp.searchsorted(
        new_offsets, slot, side="right").astype(jnp.int32)
    out = jnp.clip(starts, 0, n - 1)[
        jnp.clip(slot_batch, 0, num_scenes - 1)]
    out = out.at[write].set(idx_sorted, mode="drop")

    produced = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.clip(sb_sorted, 0, num_scenes - 1),
        num_segments=num_scenes)
    produced = jnp.minimum(produced, new_counts)
    slot_rank = slot - _scene_starts(new_offsets)[
        jnp.clip(slot_batch, 0, num_scenes - 1)]
    out_valid = (slot_batch < num_scenes) & (
        slot_rank < produced[jnp.clip(slot_batch, 0, num_scenes - 1)])
    return out, out_valid
