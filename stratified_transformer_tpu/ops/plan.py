"""Per-block attention layout ("plan") construction.

Replaces the reference's per-block pair-list construction
(``get_indice_pairs`` + sort/bincount CSR, ``model/stratified_transformer.py:
10-42,302-317``) with a static-shape plan:

  * small-window partition (sorted order + segment bounds) — dense keys;
  * large-window fixed-capacity member table over the FPS-downsampled points
    — stratified sparse keys, with the "not in my small window" exclusion
    (``model/stratified_transformer.py:28-35``).

A plan is built once per (stage, shift-parity) and reused by every block of
that parity, exactly like the reference reuses its four ``grid_sample``
results across the blocks of a ``BasicLayer``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops import hashing
from stratified_transformer_tpu.ops import windows as win


class SparseBandLayout(NamedTuple):
    """Band-structured layout for the stratified sparse (far) keys.

    The FPS/grid-downsampled points are compacted into an auxiliary array
    sorted by *large*-window key, so every large window's members occupy a
    contiguous aux segment; queries are visited in large-window-sorted
    order, where their key segments advance monotonically. A query tile
    then reads its keys with one contiguous ``dynamic_slice`` — no
    per-query gathers (TPU gathers/scatters cost ~constant per index; the
    gather layout measured 93 ms fwd / 437 ms bwd per stage-0 block vs
    8/12 ms for the equally-sized dense band).

    Attributes:
      lw_map:   ``[N]`` small-sorted position of each lw-sorted position.
      lw_unmap: ``[N]`` lw-sorted position of each small-sorted position.
      xyz_lw:   ``[N, 3]`` query coordinates in lw order.
      valid_lw: ``[N]`` bool.
      q_skey_lw: ``[N]`` int32 query small-window key in lw order (for the
        not-my-small-window exclusion, reference ``mask_mat_prev``
        ``model/stratified_transformer.py:28-35``).
      sb_start / sb_end: ``[N]`` int32 aux segment bounds per lw-sorted
        query (empty segment when its large window has no members).
      sb_src:  ``[A]`` int32 small-sorted index of the member at each aux
        slot (-1 pad); ascending large-window key order.
      sb_skey: ``[A]`` int32 member small-window key (INVALID_KEY pad).
      sb_xyz:  ``[A, 3]`` member coordinates.
      sb_valid: ``[A]`` bool.
    """

    lw_map: jax.Array
    lw_unmap: jax.Array
    xyz_lw: jax.Array
    valid_lw: jax.Array
    q_skey_lw: jax.Array
    sb_start: jax.Array
    sb_end: jax.Array
    sb_src: jax.Array
    sb_skey: jax.Array
    sb_xyz: jax.Array
    sb_valid: jax.Array


class AttentionPlan(NamedTuple):
    """Sorted-space attention layout for one (stage, parity).

    Attributes:
      order / inv_order: ``[N]`` permutation between original and sorted.
      seg_start / seg_end: ``[N]`` dense segment bounds (sorted space).
      valid_sorted: ``[N]`` bool.
      xyz_sorted: ``[N, 3]``.
      sparse_band: `SparseBandLayout` or None — the production layout for
        the stratified far keys.
      sparse_idx: ``[N, S]`` int32 sorted-space indices of sparse keys
        (-1 empty) or None — the gather layout, kept as the
        oracle-parity reference path (built on request only).
      sparse_mask: ``[N, S]`` bool or None.
      grid_start: ``[3]`` the window grid origin this plan was built with
        (the explicit anchor, else the batch min of valid points).
        Consumers that quantize positions per window (swin_window RPE)
        MUST use this origin so their modular arithmetic agrees with the
        window partition in the sharded/anchored path.
    """

    order: jax.Array
    inv_order: jax.Array
    seg_start: jax.Array
    seg_end: jax.Array
    valid_sorted: jax.Array
    xyz_sorted: jax.Array
    sparse_band: Optional[SparseBandLayout] = None
    sparse_idx: Optional[jax.Array] = None
    sparse_mask: Optional[jax.Array] = None
    grid_start: Optional[jax.Array] = None


def build_attention_plan(
    xyz,
    batch,
    valid,
    window_size,
    *,
    shifted,
    is_down=None,
    sparse_cap=64,
    aux_pad=None,
    with_sparse_gather=False,
    anchor=None,
):
    """Build the attention layout for one shift parity.

    Args:
      xyz: ``[N, 3]`` float coordinates (original order).
      batch: ``[N]`` int32 scene ids.
      valid: ``[N]`` bool.
      window_size: scalar small-window edge.
      shifted: python bool — shifted partition (odd blocks,
        ``model/stratified_transformer.py:302-307``).
      is_down: optional ``[N]`` bool marking FPS-downsampled points; when
        given, stratified sparse keys are built from the 2x large windows.
      sparse_cap: static capacity of sparse keys per large window.
      aux_pad: static aux-array capacity for the band layout (default
        ``N // 4`` rounded up to 128 — always >= the member count for
        downsample scales >= 4).
      with_sparse_gather: also build the ``sparse_idx``/``sparse_mask``
        gather layout (oracle-parity path; the model uses the band layout).

    Returns:
      An `AttentionPlan`.
    """
    ws = float(window_size)
    xyz = jnp.asarray(xyz)
    batch = jnp.asarray(batch)
    valid = jnp.asarray(valid)
    n = xyz.shape[0]
    # window grid origin: the batch min of valid points (reference
    # grid_sample start=xyz.min(0)), or an explicit global anchor so that
    # spatial blocks of one scene share a single window grid (halo path)
    start = (jnp.asarray(anchor, jnp.float32) if anchor is not None
             else hashing.masked_min(xyz, valid))
    shift_small = 0.5 * ws if shifted else 0.0
    cells_small = hashing.window_cells(xyz, ws, start=start, shift=shift_small)
    key_small = hashing.window_keys(cells_small, batch, valid)
    part = win.partition_windows(key_small, valid)

    sparse_idx = None
    sparse_mask = None
    sparse_band = None
    if is_down is not None:
        # Large (2x) windows; shifted large partition uses shift = window
        # (= half the large window), reference lines 291-300.
        lws = 2.0 * ws
        shift_large = ws if shifted else 0.0
        cells_large = hashing.window_cells(
            xyz, lws, start=start, shift=shift_large)
        key_large = hashing.window_keys(cells_large, batch, valid)
        member = is_down & valid

        # ---- band layout (production path) ----
        # ONE argsort (queries by large-window key); the member compaction
        # and per-query aux segment bounds are derived from it with O(N)
        # prefix scans — members appear in large-key order within the lw
        # order already, so no second sort and no searchsorted is needed.
        if aux_pad is None:
            aux_pad = ((n // 4 + 127) // 128) * 128
        pos = jnp.arange(n, dtype=jnp.int32)
        lw_key_sort = jnp.where(valid, key_large, hashing.INVALID_KEY)
        lw_order = jnp.argsort(lw_key_sort, stable=True).astype(jnp.int32)
        lw_inv = jnp.zeros((n,), jnp.int32).at[lw_order].set(pos)
        lw_map = part.inv_order[lw_order]
        lw_unmap = lw_inv[part.order]
        q_key_lw = lw_key_sort[lw_order]

        head = jnp.concatenate(
            [jnp.ones((1,), bool), q_key_lw[1:] != q_key_lw[:-1]])
        member_lw = member[lw_order] & (q_key_lw != hashing.INVALID_KEY)
        cmem = jnp.cumsum(member_lw)                       # inclusive
        # member rank within its window: exclusive member count at the
        # window head, broadcast forward by cummax
        ex_head = jnp.where(head, cmem - member_lw, 0)
        grp0 = jax.lax.cummax(ex_head)
        mrank = cmem - 1 - grp0
        keep = member_lw & (mrank < sparse_cap)
        kept_cum = jnp.cumsum(keep)                        # inclusive
        slot = jnp.where(keep, kept_cum - 1, aux_pad).astype(jnp.int32)
        sb_src = jnp.full((aux_pad,), -1, jnp.int32).at[slot].set(
            lw_map, mode="drop")
        sb_skey = jnp.full(
            (aux_pad,), hashing.INVALID_KEY, jnp.int32
        ).at[slot].set(key_small[lw_order], mode="drop")
        sb_xyz = jnp.zeros((aux_pad, 3), xyz.dtype).at[slot].set(
            xyz[lw_order], mode="drop")
        sb_valid = sb_src >= 0

        # per-query aux segment bounds: kept-member counts before/through
        # the query's window (empty when the window has no members)
        ex_kept = jnp.where(head, kept_cum - keep, 0)
        sb_start = jax.lax.cummax(ex_kept).astype(jnp.int32)
        tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
        sb_end = jax.lax.cummin(
            jnp.where(tail, kept_cum, n + 1), reverse=True
        ).astype(jnp.int32)
        sparse_band = SparseBandLayout(
            lw_map=lw_map,
            lw_unmap=lw_unmap,
            xyz_lw=xyz[lw_order],
            valid_lw=valid[lw_order],
            q_skey_lw=key_small[lw_order],
            sb_start=sb_start,
            sb_end=sb_end,
            sb_src=sb_src,
            sb_skey=sb_skey,
            sb_xyz=sb_xyz,
            sb_valid=sb_valid,
        )

        # ---- gather layout (oracle / parity testing only) ----
        if with_sparse_gather:
            table, table_keys = win.sparse_key_table(
                key_large, member, sparse_cap)
            row = win.lookup_rows(table_keys, key_large)         # [N]
            cand = table[jnp.clip(row, 0, n - 1)]                # [N, S]
            cand_ok = (row[:, None] >= 0) & (cand >= 0)
            cand_cl = jnp.clip(cand, 0, n - 1)
            # Exclude keys sharing the query's *small* window (reference
            # ``mask_mat_prev`` lines 28-35).
            same_small = key_small[cand_cl] == key_small[:, None]
            cand_ok &= ~same_small
            cand_ok &= valid[:, None]
            cand_sorted_space = jnp.where(
                cand_ok, part.inv_order[cand_cl], -1)
            sparse_idx = cand_sorted_space[part.order]
            sparse_mask = cand_ok[part.order]

    return AttentionPlan(
        order=part.order,
        inv_order=part.inv_order,
        seg_start=part.seg_start,
        seg_end=part.seg_end,
        valid_sorted=part.valid_sorted,
        xyz_sorted=xyz[part.order],
        sparse_band=sparse_band,
        sparse_idx=sparse_idx,
        sparse_mask=sparse_mask,
        grid_start=start,
    )
