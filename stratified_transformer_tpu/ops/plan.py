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


class AttentionPlan(NamedTuple):
    """Sorted-space attention layout for one (stage, parity).

    Attributes:
      order / inv_order: ``[N]`` permutation between original and sorted.
      seg_start / seg_end: ``[N]`` dense segment bounds (sorted space).
      valid_sorted: ``[N]`` bool.
      xyz_sorted: ``[N, 3]``.
      sparse_idx: ``[N, S]`` int32 sorted-space indices of sparse keys
        (-1 empty) or None.
      sparse_mask: ``[N, S]`` bool or None.

      Table-banded sparse layout (all None when ``is_down`` is None):
      table_sorted: ``[N, S]`` int32 — row ``r`` holds the sorted-space
        indices of the ``r``-th large window's downsampled members
        (-1 empty); rows are in ascending large-window-key order.
      cells_sorted: ``[N, 3]`` int32 small-window cells per sorted position
        (for the not-my-small-window exclusion).
      lw_map: ``[N]`` int32 — small-sorted position of each large-sorted
        position (gather small-ordered arrays into large order).
      lw_unmap: ``[N]`` int32 — large-sorted position of each small-sorted
        position (scatter results back).
      lw_row: ``[N]`` int32 — table row of each large-sorted position
        (-1 when its large window has no downsampled members).
    """

    order: jax.Array
    inv_order: jax.Array
    seg_start: jax.Array
    seg_end: jax.Array
    valid_sorted: jax.Array
    xyz_sorted: jax.Array
    sparse_idx: Optional[jax.Array]
    sparse_mask: Optional[jax.Array]
    table_sorted: Optional[jax.Array] = None
    cells_sorted: Optional[jax.Array] = None
    lw_map: Optional[jax.Array] = None
    lw_unmap: Optional[jax.Array] = None
    lw_row: Optional[jax.Array] = None


def build_attention_plan(
    xyz,
    batch,
    valid,
    window_size,
    *,
    shifted,
    is_down=None,
    sparse_cap=64,
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
      sparse_cap: static capacity of sparse keys per query.

    Returns:
      An `AttentionPlan`.
    """
    ws = float(window_size)
    xyz = jnp.asarray(xyz)
    batch = jnp.asarray(batch)
    valid = jnp.asarray(valid)
    start = hashing.masked_min(xyz, valid)
    shift_small = 0.5 * ws if shifted else 0.0
    cells_small = hashing.window_cells(xyz, ws, start=start, shift=shift_small)
    key_small = hashing.window_keys(cells_small, batch, valid)
    part = win.partition_windows(key_small, valid)

    sparse_idx = None
    sparse_mask = None
    if is_down is not None:
        # Large (2x) windows; shifted large partition uses shift = window
        # (= half the large window), reference lines 291-300.
        lws = 2.0 * ws
        shift_large = ws if shifted else 0.0
        cells_large = hashing.window_cells(
            xyz, lws, start=start, shift=shift_large)
        key_large = hashing.window_keys(cells_large, batch, valid)
        table, table_keys = win.sparse_key_table(
            key_large, is_down & valid, sparse_cap)
        row = win.lookup_rows(table_keys, key_large)             # [N]
        n = xyz.shape[0]
        cand = table[jnp.clip(row, 0, n - 1)]                    # [N, S] orig idx
        cand_ok = (row[:, None] >= 0) & (cand >= 0)
        cand_cl = jnp.clip(cand, 0, n - 1)
        # Exclude keys sharing the query's *small* window (any-axis equality
        # of small-window cells, reference ``mask_mat_prev`` lines 28-35).
        same_small = jnp.all(
            cells_small[cand_cl] == cells_small[:, None, :], axis=-1)
        cand_ok &= ~same_small
        cand_ok &= valid[:, None]
        # Remap into sorted space, then reorder rows by the sort.
        cand_sorted_space = jnp.where(
            cand_ok, part.inv_order[cand_cl], -1)
        sparse_idx = cand_sorted_space[part.order]
        sparse_mask = cand_ok[part.order]

        # --- table-banded layout (contiguous table rows per query run) ---
        n = xyz.shape[0]
        table_ok = table >= 0
        table_sorted = jnp.where(
            table_ok, part.inv_order[jnp.clip(table, 0, n - 1)], -1)
        cells_sorted = cells_small[part.order]
        # sort all points by large-window key: queries sharing a large
        # window (hence a table row) become contiguous, and row ids are
        # non-decreasing along this order.
        lw_order = jnp.argsort(
            jnp.where(valid, key_large, hashing.INVALID_KEY),
            stable=True).astype(jnp.int32)
        lw_inv = jnp.zeros((n,), jnp.int32).at[lw_order].set(
            jnp.arange(n, dtype=jnp.int32))
        lw_map = part.inv_order[lw_order]
        lw_unmap = lw_inv[part.order]
        lw_row = row[lw_order]

    return AttentionPlan(
        order=part.order,
        inv_order=part.inv_order,
        seg_start=part.seg_start,
        seg_end=part.seg_end,
        valid_sorted=part.valid_sorted,
        xyz_sorted=xyz[part.order],
        sparse_idx=sparse_idx,
        sparse_mask=sparse_mask,
        table_sorted=None if is_down is None else table_sorted,
        cells_sorted=None if is_down is None else cells_sorted,
        lw_map=None if is_down is None else lw_map,
        lw_unmap=None if is_down is None else lw_unmap,
        lw_row=None if is_down is None else lw_row,
    )
