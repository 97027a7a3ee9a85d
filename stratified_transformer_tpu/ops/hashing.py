"""Window / voxel key computation (jittable, static shapes).

Replaces ``torch_geometric.nn.voxel_grid`` as used by the reference at
``model/stratified_transformer.py:44-65`` (``grid_sample``): points are
assigned an integer cell id per (batch, floor((xyz - start) / size)) tuple.

The reference materialises ``unique`` + a padded point-to-voxel map with a
data-dependent ``k = counts.max()`` (``model/stratified_transformer.py:59-63``)
— shapes XLA cannot compile. Here we only ever produce *keys*; downstream code
sorts by key and derives contiguous segments, which keeps every shape static.
"""

from __future__ import annotations

import jax.numpy as jnp

# Sentinel key for padding points: sorts after every real key.
INVALID_KEY = jnp.iinfo(jnp.int32).max


def window_cells(xyz, window_size, *, start, shift=0.0):
    """Integer grid cell per point.

    Mirrors reference ``grid_sample(xyz + shift, batch, window_size,
    start=xyz_min)`` (``model/stratified_transformer.py:277-300``): the
    shifted partition is computed by offsetting the coordinates by half a
    window before flooring, with the grid origin anchored at the *unshifted*
    min coordinate.

    Args:
      xyz: ``[N, 3]`` float coordinates.
      window_size: scalar or ``[3]`` window edge length.
      start: ``[3]`` grid origin (min corner of the valid points).
      shift: scalar or ``[3]`` added to coordinates before flooring.

    Returns:
      ``[N, 3]`` int32 cell coordinates (non-negative for points >= start).
    """
    ws = jnp.asarray(window_size, dtype=xyz.dtype)
    cells = jnp.floor((xyz + shift - start) / ws)
    return cells.astype(jnp.int32)


def window_keys(cells, batch, valid, *, cells_hi=None):
    """Fuse (batch, cell) into a single sortable int32 key.

    The multipliers are derived from the (traced) per-axis cell maxima so the
    packing is collision-free for the batch at hand. Room-scale scenes
    (~8 m extent, window >= 0.16 m => <= ~64 cells/axis, <= 16 scenes) stay
    far below int32 range.

    Args:
      cells: ``[N, 3]`` int32 cell coordinates.
      batch: ``[N]`` int32 scene id of each point.
      valid: ``[N]`` bool mask; invalid points get ``INVALID_KEY`` so they
        sort to the tail and never share a segment with real points.
      cells_hi: optional static ``[3]`` upper bounds for the cell coords; when
        ``None`` the (traced) data max is used.

    Returns:
      ``[N]`` int32 keys.
    """
    big_neg = jnp.int32(0)
    c = jnp.where(valid[:, None], cells, big_neg)
    if cells_hi is None:
        hi = jnp.max(c, axis=0) + 1  # [3], traced
    else:
        hi = jnp.asarray(cells_hi, jnp.int32)
    key = batch.astype(jnp.int32)
    for a in range(3):
        key = key * hi[a] + c[:, a]
    return jnp.where(valid, key, INVALID_KEY)


def masked_min(xyz, valid):
    """Per-axis min over valid points; mirrors ``xyz.min(0)`` at
    ``model/stratified_transformer.py:28,280`` but ignores padding."""
    big = jnp.asarray(jnp.finfo(xyz.dtype).max, xyz.dtype)
    return jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
