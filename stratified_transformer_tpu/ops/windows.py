"""Static-shape window partitioning.

The reference builds, per transformer block, a padded point-to-voxel map with
data-dependent shapes (``grid_sample``: ``model/stratified_transformer.py:44-65``)
and then explodes it into ragged CSR pair lists
(``get_indice_pairs``: ``model/stratified_transformer.py:10-42``).

TPU-native replacement: sort points once per (window grid) by an integer
window key. Every window becomes a *contiguous segment* of the sorted order;
attention is evaluated over a fixed-width band of that order with a
``seg_start <= pos < seg_end`` mask — block-diagonal attention with static
shapes, no pair lists, no ``n_max``.

The stratified sparse (far) keys — reference semantics: every point attends
to the FPS-downsampled points that share its *large* (2x) window but not its
small window — become a fixed-capacity per-large-window index table built by
the same sort trick (`sparse_key_table`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops.hashing import INVALID_KEY


class WindowPartition(NamedTuple):
    """Sorted-by-window-key layout of a point set.

    Attributes:
      order:     ``[N]`` int32 — permutation: sorted position -> original idx.
      inv_order: ``[N]`` int32 — original idx -> sorted position.
      key_sorted: ``[N]`` int32 — window key at each sorted position
        (``INVALID_KEY`` for padding points, which sort to the tail).
      seg_start: ``[N]`` int32 — first sorted position of this point's window.
      seg_end:   ``[N]`` int32 — one past the last position of the window.
      valid_sorted: ``[N]`` bool — validity in sorted order.
    """

    order: jax.Array
    inv_order: jax.Array
    key_sorted: jax.Array
    seg_start: jax.Array
    seg_end: jax.Array
    valid_sorted: jax.Array

    @property
    def counts(self):
        """Window population at each sorted position (0 for padding)."""
        return jnp.where(self.valid_sorted, self.seg_end - self.seg_start, 0)


def partition_windows(key, valid) -> WindowPartition:
    """Sort points by window key and derive contiguous segment bounds.

    Equivalent information to the reference's ``(v2p_map, p2v_map, counts)``
    triple (``model/stratified_transformer.py:277``) but with static shapes.

    Args:
      key: ``[N]`` int32 window keys (``INVALID_KEY`` for padding).
      valid: ``[N]`` bool.

    Returns:
      A `WindowPartition`.
    """
    n = key.shape[0]
    key = jnp.where(valid, key, INVALID_KEY)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    key_sorted = key[order]
    valid_sorted = valid[order]

    idx = jnp.arange(n, dtype=jnp.int32)
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(idx)

    head = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(head, idx, 0))
    tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
    seg_end = jax.lax.cummin(
        jnp.where(tail, idx + 1, n), reverse=True
    )
    return WindowPartition(
        order=order,
        inv_order=inv_order,
        key_sorted=key_sorted,
        seg_start=seg_start.astype(jnp.int32),
        seg_end=seg_end.astype(jnp.int32),
        valid_sorted=valid_sorted,
    )


def sparse_key_table(key, is_member, capacity):
    """Fixed-capacity member table per window, plus a key lookup.

    Used for the stratified sparse keys: ``key`` is the *large*-window key of
    every point and ``is_member`` marks the FPS-downsampled points
    (reference ``get_indice_pairs`` downsample_mask,
    ``model/stratified_transformer.py:20-27``). Each large window's members
    are collected into a row of at most ``capacity`` original point indices.

    Args:
      key: ``[N]`` int32 window keys of all points.
      is_member: ``[N]`` bool — point participates as a (sparse) key.
      capacity: static int — max members kept per window; overflow members
        beyond capacity are dropped (the reference's own precedent for
        capacity capping is the 48-point window cap at ``util/voxelize.py:38-42``).

    Returns:
      table: ``[N, capacity]`` int32 — original point indices, -1 = empty.
        Row ``r`` holds the members of the ``r``-th distinct member key (in
        ascending key order).
      table_keys: ``[N]`` int32 — window key of each row (``INVALID_KEY`` for
        unused rows); ascending, so rows are addressable by
        ``jnp.searchsorted(table_keys, query_key)``.
    """
    n = key.shape[0]
    mkey = jnp.where(is_member, key, INVALID_KEY)
    order = jnp.argsort(mkey, stable=True).astype(jnp.int32)
    mkey_sorted = mkey[order]
    idx = jnp.arange(n, dtype=jnp.int32)

    head = jnp.concatenate(
        [jnp.ones((1,), bool), mkey_sorted[1:] != mkey_sorted[:-1]]
    )
    row = jnp.cumsum(head) - 1  # [N] ordinal of the member's window
    seg_start = jax.lax.cummax(jnp.where(head, idx, 0))
    rank = idx - seg_start

    ok = (mkey_sorted != INVALID_KEY) & (rank < capacity)
    # Out-of-bounds row index + mode="drop" discards masked writes.
    row_w = jnp.where(ok, row, n)
    rank_w = jnp.where(ok, rank, 0)

    table = jnp.full((n, capacity), -1, jnp.int32)
    table = table.at[row_w, rank_w].set(order, mode="drop")
    table_keys = jnp.full((n,), INVALID_KEY, jnp.int32)
    table_keys = table_keys.at[jnp.where(ok & head, row, n)].set(
        mkey_sorted, mode="drop"
    )
    return table, table_keys


def lookup_rows(table_keys, query_key):
    """Row index in a `sparse_key_table` for each query key (-1 if absent)."""
    pos = jnp.searchsorted(table_keys, query_key).astype(jnp.int32)
    pos = jnp.clip(pos, 0, table_keys.shape[0] - 1)
    hit = (table_keys[pos] == query_key) & (query_key != INVALID_KEY)
    return jnp.where(hit, pos, -1)
