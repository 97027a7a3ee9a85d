"""Tests for the window partition / sparse-table machinery."""

import numpy as np
import jax.numpy as jnp

from stratified_transformer_tpu.ops import hashing, windows
from reference_impl import np_window_cells


def make_scene(rng, n_valid, n_pad, batches=2, extent=2.0):
    xyz = rng.uniform(0, extent, size=(n_pad, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, batches, n_valid)).astype(np.int32)
    batch = np.concatenate([batch, np.full(n_pad - n_valid, batches, np.int32)])
    valid = np.arange(n_pad) < n_valid
    return xyz, batch, valid


def test_partition_matches_bruteforce(rng):
    n_valid, n_pad, ws = 150, 192, 0.35
    xyz, batch, valid = make_scene(rng, n_valid, n_pad)
    start = xyz[valid].min(0)
    cells = hashing.window_cells(jnp.asarray(xyz), ws, start=start)
    key = hashing.window_keys(cells, jnp.asarray(batch), jnp.asarray(valid))
    part = windows.partition_windows(key, jnp.asarray(valid))

    order = np.asarray(part.order)
    ss = np.asarray(part.seg_start)
    se = np.asarray(part.seg_end)

    # brute-force groups
    np_cells = np_window_cells(xyz[valid], ws, 0.0, start)
    groups = {}
    for i in range(n_valid):
        k = (int(batch[i]),) + tuple(np_cells[i])
        groups.setdefault(k, set()).add(i)

    inv = np.asarray(part.inv_order)
    for i in range(n_valid):
        p = inv[i]
        members = set(order[ss[p]:se[p]].tolist())
        k = (int(batch[i]),) + tuple(np_cells[i])
        assert members == groups[k], f"point {i}"

    # padding tail: invalid positions sorted last
    assert not np.asarray(part.valid_sorted)[n_valid:].any()
    assert np.asarray(part.valid_sorted)[:n_valid].all()


def test_sparse_table_collects_members(rng):
    n_valid, n_pad, ws = 120, 160, 0.5
    xyz, batch, valid = make_scene(rng, n_valid, n_pad)
    start = xyz[valid].min(0)
    cells = hashing.window_cells(jnp.asarray(xyz), ws, start=start)
    key = np.asarray(
        hashing.window_keys(cells, jnp.asarray(batch), jnp.asarray(valid)))
    is_member = (np.arange(n_pad) % 3 == 0) & valid

    cap = 8
    table, table_keys = windows.sparse_key_table(
        jnp.asarray(key), jnp.asarray(is_member), cap)
    table = np.asarray(table)
    table_keys = np.asarray(table_keys)

    groups = {}
    for i in np.where(is_member)[0]:
        groups.setdefault(int(key[i]), []).append(i)

    used = table_keys != hashing.INVALID_KEY
    assert sorted(table_keys[used].tolist()) == sorted(groups.keys())
    for r in np.where(used)[0]:
        members = set(t for t in table[r] if t >= 0)
        expect = set(groups[int(table_keys[r])][:cap])
        # capacity may drop members but never invent them
        assert members <= set(groups[int(table_keys[r])])
        assert len(members) == min(cap, len(groups[int(table_keys[r])]))

    # lookup
    rows = np.asarray(windows.lookup_rows(
        jnp.asarray(table_keys), jnp.asarray(key)))
    for i in range(n_valid):
        if int(key[i]) in groups:
            assert table_keys[rows[i]] == key[i]
        else:
            assert rows[i] == -1


def test_capacity_overflow_drops_not_corrupts(rng):
    # all member points in one window
    n = 32
    xyz = np.zeros((n, 3), np.float32)
    key = np.zeros(n, np.int32)
    table, table_keys = windows.sparse_key_table(
        jnp.asarray(key), jnp.ones(n, bool), 4)
    table = np.asarray(table)
    assert (table[0] >= 0).sum() == 4
    assert (table[1:] == -1).all()
