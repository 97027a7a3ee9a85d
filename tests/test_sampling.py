"""Tests for FPS and grid-pool sampling."""

import numpy as np
import jax.numpy as jnp

from stratified_transformer_tpu.ops import sampling
from reference_impl import np_fps


def test_fps_matches_reference(rng):
    n1, n2 = 60, 45
    n_pad = 128
    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    offsets = np.array([n1, n1 + n2], np.int32)
    counts = offsets - np.array([0, n1])
    new_counts = sampling.floor_ratio_counts(jnp.asarray(counts), 0.25)
    new_offsets = np.asarray(sampling.counts_to_offsets(new_counts))

    idx, valid = sampling.farthest_point_sampling(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(new_offsets),
        out_pad=40,
    )
    idx = np.asarray(idx)
    valid = np.asarray(valid)

    expect = np_fps(xyz, offsets.tolist(), new_offsets.tolist())
    m = new_offsets[-1]
    assert valid[:m].all() and not valid[m:].any()
    np.testing.assert_array_equal(idx[:m], expect)


def test_fps_single_scene(rng):
    n = 50
    n_pad = 64
    xyz = rng.uniform(0, 1, (n_pad, 3)).astype(np.float32)
    offsets = np.array([n], np.int32)
    new_offsets = np.array([13], np.int32)
    idx, valid = sampling.farthest_point_sampling(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(new_offsets),
        out_pad=16,
    )
    expect = np_fps(xyz, [n], [13])
    np.testing.assert_array_equal(np.asarray(idx)[:13], expect)


def test_grid_pool_basics(rng):
    n1, n2 = 70, 50
    n_pad = 128
    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    offsets = np.array([n1, n1 + n2], np.int32)
    counts = offsets - np.array([0, n1])
    new_counts = sampling.floor_ratio_counts(jnp.asarray(counts), 0.25)
    new_offsets = sampling.counts_to_offsets(new_counts)

    idx, valid = sampling.grid_pool_sampling(
        jnp.asarray(xyz), jnp.asarray(offsets), new_offsets,
        out_pad=48, cell_size=0.4,
    )
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    new_offsets = np.asarray(new_offsets)

    batch = np.searchsorted(offsets, np.arange(n_pad), side="right")
    # every valid sample is a real point of the right scene, no duplicates
    starts = np.array([0, n1])
    sel0 = idx[valid & (np.arange(48) < new_offsets[0])]
    sel1 = idx[valid & (np.arange(48) >= new_offsets[0])]
    assert (batch[sel0] == 0).all()
    assert (batch[sel1] == 1).all()
    assert len(set(sel0.tolist())) == len(sel0)
    assert len(set(sel1.tolist())) == len(sel1)
    # respects per-scene caps
    assert (valid[: new_offsets[0]].sum()) <= new_offsets[0]
    # samples cover the scene reasonably (at least one per occupied cell,
    # up to the cap)
    assert valid.sum() > 8


def test_floor_ratio_counts():
    counts = jnp.asarray([16, 17, 1, 100])
    out = np.asarray(sampling.floor_ratio_counts(counts, 0.25))
    np.testing.assert_array_equal(out, [5, 5, 1, 26])
    out8 = np.asarray(sampling.floor_ratio_counts(counts, 1.0 / 8.0))
    np.testing.assert_array_equal(out8, [3, 3, 1, 13])


def test_blocked_fps_structure(rng):
    from stratified_transformer_tpu.ops.sampling import blocked_fps
    n1, n2 = 300, 200
    n_pad = 512
    xyz = rng.uniform(0, 4, (n_pad, 3)).astype(np.float32)
    offsets = np.array([n1, n1 + n2], np.int32)
    counts = offsets - np.array([0, n1])
    new_counts = sampling.floor_ratio_counts(jnp.asarray(counts), 0.25)
    new_offsets = np.asarray(sampling.counts_to_offsets(new_counts))

    idx, valid = blocked_fps(
        jnp.asarray(xyz), jnp.asarray(offsets), jnp.asarray(new_offsets),
        out_pad=160, cell_size=1.0, block_cap=128, max_quota=64)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    batch = np.searchsorted(offsets, np.arange(n_pad), side="right")

    # samples in the right scene slots, no duplicates among valid
    sel0 = idx[valid & (np.arange(160) < new_offsets[0])]
    sel1 = idx[valid & (np.arange(160) >= new_offsets[0])]
    assert (batch[sel0] == 0).all()
    assert (batch[sel1] == 1).all()
    assert len(set(sel0.tolist())) == len(sel0)
    assert len(set(sel1.tolist())) == len(sel1)
    # close to the per-scene targets
    t0, t1 = int(new_counts[0]), int(new_counts[1])
    assert len(sel0) >= 0.8 * t0 and len(sel0) <= t0
    assert len(sel1) >= 0.8 * t1 and len(sel1) <= t1

    # dispersion sanity: blocked FPS min-pairwise distance should beat
    # random sampling of the same count
    pts = xyz[sel0]
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1e9)
    fps_min = d2.min()
    rand_sel = rng.choice(n1, size=len(sel0), replace=False)
    rpts = xyz[rand_sel]
    rd2 = ((rpts[:, None] - rpts[None]) ** 2).sum(-1)
    np.fill_diagonal(rd2, 1e9)
    assert fps_min >= rd2.min() * 0.8


def test_grid_pool_sampling_all_keeps_every_cell(rng):
    """`grid_pool_sampling_all` (down_quota='cells'): one representative per
    occupied cell, independent of scene point COUNT — the property halo
    inference needs (a subset scene selects the same representatives for
    its cells as the full scene)."""
    import jax.numpy as jnp
    from stratified_transformer_tpu.ops.sampling import (
        grid_pool_sampling_all)

    n0, n1 = 300, 200
    xyz = np.zeros((600, 3), np.float32)
    xyz[:n0] = rng.uniform(0, 4, (n0, 3))
    xyz[n0:n0 + n1] = rng.uniform(0, 4, (n1, 3))
    offsets = np.array([n0, n0 + n1], np.int32)
    cell = 0.9
    idx, valid, new_off = grid_pool_sampling_all(
        jnp.asarray(xyz), jnp.asarray(offsets), 512, cell,
        origin=jnp.zeros(3))
    idx, valid, new_off = map(np.asarray, (idx, valid, new_off))

    # per-scene: selected = exactly the occupied cells' center-most points
    for s, (lo, hi) in enumerate([(0, n0), (n0, n0 + n1)]):
        cells = np.floor(xyz[lo:hi] / cell).astype(int)
        uniq = set(map(tuple, cells))
        s_lo = 0 if s == 0 else new_off[0]
        sel = idx[s_lo:new_off[s]]
        assert valid[s_lo:new_off[s]].all()
        assert len(sel) == len(uniq)
        # every selected point is the center-most of its cell
        for p in sel:
            c = np.floor(xyz[p] / cell).astype(int)
            members = np.where((cells == c).all(1))[0] + lo
            ctr = (c + 0.5) * cell
            d = ((xyz[members] - ctr) ** 2).sum(-1)
            assert p == members[np.argmin(d)]

    # count-independence: drop half of scene 1's points NOT in a chosen
    # cell; the chosen cell's representative must not change
    target = idx[0]
    c_t = np.floor(xyz[target] / cell).astype(int)
    keep = np.ones(n0, bool)
    others = np.where(~(np.floor(xyz[:n0] / cell).astype(int)
                        == c_t).all(1))[0]
    keep[others[::2]] = False
    xyz_sub = np.concatenate([xyz[:n0][keep], xyz[n0:n0 + n1]])
    off_sub = np.array(
        [keep.sum(), keep.sum() + n1], np.int32)
    pad = np.zeros((600 - len(xyz_sub), 3), np.float32)
    idx2, valid2, _ = grid_pool_sampling_all(
        jnp.asarray(np.concatenate([xyz_sub, pad])),
        jnp.asarray(off_sub), 512, cell, origin=jnp.zeros(3))
    idx2 = np.asarray(idx2)
    sel2 = idx2[np.asarray(valid2)]
    remap = np.where(keep)[0]
    sel2_orig = [remap[i] if i < keep.sum() else None for i in sel2
                 if i < keep.sum()]
    assert target in sel2_orig


def test_truncation_audit_counts(rng):
    """train/audit.py: zero drops at generous caps; non-zero when caps are
    forced tiny (the counters bite)."""
    import jax
    from stratified_transformer_tpu.models.stratified import (
        StratifiedConfig)
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    from stratified_transformer_tpu.train.audit import audit_truncation
    from __graft_entry__ import _example_batch

    base = dict(num_classes=13, in_channels=6, n_pad=2048, num_scenes=2,
                channels=(16, 32), depths=(1, 1), num_heads=(2, 4),
                num_layers=2, tile=128, sampler="grid")
    cfg = StratifiedConfig(**base, band=128, sparse_cap=48, s_band=128)
    b = _example_batch(cfg.n_pad, cfg.num_scenes, cfg.in_channels)
    pyr = build_geometry_pyramid(b.xyz, b.offsets, cfg)
    batch = {"xyz": b.xyz, "offsets": b.offsets, "pyramid": pyr}
    stats = jax.tree.map(int, audit_truncation(cfg, batch))
    for k, s in stats.items():
        assert s["band_dropped"] == 0, (k, s)
        assert s["cap_dropped"] == 0, (k, s)

    cfg2 = StratifiedConfig(**base, band=4, sparse_cap=2, s_band=16)
    stats2 = jax.tree.map(int, audit_truncation(cfg2, batch))
    total_dropped = sum(
        s["band_dropped"] + s["sband_dropped"] + s["cap_dropped"]
        for s in stats2.values())
    assert total_dropped > 0


def test_truncation_audit_packed_matches_dict(rng):
    """audit_truncation_packed (the one-transfer form the driver logs use)
    unpacks to exactly the dict form."""
    import jax
    from stratified_transformer_tpu.models.stratified import (
        StratifiedConfig)
    from stratified_transformer_tpu.data.pyramid import (
        build_geometry_pyramid)
    from stratified_transformer_tpu.train.audit import (
        audit_truncation, audit_truncation_packed, unpack_truncation)
    from __graft_entry__ import _example_batch
    import numpy as np

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6, n_pad=2048, num_scenes=2,
        channels=(16, 32), depths=(1, 1), num_heads=(2, 4),
        num_layers=2, tile=128, sampler="grid",
        band=8, sparse_cap=4, s_band=16)  # tiny caps => non-zero drops
    b = _example_batch(cfg.n_pad, cfg.num_scenes, cfg.in_channels)
    pyr = build_geometry_pyramid(b.xyz, b.offsets, cfg)
    batch = {"xyz": b.xyz, "offsets": b.offsets, "pyramid": pyr}
    want = jax.tree.map(int, audit_truncation(cfg, batch))
    got = unpack_truncation(cfg, np.asarray(audit_truncation_packed(
        cfg, batch)))
    assert got == want
    assert sum(s["band_dropped"] + s["sband_dropped"] + s["cap_dropped"]
               for s in got.values()) > 0
