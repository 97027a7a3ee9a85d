"""Sharded whole-scene inference: spatial block partition + halo points.

The reference evaluates large scenes with a *serial* chunk loop
(``test_backup.py:238-285``). Here a scene is partitioned into ``D`` spatial
slabs along its longest horizontal axis — one per device — and every slab is
padded with a halo of neighbor points wide enough to cover the model's
receptive field, so each device's forward pass is exact for its core points:

  halo >= top-stage large window (2 * window * 2^(L-1)) + kNN pooling /
  interpolation reach. Default = 2.5x the top-stage window size.

Two data paths share the partition/receptive-field math:

* `sharded_scene_probs` — host-side halo REPLICATION: every block ships
  core + halo points from the host (one upload per block).
* `sharded_scene_probs_collective` — ON-DEVICE halo EXCHANGE: each device
  holds only its core slab; boundary points move between neighbouring
  devices over ``jax.lax.ppermute`` (ICI) inside a ``shard_map`` before
  the forward (`make_collective_predict`). This is the BASELINE.json
  north star ("spatial block partitioning with halo point exchange over
  collectives") replacing the reference's serial chunk loop
  (``test_backup.py:238-285``); host->device traffic drops from
  core+halo to core-only and the exchange rides the interconnect.
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


def slab_edges(coord, n_blocks):
    """Slab axis + equal-point-count quantile edges for a scene.

    ONE definition shared by the partitioner and the collective-exchange
    wrapper so halo bands are always selected against the same
    boundaries the blocks were assigned with.
    """
    coord = np.asarray(coord)
    extent = coord.max(0) - coord.min(0)
    axis = int(np.argmax(extent[:2])) if coord.shape[1] >= 2 else 0
    qs = np.quantile(coord[:, axis], np.linspace(0, 1, n_blocks + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    return axis, qs


def partition_scene(coord, n_blocks, halo, min_points_per_block=1):
    """Split a scene into slabs of equal point count along the longest
    horizontal axis, each with halo replication.

    Returns a list of dicts: {idx: global indices of block points (core +
    halo), core: bool mask over idx}.
    """
    coord = np.asarray(coord)
    axis, qs = slab_edges(coord, n_blocks)
    x = coord[:, axis]
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


def make_collective_predict(apply_probs, mesh, core_pad, halo_cap):
    """Build the jitted sharded predictor with ON-DEVICE halo exchange.

    Args:
      apply_probs: per-device model closure ``(feats [B, C], xyz [B, 3],
        offsets [1] int32) -> probs [B, num_classes]`` where
        ``B = core_pad + 2 * halo_cap`` (call the model with
        ``anchor=zeros(3)``; coordinates arrive global-min-subtracted).
      mesh: 1-D device mesh; slab ``b`` lives on mesh position ``b``.
      core_pad: static per-device core capacity.
      halo_cap: static per-side halo buffer capacity.

    Returns ``predict(feats [D, core_pad, C], xyz [D, core_pad, 3],
    n_core [D, 1], bounds [D, 2], hw [D, 1], ax [D, 3]) ->
    (probs [D, B, num_classes], sent_drop [D, 2])`` where ``sent_drop``
    counts edge points that exceeded ``halo_cap`` per side (non-zero =
    halo coverage lost; surface it, never silently cap).

    Exchange topologies (the returned ``predict`` takes ``mode=``):

    * ``"ppermute"`` — halos come from the two ADJACENT devices (valid
      when the halo width fits within each interior slab). Each device
      compacts its own boundary bands (closest-to-boundary first) into
      fixed ``[halo_cap]`` buffers and ``ppermute``s them one step
      left/right; a validity column rides along (boundary devices
      receive zeros => all-invalid).
    * ``"allgather"`` — the general case (production receptive halos
      usually SPAN several slabs of a single room): every device
      ``all_gather``s the core slabs over ICI and selects its own halo
      points locally (closest-to-slab first, capacity ``2 * halo_cap``,
      overflow counted). More ICI traffic, no topology restriction.

    Received/selected halo rows are scattered after the core prefix so
    the combined block keeps the flat ``[N, C] + offsets`` contract.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_name = mesh.axis_names[0]
    nd = int(mesh.devices.size)
    b_pad = core_pad + 2 * halo_cap

    def shard_fn(feats, xyz, gidx, n_core, bounds, hw, ax):
        feats = feats[0]
        xyz = xyz[0]
        gidx = gidx[0]
        nc = n_core[0, 0]
        lo, hi = bounds[0, 0], bounds[0, 1]
        hwv = hw[0, 0]
        x = jnp.sum(xyz * ax[0][None, :], axis=1)
        valid = jnp.arange(core_pad, dtype=jnp.int32) < nc

        def edge(score):
            s = jnp.where(valid, score, jnp.inf)
            in_band = jnp.isfinite(s)
            order = jnp.argsort(s)[:halo_cap]
            ok = jnp.take(s, order) < jnp.inf
            dropped = jnp.maximum(
                jnp.sum(in_band.astype(jnp.int32)) - halo_cap, 0)
            return xyz[order], feats[order], gidx[order], ok, dropped

        # my LEFT boundary band (goes to device d-1 as its right halo)
        sxl, sfl, sgl, okl, dl = edge(
            jnp.where(x < lo + hwv, x - lo, jnp.inf))
        # my RIGHT boundary band (goes to device d+1 as its left halo)
        sxr, sfr, sgr, okr, dr = edge(
            jnp.where(x > hi - hwv, hi - x, jnp.inf))

        perm_dn = [(i, i - 1) for i in range(1, nd)]
        perm_up = [(i, i + 1) for i in range(nd - 1)]
        pp = jax.lax.ppermute
        rx_r, rf_r, rg_r, rok_r = (pp(t, axis_name, perm_dn)
                                   for t in (sxl, sfl, sgl, okl))
        rx_l, rf_l, rg_l, rok_l = (pp(t, axis_name, perm_up)
                                   for t in (sxr, sfr, sgr, okr))

        # ok flags are a PREFIX (senders sort invalid scores to the end),
        # so ranks are positional; received-from-nowhere rows are zeros
        # (ppermute semantics) => ok False.
        n_l = jnp.sum(rok_l.astype(jnp.int32))
        n_r = jnp.sum(rok_r.astype(jnp.int32))
        ar = jnp.arange(halo_cap, dtype=jnp.int32)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        xyz_b = jnp.zeros((b_pad, 3), xyz.dtype).at[:core_pad].set(xyz)
        feats_b = jnp.zeros((b_pad, feats.shape[1]),
                            feats.dtype).at[:core_pad].set(feats)
        gidx_b = jnp.full((b_pad,), big, jnp.int32).at[:core_pad].set(
            jnp.where(valid, gidx, big))
        pos_l = jnp.where(rok_l, nc + ar, b_pad)
        xyz_b = xyz_b.at[pos_l].set(rx_l, mode="drop")
        feats_b = feats_b.at[pos_l].set(rf_l, mode="drop")
        gidx_b = gidx_b.at[pos_l].set(rg_l, mode="drop")
        pos_r = jnp.where(rok_r, nc + n_l + ar, b_pad)
        xyz_b = xyz_b.at[pos_r].set(rx_r, mode="drop")
        feats_b = feats_b.at[pos_r].set(rf_r, mode="drop")
        gidx_b = gidx_b.at[pos_r].set(rg_r, mode="drop")
        offsets = (nc + n_l + n_r)[None].astype(jnp.int32)

        # Present points in GLOBAL index order: downstream tie-breaks
        # (grid-pool representative selection) depend on point order, and
        # block-vs-whole-scene exactness requires the block to see its
        # points in the same relative order as the full forward (the host
        # path keeps this by construction).
        order = jnp.argsort(gidx_b, stable=True).astype(jnp.int32)
        probs_sorted = apply_probs(
            feats_b[order], xyz_b[order], offsets)
        # back to assembly order: row [0, nc) = this device's core slots
        probs = jnp.zeros_like(probs_sorted).at[order].set(probs_sorted)
        return probs[None], jnp.stack([dl, dr])[None]

    def shard_fn_ag(feats, xyz, gidx, n_core, bounds, hw, ax):
        feats = feats[0]
        xyz = xyz[0]
        gidx = gidx[0]
        nc = n_core[0, 0]
        lo, hi = bounds[0, 0], bounds[0, 1]
        hwv = hw[0, 0]
        valid = jnp.arange(core_pad, dtype=jnp.int32) < nc

        gx = jax.lax.all_gather(xyz, axis_name)        # [D, core_pad, 3]
        gf = jax.lax.all_gather(feats, axis_name)
        gg = jax.lax.all_gather(gidx, axis_name)
        gv = jax.lax.all_gather(valid, axis_name)
        me = jax.lax.axis_index(axis_name)
        dev_row = jax.lax.broadcasted_iota(jnp.int32, (nd, core_pad), 0)
        xval = jnp.sum(gx * ax[0][None, None, :], axis=-1)
        depth = jnp.maximum(jnp.maximum(lo - xval, xval - hi), 0.0)
        # other devices' points within the halo band of MY slab (depth 0
        # = exactly on my boundary, still halo — exclude by device id,
        # not by depth, so boundary points survive)
        cand = gv & (dev_row != me) & (depth <= hwv)
        k2 = 2 * halo_cap
        score = jnp.where(cand, depth, jnp.inf).reshape(-1)
        order = jnp.argsort(score)[:k2]
        ok = jnp.take(score, order) < jnp.inf
        dropped = jnp.maximum(
            jnp.sum(cand.astype(jnp.int32)) - k2, 0)
        hx = gx.reshape(-1, 3)[order]
        hf = gf.reshape(-1, feats.shape[1])[order]
        hg = gg.reshape(-1)[order]

        n_h = jnp.sum(ok.astype(jnp.int32))
        ar = jnp.arange(k2, dtype=jnp.int32)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        xyz_b = jnp.zeros((b_pad, 3), xyz.dtype).at[:core_pad].set(xyz)
        feats_b = jnp.zeros((b_pad, feats.shape[1]),
                            feats.dtype).at[:core_pad].set(feats)
        gidx_b = jnp.full((b_pad,), big, jnp.int32).at[:core_pad].set(
            jnp.where(valid, gidx, big))
        pos = jnp.where(ok, nc + ar, b_pad)
        xyz_b = xyz_b.at[pos].set(hx, mode="drop")
        feats_b = feats_b.at[pos].set(hf, mode="drop")
        gidx_b = gidx_b.at[pos].set(hg, mode="drop")
        offsets = (nc + n_h)[None].astype(jnp.int32)

        order_g = jnp.argsort(gidx_b, stable=True).astype(jnp.int32)
        probs_sorted = apply_probs(
            feats_b[order_g], xyz_b[order_g], offsets)
        probs = jnp.zeros_like(probs_sorted).at[order_g].set(probs_sorted)
        return probs[None], jnp.stack(
            [dropped, jnp.zeros((), jnp.int32)])[None]

    shardy = P(axis_name)
    sharding = NamedSharding(mesh, shardy)
    jitted = {}
    for mode, fn in (("ppermute", shard_fn), ("allgather", shard_fn_ag)):
        jitted[mode] = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(shardy,) * 7,
            out_specs=(shardy, shardy)))

    def predict(feats, xyz, gidx, n_core, bounds, hw, ax,
                mode="ppermute"):
        put = lambda a: jax.device_put(a, sharding)  # noqa: E731
        return jitted[mode](put(feats), put(xyz), put(gidx), put(n_core),
                            put(bounds), put(hw), put(ax))

    return predict


def sharded_scene_probs_collective(
    apply_probs,
    coord,
    feat,
    num_classes,
    *,
    mesh,
    core_pad,
    halo_cap,
    concat_xyz=True,
    halo=0.5,
    stats=None,
    predict=None,
):
    """`sharded_scene_probs` with the halo moved over device collectives.

    The host ships each device ONLY its core slab; boundary points travel
    over ICI — ``ppermute`` to the adjacent devices when the halo fits
    within each interior slab, the general ``all_gather`` exchange
    otherwise (production receptive halos usually span several slabs of
    one room; see `make_collective_predict`).

    ``predict``: optional pre-built `make_collective_predict` result (the
    jit is shape-keyed; reuse it across scenes of one eval run).

    Raises ``ValueError`` when a core slab exceeds ``core_pad`` (callers
    fall back to the host-replication path, which truncates gracefully).
    """
    coord = np.asarray(coord, np.float32)
    origin = coord.min(0)
    coord0 = coord - origin
    d = int(mesh.devices.size)
    blocks = partition_scene(coord0, d, halo=0.0)
    axis, qs = slab_edges(coord0, d)

    # exchange topology: one-hop ppermute only when the halo band cannot
    # span past the adjacent slab; otherwise the general all_gather path
    widths = np.diff(qs)[1:-1]
    mode = ("ppermute" if not len(widths) or halo <= widths.min()
            else "allgather")

    c_in = feat.shape[1] + (3 if concat_xyz else 0)
    feats_d = np.zeros((d, core_pad, c_in), np.float32)
    xyz_d = np.zeros((d, core_pad, 3), np.float32)
    gidx_d = np.zeros((d, core_pad), np.int32)
    n_core = np.zeros((d, 1), np.int32)
    bounds = np.zeros((d, 2), np.float32)
    kept = []
    for b, blk in enumerate(blocks):
        idx = blk["idx"]
        if len(idx) > core_pad:
            raise ValueError(
                f"core slab {b} ({len(idx)} pts) exceeds core_pad "
                f"{core_pad} - raise sharded_core_points or fall back "
                "to host replication")
        c = coord0[idx]
        f = np.asarray(feat[idx], np.float32)
        fcat = np.concatenate([f, c], 1) if concat_xyz else f
        xyz_d[b, :len(idx)] = c
        feats_d[b, :len(idx)] = fcat
        gidx_d[b, :len(idx)] = idx
        n_core[b, 0] = len(idx)
        lo = qs[b] if np.isfinite(qs[b]) else -1e30
        hi = qs[b + 1] if np.isfinite(qs[b + 1]) else 1e30
        bounds[b] = (lo, hi)
        kept.append(idx)

    hw = np.full((d, 1), halo, np.float32)
    ax = np.zeros((d, 3), np.float32)
    ax[:, axis] = 1.0

    if predict is None:
        predict = make_collective_predict(
            apply_probs, mesh, core_pad, halo_cap)
    probs_d, sent_drop = predict(
        feats_d, xyz_d, gidx_d, n_core, bounds, hw, ax, mode=mode)
    probs_d = np.asarray(probs_d)
    sent_drop = np.asarray(sent_drop)
    if stats is not None:
        stats["halo_cap_dropped"] = int(sent_drop.sum())
        stats["block_points"] = [int(n) for n in n_core[:, 0]]
        stats[f"collective_{mode}_scenes"] = (
            stats.get(f"collective_{mode}_scenes", 0) + 1)

    out = np.zeros((len(coord), num_classes), np.float64)
    for b, idx in enumerate(kept):
        out[idx] = probs_d[b, :len(idx)]
    return out


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
