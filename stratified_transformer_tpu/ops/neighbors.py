"""Neighbor search and interpolation ops (jittable, static shapes).

Covers the reference's ``pointops.knnquery``
(``lib/pointops2/src/knnquery/knnquery_cuda_kernel.cu:65-108`` — exact per-query
KNN within the query's batch segment), ``torch_points_kernels.ball_query``
(radius-limited neighbor lists for the KPConv stem, ``train.py:324-329``) and
``pointops.interpolation`` (inverse-distance 3-NN feature interpolation,
``lib/pointops2/functions/pointops.py:756-770``).

Strategy: brute-force per-scene masked distances, chunked over queries with
``lax.map`` so peak memory is ``chunk * N_ref``; distances ride the MXU as a
``(chunk,3) x (3,N)`` matmul expansion. For room-scale N (<= ~256k) this is
bandwidth-friendly and compiles to a tight loop; a Pallas/grid-pruned variant
can slot in behind the same API later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops import hashing
from stratified_transformer_tpu.ops import windows as win

BIG = float(1e10)  # python float: no backend init at import (multi-host)


def _pairwise_sqdist(q, r):
    """``[M,3] x [N,3] -> [M,N]`` squared distances via the MXU-friendly
    expansion ``|q|^2 + |r|^2 - 2 q.r``, centered at the query-chunk centroid
    to limit fp32 cancellation, with full-precision matmul."""
    q = q.astype(jnp.float32)
    r = r.astype(jnp.float32)
    center = jnp.mean(q, axis=0, keepdims=True)
    q = q - center
    r = r - center
    qq = jnp.sum(q * q, -1, keepdims=True)
    rr = jnp.sum(r * r, -1)
    cross = jnp.matmul(q, r.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq + rr[None, :] - 2.0 * cross, 0.0)


def knn(
    query_xyz,
    query_batch,
    ref_xyz,
    ref_batch,
    ref_valid,
    k,
    *,
    query_valid=None,
    chunk=512,
):
    """Exact k-nearest-neighbors within the query's scene.

    Args:
      query_xyz: ``[M, 3]``; query_batch: ``[M]`` scene ids.
      ref_xyz: ``[N, 3]``; ref_batch: ``[N]``; ref_valid: ``[N]`` bool.
      k: static neighbor count.
      query_valid: optional ``[M]`` bool.
      chunk: static query chunk size.

    Returns:
      idx ``[M, k]`` int32 into refs, nearest-first (slots without a
      same-scene valid neighbor repeat the nearest found one — the reference
      kernel leaves sentinel values there, ``knnquery_cuda_kernel.cu:70-72``);
      dist ``[M, k]`` float32 *squared* distances (the CUDA kernel's native
      quantity);
      mask ``[M, k]`` bool — True where a real neighbor exists.
    """
    m = query_xyz.shape[0]
    pad = (-m) % chunk
    qx = jnp.pad(query_xyz, ((0, pad), (0, 0)))
    qb = jnp.pad(query_batch, (0, pad), constant_values=-1)
    ref_ok = ref_valid

    def one_chunk(args):
        cx, cb = args
        d = _pairwise_sqdist(cx, ref_xyz)  # [chunk, N]
        same = cb[:, None] == ref_batch[None, :]
        d = jnp.where(same & ref_ok[None, :], d, BIG)
        neg_d, idx = jax.lax.top_k(-d, k)
        dist = -neg_d
        mask = dist < BIG
        # Fall back to the first (nearest) neighbor for empty slots so
        # downstream gathers stay in-scene.
        idx0 = idx[:, :1]
        idx = jnp.where(mask, idx, idx0)
        return idx.astype(jnp.int32), dist, mask

    nq = qx.shape[0] // chunk
    idx, dist, mask = jax.lax.map(
        one_chunk,
        (qx.reshape(nq, chunk, 3), qb.reshape(nq, chunk)),
    )
    idx = idx.reshape(-1, k)[:m]
    dist = dist.reshape(-1, k)[:m]
    mask = mask.reshape(-1, k)[:m]
    if query_valid is not None:
        mask &= query_valid[:, None]
    return idx, dist, mask


def grid_knn(
    query_xyz,
    query_batch,
    ref_xyz,
    ref_batch,
    ref_valid,
    k,
    *,
    cell,
    cap=32,
    rings=1,
    radius=None,
    query_valid=None,
    chunk=None,
    selector="exact",
    origin=None,
):
    """Cell-list k-nearest-neighbors (the TPU-native fast path).

    Replaces the brute-force O(N_q * N_ref) scan of `knn` with a spatial
    cell list: reference points are bucketed into grid cells of edge
    ``cell`` (fixed capacity ``cap`` per cell, built with one sort via
    `windows.sparse_key_table`), and each query examines only the
    ``(2*rings+1)**3`` cells around its own — O(N_q * 27 * cap) work.

    Exactness: every reference point within ``rings * cell`` of the query
    is a candidate, so results equal exact kNN whenever the true k-th
    neighbor distance is below ``rings * cell`` and no searched cell holds
    more than ``cap`` points. The reference's own kernels set the precedent
    for capacity capping (48-pt window cap ``util/voxelize.py:38-42``;
    ``n_max <= 1024`` ``functions/pointops.py:150``); ball_query likewise
    truncates arbitrarily at ``max_num_neighbors`` (``train.py:324-329``).

    Args / returns: as `knn`, plus ``radius`` (drop candidates beyond it —
    the ball-query mode) and cell-list knobs.
    """
    nq = query_xyz.shape[0]
    n_ref = ref_xyz.shape[0]
    query_ok = (jnp.ones((nq,), bool) if query_valid is None
                else jnp.asarray(query_valid))

    # Cell grid origin: explicit global anchor when given (sharded halo
    # inference — a batch-min origin would shift the tessellation per
    # block, changing which members survive the per-cell ``cap`` at dense
    # junctions), else the batch min.
    if origin is None:
        start = hashing.masked_min(ref_xyz, ref_valid)
    else:
        start = jnp.asarray(origin, jnp.float32)
    rcells = hashing.window_cells(ref_xyz, cell, start=start)
    hi = jnp.max(jnp.where(ref_valid[:, None], rcells, 0), axis=0) + 1
    rkey = hashing.window_keys(rcells, ref_batch, ref_valid, cells_hi=hi)

    # --- per-cell tables (one sort; everything else is O(N) scatters —
    # TPU gathers/scatters cost ~constant per *index*, so we keep index
    # counts minimal and row widths wide) ---
    order = jnp.argsort(jnp.where(ref_valid, rkey, hashing.INVALID_KEY),
                        stable=True).astype(jnp.int32)
    key_sorted = rkey[order]
    pos = jnp.arange(n_ref, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    row_of_pos = jnp.cumsum(head) - 1                        # cell ordinal
    seg_start = jax.lax.cummax(jnp.where(head, pos, 0))
    rank = pos - seg_start
    ok_pos = (key_sorted != hashing.INVALID_KEY) & (rank < cap)
    row_w = jnp.where(ok_pos, row_of_pos, n_ref)
    rank_w = jnp.where(ok_pos, rank, 0)

    # idx table [n_ref, cap] and packed coord table [n_ref, 3*cap]
    # (built by N-index scatters of the sorted arrays, not cap*N gathers).
    table = jnp.full((n_ref, cap), -1, jnp.int32)
    table = table.at[row_w, rank_w].set(order, mode="drop")
    xyz_sorted = ref_xyz[order].astype(jnp.float32)          # [n_ref, 3]
    ctab = jnp.full((n_ref, 3, cap), BIG, jnp.float32)
    ctab = ctab.at[row_w, :, rank_w].set(xyz_sorted, mode="drop")
    ctab = ctab.reshape(n_ref, 3 * cap)

    # dense key -> row map (replaces binary search: one gather per lookup)
    dense_size = 1 << 22
    key_of_row = jnp.where(head & ok_pos, key_sorted, dense_size)
    key_of_row = jnp.where(key_of_row < dense_size, key_of_row, dense_size)
    rowmap = jnp.full((dense_size,), -1, jnp.int32)
    rowmap = rowmap.at[key_of_row].set(row_of_pos.astype(jnp.int32),
                                       mode="drop")

    d = 2 * rings + 1
    axr = jnp.arange(-rings, rings + 1, dtype=jnp.int32)
    offs = jnp.stack(
        jnp.meshgrid(axr, axr, axr, indexing="ij"), axis=-1
    ).reshape(-1, 3)                                          # [D, 3]
    n_cells = d ** 3

    qcells_all = hashing.window_cells(query_xyz, cell, start=start)

    def one_chunk(args):
        qx, qb, qcells, qok = args
        m = qx.shape[0]
        ncells = qcells[:, None, :] + offs[None]              # [m, D, 3]
        in_range = jnp.all((ncells >= 0) & (ncells < hi), -1)  # [m, D]
        in_range &= qok[:, None]
        nkey = hashing.window_keys(
            ncells.reshape(-1, 3),
            jnp.repeat(qb, n_cells),
            in_range.reshape(-1),
            cells_hi=hi,
        )
        safe = in_range.reshape(-1) & (nkey >= 0) & (nkey < dense_size)
        row = jnp.where(
            safe, rowmap[jnp.clip(nkey, 0, dense_size - 1)], -1
        ).reshape(m, n_cells)
        rowc = jnp.clip(row, 0, n_ref - 1)
        crows = ctab[rowc]                                    # [m, D, 3*cap]
        irows = table[rowc]                                   # [m, D, cap]
        ok = (row >= 0)[..., None] & (irows >= 0)
        cand = jnp.where(ok, irows, 0).reshape(m, -1)
        ok = ok.reshape(m, -1)
        d2 = jnp.zeros((m, n_cells * cap), jnp.float32)
        for a in range(3):
            ca = crows[:, :, a * cap:(a + 1) * cap].reshape(m, -1)
            diff = jnp.where(ok, ca - qx[:, a, None].astype(jnp.float32),
                             0.0)
            d2 = d2 + diff * diff
        d2 = jnp.where(ok, d2, BIG)
        if radius is not None:
            d2 = jnp.where(d2 <= jnp.float32(radius) ** 2, d2, BIG)
        kk = min(k, d2.shape[1])
        if selector == "approx":
            # TPU-native partial-reduce top-k (lax.approx_min_k): may miss
            # a few of the true nearest when >k candidates are in range —
            # matches ball_query semantics, which return an *arbitrary*
            # <=k subset of the ball (torch_points_kernels, train.py:324).
            dist, pos = jax.lax.approx_min_k(d2, kk)
        else:
            neg_d, pos = jax.lax.top_k(-d2, kk)
            dist = -neg_d
        idx = jnp.take_along_axis(cand, pos, axis=1)
        mask = dist < BIG
        if kk < k:                                            # degenerate cap
            idx = jnp.pad(idx, ((0, 0), (0, k - kk)))
            dist = jnp.pad(dist, ((0, 0), (0, k - kk)),
                           constant_values=BIG)
            mask = jnp.pad(mask, ((0, 0), (0, k - kk)))
        idx0 = idx[:, :1]
        idx = jnp.where(mask, idx, idx0)
        return idx.astype(jnp.int32), dist, mask

    if chunk is None or chunk >= nq:
        idx, dist, mask = one_chunk(
            (query_xyz, query_batch, qcells_all, query_ok))
    else:
        pad = (-nq) % chunk
        qx = jnp.pad(query_xyz, ((0, pad), (0, 0)))
        qb = jnp.pad(query_batch, (0, pad), constant_values=-1)
        qc = jnp.pad(qcells_all, ((0, pad), (0, 0)))
        qo = jnp.pad(query_ok, (0, pad))
        ncnk = qx.shape[0] // chunk
        idx, dist, mask = jax.lax.map(
            one_chunk,
            (qx.reshape(ncnk, chunk, 3), qb.reshape(ncnk, chunk),
             qc.reshape(ncnk, chunk, 3), qo.reshape(ncnk, chunk)),
        )
        idx = idx.reshape(-1, k)[:nq]
        dist = dist.reshape(-1, k)[:nq]
        mask = mask.reshape(-1, k)[:nq]
    mask &= query_ok[:, None]
    return idx, dist, mask


def radius_neighbors(
    query_xyz,
    query_batch,
    ref_xyz,
    ref_batch,
    ref_valid,
    radius,
    k,
    *,
    query_valid=None,
    chunk=512,
    method="brute",
    cell=None,
    cap=32,
    rings=1,
    grid_chunk=None,
    selector="exact",
    origin=None,
):
    """Up-to-``k`` neighbors within ``radius`` (nearest-first).

    TPU-native replacement for ``torch_points_kernels.ball_query(
    radius, max_num_neighbors, mode="partial_dense")`` used for the KPConv
    stem (reference ``train.py:324-329``; radius = 2.5 * grid_size * sigma,
    K = 34 from ``config/s3dis/s3dis_stratified_transformer.yaml:33``).
    The reference's ball_query returns arbitrary points inside the ball;
    taking the nearest ones is a strict refinement with identical semantics
    when the ball holds <= k points.

    Returns ``idx [M, k]`` int32, ``mask [M, k]`` bool.
    """
    if method == "grid":
        idx, _, mask = grid_knn(
            query_xyz, query_batch, ref_xyz, ref_batch, ref_valid, k,
            cell=float(radius) if cell is None else cell, cap=cap,
            rings=rings, radius=radius, query_valid=query_valid,
            chunk=grid_chunk, selector=selector, origin=origin,
        )
        return idx, mask
    idx, dist, mask = knn(
        query_xyz, query_batch, ref_xyz, ref_batch, ref_valid, k,
        query_valid=query_valid, chunk=chunk,
    )
    in_ball = dist <= jnp.float32(radius) ** 2
    mask &= in_ball
    idx0 = idx[:, :1]
    idx = jnp.where(mask, idx, idx0)
    return idx, mask


def three_nn_interpolate(
    query_xyz,
    query_batch,
    support_xyz,
    support_batch,
    support_valid,
    support_feats,
    *,
    query_valid=None,
    k=3,
    chunk=512,
    method="brute",
    cell=None,
    cap=32,
    rings=1,
    grid_chunk=None,
    origin=None,
):
    """Inverse-distance weighted k-NN (k=3) feature interpolation.

    Mirrors ``pointops.interpolation``
    (``lib/pointops2/functions/pointops.py:756-770``): weights
    ``w_j = (1/(d_j+1e-8)) / sum_j 1/(d_j+1e-8)`` with *euclidean* d.

    Returns ``[M, C]`` interpolated features.
    """
    if method == "grid":
        idx, dist2, mask = grid_knn(
            query_xyz, query_batch, support_xyz, support_batch,
            support_valid, k, cell=cell, cap=cap, rings=rings,
            query_valid=query_valid, chunk=grid_chunk, origin=origin,
        )
    else:
        idx, dist2, mask = knn(
            query_xyz, query_batch, support_xyz, support_batch,
            support_valid, k, query_valid=query_valid, chunk=chunk,
        )
    d = jnp.sqrt(dist2)
    recip = jnp.where(mask, 1.0 / (d + 1e-8), 0.0)
    denom = jnp.sum(recip, -1, keepdims=True)
    w = recip / jnp.maximum(denom, 1e-12)
    gathered = support_feats[idx]  # [M, k, C]
    return jnp.sum(gathered * w[..., None].astype(support_feats.dtype), axis=1)


def interpolate_from_idx(query_xyz, support_xyz, support_feats, idx, mask):
    """Inverse-distance 3-NN interpolation from PRECOMPUTED indices.

    Same math as `three_nn_interpolate` (``pointops.interpolation``,
    ``functions/pointops.py:756-770``) with the neighbor search done
    elsewhere (e.g. on the host, `data.pyramid`): distances are recomputed
    on device from the gathered coordinates ([M, k] row gathers — cheap).
    """
    qx = jnp.asarray(query_xyz, jnp.float32)
    sx = jnp.asarray(support_xyz, jnp.float32)
    d = jnp.sqrt(jnp.sum((qx[:, None, :] - sx[idx]) ** 2, -1))
    recip = jnp.where(mask, 1.0 / (d + 1e-8), 0.0)
    denom = jnp.sum(recip, -1, keepdims=True)
    w = recip / jnp.maximum(denom, 1e-12)
    gathered = support_feats[idx]
    return jnp.sum(gathered * w[..., None].astype(support_feats.dtype),
                   axis=1)


def subtraction(input1, input2, idx, mask=None):
    """Pairwise difference ``out[i, j] = input1[i] - input2[idx[i, j]]``.

    Mirrors ``pointops.subtraction`` (``functions/pointops.py:695-722``;
    CUDA ``subtraction_cuda_kernel.cu:5-32``) — the point-transformer
    positional-difference op. Unused by the stratified models but part of
    the pointops2 public API. Differentiable via jnp (the CUDA backward's
    atomicAdd scatter becomes a segment-sum in the VJP).

    Args:
      input1/input2: ``[N, C]``; idx: ``[N, k]`` int32; mask: optional
        ``[N, k]`` bool (invalid slots produce zeros).
    Returns: ``[N, k, C]``.
    """
    out = input1[:, None, :] - input2[idx]
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    return out


def aggregation(feats, position, weight, idx, mask=None):
    """Point-transformer vector aggregation.

    ``out[n] = sum_j (feats[idx[n, j]] + position[n, j]) * weight[n, j]``
    where ``weight`` has ``w_c`` channels shared over groups of
    ``C / w_c`` feature channels (weight channel ``c % w_c`` scales feature
    channel ``c`` — ``aggregation_cuda_kernel.cu:5-20``). Mirrors
    ``pointops.aggregation`` (``functions/pointops.py:725-753``).

    Args:
      feats: ``[N, C]``; position: ``[N, k, C]``; weight: ``[N, k, w_c]``
      with ``C % w_c == 0``; idx: ``[N, k]``; mask: optional ``[N, k]``.
    Returns: ``[N, C]``.
    """
    n, k = idx.shape
    c = feats.shape[-1]
    w_c = weight.shape[-1]
    assert c % w_c == 0, (c, w_c)
    vals = feats[idx] + position                       # [N, k, C]
    w = jnp.tile(weight, (1, 1, c // w_c))             # channel groups
    if mask is not None:
        w = jnp.where(mask[..., None], w, 0.0)
    return jnp.sum(vals * w, axis=1)


def gather_group(feats, idx, mask, fill=0.0):
    """``grouping``: gather ``feats[idx] -> [M, k, C]`` with masked fill.

    Mirrors ``pointops.grouping`` / ``queryandgroup(use_xyz=False)``
    (``functions/pointops.py:52-80,648-675``).
    """
    g = feats[idx]
    return jnp.where(mask[..., None], g, jnp.asarray(fill, g.dtype))
