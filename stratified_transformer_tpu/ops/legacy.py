"""Dense-batch compatibility ops (reference ``lib/pointops`` v1 API).

The reference ships a legacy CUDA extension (``lib/pointops/src``) with a
dense ``[b, n, ...]`` batch layout that the live models never import (only
``lib/pointops2`` is — reference ``model/stratified_transformer.py:8``), but
whose API is part of the framework surface a reference user may rely on:
ball query, class-histogram label statistics, nearest-anchor feature
distribution, and dense gather/group. These are compatibility re-derivations
in pure jnp — static shapes, mask semantics matching the CUDA scan order —
not hot-path kernels (the production model path uses ``ops.neighbors`` /
``ops.plan``).

Semantics mirrored from:
  - ballquery: ``lib/pointops/src/ballquery/ballquery_cuda_kernel.cu:6-39``
    (first ``nsample`` in-radius refs in index order; all slots pre-filled
    with the first hit; no hit => 0).
  - labelstat: ``lib/pointops/src/labelstat/labelstat_cuda_kernel.cu:6-50``
    (``_and_ballquery``), ``:100-151`` (``_ballrange``, ``_idx``).
  - featuredistribute / featuregather:
    ``lib/pointops/src/featuredistribute/featuredistribute_cuda_kernel.cu:4-30``.
  - gathering / grouping:
    ``lib/pointops/src/gathering``, ``src/grouping`` (v1 dense layout).
  - knnquery_heap: ``lib/pointops/src/knnquery_heap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ball_query_dense(new_xyz, xyz, radius, nsample):
    """First-``nsample`` in-radius neighbors per query, CUDA scan order.

    Args:
      new_xyz: ``[b, m, 3]`` query points.
      xyz: ``[b, n, 3]`` reference points.
      radius: search radius (strict ``d2 < radius**2`` as in the kernel).
      nsample: static neighbor capacity.

    Returns:
      idx ``[b, m, nsample]`` int32; cnt ``[b, m]`` int32 actual hit count
      (min(hits, nsample)). Slots beyond ``cnt`` repeat the first hit;
      queries with no hit are all-zero (the CUDA output buffer is
      zero-initialised, ``functions/pointops.py`` v1 wrapper).
    """
    n = xyz.shape[1]
    d2 = jnp.sum(
        (new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    mask = d2 < radius * radius                       # [b,m,n]
    # scan-order selection: sort refs by (miss, index)
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32),
                    jnp.int32(n) + jnp.arange(n, dtype=jnp.int32))
    sel = jnp.sort(key, axis=-1)[:, :, :nsample]      # [b,m,nsample]
    hit = sel < n
    first = sel[:, :, :1]
    fill = jnp.where(first < n, first, 0)
    cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(jnp.int32)
    return jnp.where(hit, sel, fill), cnt


def labelstat_idx(label_stat, idx):
    """Sum class histograms over given neighbor indices.

    Args:
      label_stat: ``[b, n, nclass]`` int per-point class histograms.
      idx: ``[b, m, nsample]`` int32 neighbor indices.

    Returns:
      ``[b, m, nclass]`` summed histograms (duplicate indices counted
      multiply, as the CUDA loop does —
      ``labelstat_cuda_kernel.cu:140-150``).
    """
    return jnp.take_along_axis(
        label_stat[:, None], idx[..., None], axis=2).sum(axis=2)


def labelstat_ballrange(new_xyz, xyz, label_stat, radius):
    """Sum class histograms over ALL in-radius reference points."""
    d2 = jnp.sum(
        (new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    mask = (d2 < radius * radius).astype(label_stat.dtype)
    return jnp.einsum("bmn,bnc->bmc", mask, label_stat)


def labelstat_and_ballquery(new_xyz, xyz, label_stat, radius, nsample):
    """Ball query + histogram over the (distinct) hits, capped at nsample.

    Returns ``(idx [b,m,nsample], new_label_stat [b,m,nclass])``. The CUDA
    kernel accumulates each in-radius point once until ``nsample`` hits
    (``labelstat_cuda_kernel.cu:28-47``), so the histogram counts distinct
    hits only — unlike `labelstat_idx` over the padded index list.
    """
    idx, cnt = ball_query_dense(new_xyz, xyz, radius, nsample)
    gathered = jnp.take_along_axis(
        label_stat[:, None], idx[..., None], axis=2)  # [b,m,ns,nclass]
    slot_ok = (jnp.arange(idx.shape[-1], dtype=jnp.int32)[None, None]
               < cnt[..., None])
    stat = jnp.sum(
        jnp.where(slot_ok[..., None], gathered, 0), axis=2)
    return idx, stat


def feature_distribute(max_xyz, xyz):
    """Nearest-anchor assignment: argmin_k ||xyz - max_xyz[k]||.

    Args:
      max_xyz: ``[b, n, 3]`` anchor points.
      xyz: ``[b, m, 3]`` points to assign.

    Returns:
      ``[b, m]`` int32 anchor index per point.
    """
    d2 = jnp.sum(
        (xyz[:, :, None, :] - max_xyz[:, None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def feature_gather(max_feature, distribute_idx):
    """Gather anchor features per point: ``[b, c, n], [b, m] -> [b, c, m]``.

    Differentiable (the CUDA bwd is an atomicAdd scatter,
    ``featuredistribute_cuda_kernel.cu:60+``; jnp gather VJP is the same
    segment-sum).
    """
    return jnp.take_along_axis(
        max_feature, distribute_idx[:, None, :], axis=2)


def gathering(feats, idx):
    """v1 ``gathering``: ``[b, c, n], [b, m] -> [b, c, m]``."""
    return jnp.take_along_axis(feats, idx[:, None, :], axis=2)


def grouping_dense(feats, idx):
    """v1 ``grouping``: ``[b, c, n], [b, m, nsample] -> [b, c, m, nsample]``.

    Works for float or integer features (the reference's ``grouping_int``
    is the same kernel over int64).
    """
    b, c, _ = feats.shape
    m, ns = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(
        feats, jnp.broadcast_to(idx.reshape(b, 1, m * ns), (b, c, m * ns)),
        axis=2)
    return flat.reshape(b, c, m, ns)


def knn_dense(new_xyz, xyz, k):
    """Dense-batch exact kNN (v1 ``knnquery_heap`` semantics).

    Args:
      new_xyz: ``[b, m, 3]``; xyz: ``[b, n, 3]``; k: static.

    Returns:
      (idx ``[b, m, k]`` int32 nearest-first, dist2 ``[b, m, k]`` float32
      squared distances — the kernel's native quantity).
    """
    d2 = jnp.sum(
        (new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def divide2patch(nsample, xyz, offsets, n_pad, *, anchor_scale=None,
                 return_offset=False):
    """FPS-anchored kNN patches (``functions/pointops.py:678-693``).

    Picks ``count/downsample_scale`` FPS anchors per scene and returns each
    anchor's ``nsample`` nearest points: ``p_idx [m_pad, nsample]``. The
    flat-offset convention matches the reference; ``m_pad`` is the static
    anchor capacity.
    """
    from stratified_transformer_tpu.ops import neighbors, sampling

    xyz = jnp.asarray(xyz)
    offsets = jnp.asarray(offsets)
    n = xyz.shape[0]
    scale = anchor_scale or nsample
    counts = offsets - jnp.concatenate(
        [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
    new_counts = counts // scale
    new_offsets = sampling.counts_to_offsets(new_counts)
    anchor_idx, anchor_valid = sampling.farthest_point_sampling(
        xyz, offsets, new_offsets, n_pad)
    valid = sampling.offsets_to_valid(offsets, n)
    batch = sampling.offsets_to_batch(offsets, n)
    a_batch = sampling.offsets_to_batch(new_offsets, n_pad)
    p_idx, _, p_mask = neighbors.knn(
        xyz[anchor_idx], a_batch, xyz, batch, valid, nsample,
        query_valid=anchor_valid)
    if return_offset:
        return p_idx, p_mask, new_offsets
    return p_idx, p_mask
