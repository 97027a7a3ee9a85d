"""Numpy oracles mirroring the reference CUDA/torch semantics.

These play the role the reference's own parity scripts play for its CUDA v2
kernels (``lib/pointops2/functions/test_*.py``): a slow, obviously-correct
implementation of each op, written directly from the reference semantics:

  * pair construction  — ``model/stratified_transformer.py:10-65`` (grid_sample
    + get_indice_pairs);
  * attention chain    — ``model/stratified_transformer.py:164-217`` and the
    v1 CUDA kernels (``lib/pointops2/src/attention/attention_cuda_kernel.cu``,
    ``src/rpe/relative_pos_encoding_cuda_kernel.cu``);
  * knn / fps / interpolation — ``src/knnquery``, ``src/sampling``,
    ``src/interpolation`` kernels.

All of it is an independent re-derivation in numpy (no reference code reused).
"""

from __future__ import annotations

import numpy as np


def np_window_cells(xyz, window_size, shift=0.0, start=None):
    xyz = np.asarray(xyz, np.float32)
    if start is None:
        start = xyz.min(0)
    return np.floor((xyz + shift - start) / np.float32(window_size)).astype(
        np.int64
    )


def np_get_pairs(xyz, batch, window_size, shifted, down_mask=None):
    """All (query, key) pairs per the reference's stratified construction.

    Returns (pairs_i, pairs_j) int64 arrays: dense same-small-window pairs
    plus (if down_mask given) sparse pairs (query=any point, key=downsampled
    point sharing the query's large 2x window but not its small window).
    """
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    start = xyz.min(0)
    s_shift = 0.5 * window_size if shifted else 0.0
    cs = np_window_cells(xyz, window_size, s_shift, start)
    keys_s = [tuple([int(batch[i])] + list(cs[i])) for i in range(n)]

    pi, pj = [], []
    for i in range(n):
        for j in range(n):
            if keys_s[i] == keys_s[j]:
                pi.append(i)
                pj.append(j)

    if down_mask is not None:
        l_shift = window_size if shifted else 0.0
        cl = np_window_cells(xyz, 2 * window_size, l_shift, start)
        keys_l = [tuple([int(batch[i])] + list(cl[i])) for i in range(n)]
        for i in range(n):
            for j in range(n):
                if not down_mask[j]:
                    continue
                if keys_l[i] != keys_l[j]:
                    continue
                if keys_s[i] == keys_s[j]:
                    continue
                pi.append(i)
                pj.append(j)
    return np.asarray(pi, np.int64), np.asarray(pj, np.int64)


def np_rel_index(rel, window_size, quant_size):
    rel = np.round(rel.astype(np.float64) * 1e5) / 1e5
    return np.floor(
        (rel + 2 * window_size - 1e-4) / quant_size
    ).astype(np.int64)


def np_pair_attention(
    q, k, v, xyz, pi, pj, window_size, quant_size, scale,
    table_q=None, table_k=None, table_v=None,
):
    """Reference attention math over explicit pairs (v1-kernel semantics)."""
    n, h, d = q.shape
    q = q.astype(np.float64) * scale
    k = k.astype(np.float64)
    v = v.astype(np.float64)
    m = len(pi)
    logits = np.einsum("mhd,mhd->mh", q[pi], k[pj])
    if table_q is not None or table_k is not None or table_v is not None:
        rel = xyz[pi].astype(np.float64) - xyz[pj].astype(np.float64)
        ridx = np_rel_index(rel, window_size, quant_size)
    if table_q is not None:
        tq = table_q.astype(np.float64)
        for a in range(3):
            logits += np.einsum("mhd,mhd->mh", q[pi], tq[ridx[:, a], :, :, a])
    if table_k is not None:
        tk = table_k.astype(np.float64)
        for a in range(3):
            logits += np.einsum("mhd,mhd->mh", k[pj], tk[ridx[:, a], :, :, a])

    out = np.zeros((n, h, d), np.float64)
    for i in range(n):
        sel = np.where(pi == i)[0]
        if len(sel) == 0:
            continue
        lg = logits[sel]  # [s, h]
        p = np.exp(lg - lg.max(0, keepdims=True))
        p /= p.sum(0, keepdims=True)
        vals = v[pj[sel]]  # [s, h, d]
        if table_v is not None:
            tv = table_v.astype(np.float64)
            for a in range(3):
                vals = vals + tv[ridx[sel, a], :, :, a]
        out[i] = np.einsum("sh,shd->hd", p, vals)
    return out


def np_knn(qxyz, qbatch, rxyz, rbatch, k):
    m = len(qxyz)
    idx = np.zeros((m, k), np.int64)
    d2 = np.zeros((m, k), np.float64)
    for i in range(m):
        mask = rbatch == qbatch[i]
        cand = np.where(mask)[0]
        dd = ((rxyz[cand] - qxyz[i]) ** 2).sum(-1)
        o = np.argsort(dd, kind="stable")[:k]
        take = cand[o]
        nn = len(take)
        idx[i, :nn] = take
        d2[i, :nn] = dd[o]
        if nn < k:
            idx[i, nn:] = take[0]
            d2[i, nn:] = np.inf
    return idx, d2


def np_fps(xyz, offsets, new_offsets):
    """Exact FPS per the reference CUDA kernel (first point seeds)."""
    xyz = np.asarray(xyz, np.float64)
    out = []
    prev = 0
    nprev = 0
    for b in range(len(offsets)):
        lo, hi = prev, offsets[b]
        m = new_offsets[b] - nprev
        pts = xyz[lo:hi]
        nloc = hi - lo
        sel = [0]
        mind = np.full(nloc, 1e10)
        for _ in range(1, m):
            mind = np.minimum(mind, ((pts - pts[sel[-1]]) ** 2).sum(-1))
            sel.append(int(np.argmax(mind)))
        out.extend([lo + s for s in sel[:m]])
        prev, nprev = offsets[b], new_offsets[b]
    return np.asarray(out, np.int64)


def np_interpolation(qxyz, qbatch, sxyz, sbatch, sfeat):
    idx, d2 = np_knn(qxyz, qbatch, sxyz, sbatch, 3)
    d = np.sqrt(d2)
    recip = 1.0 / (d + 1e-8)
    recip[~np.isfinite(recip)] = 0.0
    w = recip / recip.sum(-1, keepdims=True)
    return np.einsum("mk,mkc->mc", w, sfeat[idx])
