"""Fused attention front-end: Pallas band kernel + XLA sparse half.

``stratified_attention_fused`` is a drop-in replacement for
``ops.attention.stratified_attention``: the dense (band) half runs as the
Pallas kernel (`ops.pallas.fused_attention.band_attention`), the sparse
(far-key) half as a small gathered XLA computation, and the two are merged
by online-softmax composition. The backward pass is delegated (via
``jax.custom_vjp``) to the VJP of the jnp reference implementation — exact
gradients, kernel-accelerated forward; a Pallas backward is the next
optimisation stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops import attention as jnp_attn
from stratified_transformer_tpu.ops.pallas.fused_attention import (
    band_attention,
)

NEG_INF = jnp.float32(-1e30)


def _sparse_half(q, k, v, xyz, valid, sparse_idx, sparse_mask,
                 table_q, table_k, table_v, *, window_size, quant_size,
                 scale, chunk=1024):
    """Unnormalised (acc, m, denom) for the sparse keys (XLA).

    Chunked over query rows so the one-hot cRPE intermediates stay small
    (unchunked they materialise O(N*S*L) floats in HBM).
    """
    n, h, d = q.shape
    qf = jnp.asarray(q, jnp.float32) * scale
    kf = jnp.asarray(k, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)
    xf = jnp.asarray(xyz, jnp.float32)
    tqf = None if table_q is None else table_q.astype(jnp.float32)
    tkf = None if table_k is None else table_k.astype(jnp.float32)
    tvf = None if table_v is None else table_v.astype(jnp.float32)
    nbins = tqf.shape[0] if tqf is not None else 0

    assert n % chunk == 0 or chunk > n, (n, chunk)
    chunk = min(chunk, n)

    @jax.checkpoint
    def row_chunk(c0):
        qc = jax.lax.dynamic_slice_in_dim(qf, c0, chunk)
        xc = jax.lax.dynamic_slice_in_dim(xf, c0, chunk)
        vc = jax.lax.dynamic_slice_in_dim(valid, c0, chunk)
        si = jax.lax.dynamic_slice_in_dim(sparse_idx, c0, chunk)
        sm = jax.lax.dynamic_slice_in_dim(sparse_mask, c0, chunk)
        sg = jnp.clip(si, 0, n - 1)
        ok = sm & (si >= 0) & vc[:, None]
        k_s = kf[sg]                                   # [C,S,h,d]
        v_s = vf[sg]
        logits = jnp.einsum(
            "nhd,nshd->nhs", qc, k_s,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        oh = None
        if tqf is not None:
            rel = xc[:, None, :] - xf[sg]
            ridx = jnp_attn.relative_position_index(
                rel, window_size, quant_size, nbins)    # [C,S,3]
            bins = jnp.arange(nbins, dtype=jnp.int32)
            oh = [(ridx[:, :, a, None] == bins).astype(jnp.float32)
                  for a in range(3)]                    # [C,S,L] x3
            for a in range(3):
                qproj_a = jnp.einsum(
                    "nhd,lhd->nhl", qc, tqf[:, :, :, a],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                logits += jnp.einsum(
                    "nhl,nsl->nhs", qproj_a, oh[a],
                    precision=jax.lax.Precision.HIGHEST)
                if tkf is not None:
                    kp = jnp.einsum(
                        "nshd,lhd->nshl", k_s, tkf[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    logits += jnp.einsum(
                        "nshl,nsl->nsh", kp, oh[a],
                        precision=jax.lax.Precision.HIGHEST
                    ).transpose(0, 2, 1)

        logits = jnp.where(ok[:, None, :], logits, NEG_INF)
        m = jnp.max(logits, axis=-1)
        p = jnp.where(ok[:, None, :], jnp.exp(logits - m[:, :, None]), 0.0)
        den = jnp.sum(p, axis=-1)
        acc = jnp.einsum(
            "nhs,nshd->nhd", p, v_s,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        if tvf is not None:
            for a in range(3):
                mass = jnp.einsum(
                    "nhs,nsl->nhl", p, oh[a],
                    precision=jax.lax.Precision.HIGHEST)
                acc += jnp.einsum(
                    "nhl,lhd->nhd", mass, tvf[:, :, :, a],
                    precision=jax.lax.Precision.HIGHEST)
        return acc, m, den

    if chunk == n:
        return row_chunk(jnp.int32(0))
    starts = jnp.arange(0, n, chunk, dtype=jnp.int32)
    acc, m, den = jax.lax.map(row_chunk, starts)
    return (acc.reshape(n, h, d), m.reshape(n, h), den.reshape(n, h))


def _sparse_half_banded(
    q, k, v, xyz, valid, plan, table_q, table_k, table_v, *,
    window_size, quant_size, scale, subtile=32, row_cap=8, map_batch=8,
):
    """Table-banded sparse half: O(row_cap*S) contiguous table rows per
    query subtile instead of per-query gathered key lists.

    Exploits that every query of one large window shares the same sparse
    key set (one table row), and that sorting queries by large-window key
    makes row ids non-decreasing — so a subtile of queries touches a short
    contiguous range of table rows (``dynamic_slice``, not gather).

    Inputs are in small-sorted order; the result is mapped back to
    small-sorted order. Returns (acc, m, den).
    """
    n, h, d = q.shape
    s_cap = plan.table_sorted.shape[1]
    assert n % subtile == 0
    nst = n // subtile

    qf = jnp.asarray(q, jnp.float32) * scale
    kf = jnp.asarray(k, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)
    xf = jnp.asarray(xyz, jnp.float32)
    cells = plan.cells_sorted

    # large-window ordering
    q_lw = qf[plan.lw_map]
    x_lw = xf[plan.lw_map]
    c_lw = cells[plan.lw_map]
    val_lw = valid[plan.lw_map]
    rows = plan.lw_row                                   # [N]

    tqf = None if table_q is None else table_q.astype(jnp.float32)
    tkf = None if table_k is None else table_k.astype(jnp.float32)
    tvf = None if table_v is None else table_v.astype(jnp.float32)
    nbins = tqf.shape[0] if tqf is not None else 0
    big = jnp.int32(n)

    @jax.checkpoint
    def subtile_body(t_idx):
        t0 = t_idx * subtile
        q_t = jax.lax.dynamic_slice_in_dim(q_lw, t0, subtile)
        x_t = jax.lax.dynamic_slice_in_dim(x_lw, t0, subtile)
        c_t = jax.lax.dynamic_slice_in_dim(c_lw, t0, subtile)
        val_t = jax.lax.dynamic_slice_in_dim(val_lw, t0, subtile)
        r_q = jax.lax.dynamic_slice_in_dim(rows, t0, subtile)    # [st]

        r0 = jnp.min(jnp.where(r_q >= 0, r_q, big))
        r0 = jnp.clip(r0, 0, n - row_cap)
        tbl = jax.lax.dynamic_slice(
            plan.table_sorted, (r0, 0), (row_cap, s_cap))        # [R,S]
        kidx = jnp.clip(tbl, 0, n - 1).reshape(-1)               # [R*S]
        k_s = kf[kidx]                                           # [RS,h,d]
        v_s = vf[kidx]
        x_s = xf[kidx]
        c_s = cells[kidx]                                        # [RS,3]

        row_ids = r0 + jnp.arange(row_cap, dtype=jnp.int32)
        in_my_row = (r_q[:, None] == row_ids[None, :])           # [st,R]
        in_my_row = jnp.repeat(in_my_row, s_cap, axis=1)         # [st,RS]
        key_ok = (tbl.reshape(-1) >= 0)[None, :]
        same_cell = jnp.all(
            c_s[None, :, :] == c_t[:, None, :], axis=-1)         # [st,RS]
        mask = in_my_row & key_ok & ~same_cell & val_t[:, None]

        logits = jnp.einsum(
            "thd,mhd->thm", q_t, k_s,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # [st,h,RS]

        oh = None
        if tqf is not None:
            rel = x_t[:, None, :] - x_s[None, :, :]              # [st,RS,3]
            ridx = jnp_attn.relative_position_index(
                rel, window_size, quant_size, nbins)
            bins = jnp.arange(nbins, dtype=jnp.int32)
            oh = [(ridx[:, :, a, None] == bins).astype(jnp.float32)
                  for a in range(3)]                             # [st,RS,L]
            for a in range(3):
                qproj_a = jnp.einsum(
                    "thd,lhd->thl", q_t, tqf[:, :, :, a],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                logits += jnp.einsum(
                    "thl,tml->thm", qproj_a, oh[a],
                    precision=jax.lax.Precision.HIGHEST)
                if tkf is not None:
                    kproj_a = jnp.einsum(
                        "mhd,lhd->mhl", k_s, tkf[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)    # [RS,h,L]
                    logits += jnp.einsum(
                        "tml,mhl->thm", oh[a], kproj_a,
                        precision=jax.lax.Precision.HIGHEST)

        logits = jnp.where(mask[:, None, :], logits, NEG_INF)
        m = jnp.max(logits, axis=-1)
        p = jnp.where(mask[:, None, :], jnp.exp(logits - m[:, :, None]), 0.0)
        den = jnp.sum(p, axis=-1)
        acc = jnp.einsum(
            "thm,mhd->thd", p, v_s,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        if tvf is not None:
            for a in range(3):
                mass = jnp.einsum(
                    "thm,tml->thl", p, oh[a],
                    precision=jax.lax.Precision.HIGHEST)
                acc += jnp.einsum(
                    "thl,lhd->thd", mass, tvf[:, :, :, a],
                    precision=jax.lax.Precision.HIGHEST)
        return acc, m, den

    acc, m, den = jax.lax.map(
        subtile_body, jnp.arange(nst, dtype=jnp.int32),
        batch_size=min(map_batch, nst))
    acc = acc.reshape(n, h, d)
    m = m.reshape(n, h)
    den = den.reshape(n, h)
    # back to small-sorted order
    return acc[plan.lw_unmap], m[plan.lw_unmap], den[plan.lw_unmap]


def _merge(parts):
    """Compose online-softmax triples: [(acc, m, den), ...] -> normalised."""
    m = functools.reduce(jnp.maximum, [p[1] for p in parts])
    m = jnp.maximum(m, NEG_INF)
    acc = 0.0
    den = 0.0
    for a, mi, di in parts:
        s = jnp.exp(mi - m)
        acc = acc + a * s[:, :, None]
        den = den + di * s
    den = jnp.maximum(den, 1e-20)
    return acc / den[:, :, None]


def _fwd_impl(q, k, v, xyz, seg_start, seg_end, valid, sparse_idx,
              sparse_mask, table_q, table_k, table_v, *, window_size,
              quant_size, scale, band, tile, w_chunk, interpret, plan=None):
    parts = [band_attention(
        q, k, v, xyz, seg_start, seg_end, valid,
        table_q, table_k, table_v,
        window_size=window_size, quant_size=quant_size, scale=scale,
        band=band, tile=tile, w_chunk=w_chunk, interpret=interpret)]
    # NOTE: the table-banded variant (_sparse_half_banded) measured SLOWER
    # than the chunked path on v5e (21.3 vs 15.5 ms at N=8192): the static
    # row_cap padding multiplies the cRPE bias compute, which dominates the
    # gathers it saves. Kept for configurations with very large windows;
    # chunked is the default.
    if sparse_idx is not None:
        parts.append(_sparse_half(
            q, k, v, xyz, valid, sparse_idx, sparse_mask,
            table_q, table_k, table_v, window_size=window_size,
            quant_size=quant_size, scale=scale))
    return _merge(parts)


def stratified_attention_fused(
    q, k, v, xyz, seg_start, seg_end, valid,
    sparse_idx=None, sparse_mask=None,
    table_q=None, table_k=None, table_v=None,
    *, window_size, quant_size, scale, band, tile=128, w_chunk=64,
    interpret=False, plan=None,
):
    """Drop-in fused (Pallas) variant of
    ``ops.attention.stratified_attention``."""

    kw = dict(window_size=window_size, quant_size=quant_size, scale=scale,
              band=band, tile=tile)

    def reference(q, k, v, tq, tk, tv):
        return jnp_attn.stratified_attention(
            q, k, v, xyz, seg_start, seg_end, valid,
            sparse_idx=sparse_idx, sparse_mask=sparse_mask,
            table_q=tq, table_k=tk, table_v=tv, **kw)

    @jax.custom_vjp
    def f(q, k, v, tq, tk, tv):
        return _fwd_impl(
            q, k, v, xyz, seg_start, seg_end, valid, sparse_idx,
            sparse_mask, tq, tk, tv, **kw, w_chunk=w_chunk,
            interpret=interpret, plan=plan)

    def f_fwd(q, k, v, tq, tk, tv):
        return f(q, k, v, tq, tk, tv), (q, k, v, tq, tk, tv)

    def f_bwd(res, g):
        _, vjp = jax.vjp(reference, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    dummy = None
    tq = table_q
    tk = table_k
    tv = table_v
    if tq is None:
        return f(q, k, v, dummy, dummy, dummy)
    return f(q, k, v, tq, tk, tv)
