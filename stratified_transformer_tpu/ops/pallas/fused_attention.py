"""Fused banded window attention — Pallas TPU kernel.

Computes, per query tile of the window-sorted point array, the *dense* half
of the stratified attention (the band part of
``ops.attention.stratified_attention``) as one VMEM-resident flash-style
kernel: QK^T + contextual-RPE (query & key tables) -> online softmax ->
(V + value-table) accumulation. Replaces the four-kernel CUDA chain of the
reference (``attention_step1_v2`` / ``dot_prod_with_idx_v3`` /
``scatter_softmax`` / ``attention_step2_with_rel_pos_value_v2``,
``lib/pointops2/src``) for the in-window pairs.

Mosaic-friendly layout rules baked in here:
  * everything is 2D ``[rows, lanes]`` with heads packed into lanes
    (``[N, h*d]``); per-head work uses static lane slices;
  * the cRPE query bias is a *2D gather* ``qproj[t, ridx[t, w]]``
    (supported natively); the key bias and the value-table probability
    mass use one-hot elementwise-multiply-reduce (VPU);
  * relative-position bins are computed per axis from 2D column slices
    (slicing the 3-lane axis of a 3D value lowers as an unsupported
    gather).

The kernel returns the *unnormalised* triple (acc, row_max, denom) so the
sparse (far-key) half — a small gathered computation left to XLA — can be
merged by online-softmax composition in
``ops.attention_fused.stratified_attention_fused``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stratified_transformer_tpu.ops.pallas.common import (
    dynamic_chunk_bounds,
    rel_bins_chunk,
)

NEG_INF = -1e30

# scoped-VMEM ceiling for the kernels (v5e: 128MB physical)
_VMEM_MB = int(os.environ.get("ST_PALLAS_VMEM_MB", "100"))
_DISABLE_BOUNDS = bool(os.environ.get("ST_PALLAS_DISABLE_BOUNDS"))


def _band_kernel(
    # inputs
    q_ref,        # [T, h*d] VMEM (pre-scaled)
    ss_ref,       # [T, 1] int32
    se_ref,       # [T, 1] int32
    kx_ref,       # [N + 2B, hd_pad]  (ANY; lanes padded to 128-multiple)
    vx_ref,       # [N + 2B, hd_pad]  (ANY)
    xx_ref,       # [N + 2B, 128]     (ANY; xyz in cols 0..2, valid in col 3)

    tq_ref,       # [3, L2, h*d] VMEM (or [1,1,1] dummy)
    tk_ref,
    tv_ref,
    # outputs
    acc_ref,      # [T, h*d]
    m_ref,        # [T, h]
    den_ref,      # [T, h]
    # scratch
    kb_ref,       # [W, hd_pad]
    vb_ref,       # [W, hd_pad]
    xb_ref,       # [W, 128]
    sem,
    *,
    tile,
    band,
    w_chunk,
    num_heads,
    head_dim,
    num_bins,
    bin_lo,
    num_bins_full,
    window_size,
    quant_size,
    use_rpe,
    use_rel_value,
    fast,
):
    mm_prec = (jax.lax.Precision.DEFAULT if fast
               else jax.lax.Precision.HIGHEST)
    t_idx = pl.program_id(0)
    t0 = t_idx * tile
    w = tile + 2 * band
    h, d = num_heads, head_dim

    cps = [
        pltpu.make_async_copy(kx_ref.at[pl.ds(t0, w)], kb_ref, sem.at[0]),
        pltpu.make_async_copy(vx_ref.at[pl.ds(t0, w)], vb_ref, sem.at[1]),
        pltpu.make_async_copy(xx_ref.at[pl.ds(t0, w)], xb_ref, sem.at[2]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    ss = ss_ref[:]
    se = se_ref[:]
    # the query tile's own rows sit at [band, band+tile) of the band buffer
    x_t = xb_ref[pl.ds(band, tile)]                 # [T,128]
    val_t = x_t[:, 3:4]                             # [T,1]

    # Dynamic chunk bounds: only key chunks intersecting the union of the
    # tile's (valid) segments do any work. Typical window length << band,
    # so this skips ~40-60% of the band — the band width is sized for the
    # worst-case window, not the average one.
    n_chunks = w // w_chunk
    c_start, c_end = dynamic_chunk_bounds(
        ss, se, val_t, t0 - band, w_chunk, n_chunks)
    xq = max(w_chunk, num_bins)   # gather width, query side

    # q-side table projections depend only on the query tile — hoist out
    # of the chunk loop (was recomputed per chunk: 6x the dot count).
    qprojs = []                   # [h][a] -> [T, xq] padded
    if use_rpe:
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]
            row = []
            for a in range(3):
                qp = jax.lax.dot_general(
                    q_h, tq_ref[a][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec)      # [T,L2]
                row.append(jnp.pad(qp, ((0, 0), (0, xq - num_bins))))
            qprojs.append(row)

    def chunk_body(c, carry):
        m_run, den_run, acc_run, mass_run = carry
        c0 = pl.multiple_of(c * w_chunk, w_chunk)
        kc = kb_ref[pl.ds(c0, w_chunk)]             # [Wc, hd_pad]
        vc = vb_ref[pl.ds(c0, w_chunk)]
        xc = xb_ref[pl.ds(c0, w_chunk)]             # [Wc, 128]
        vmc = xc[:, 3:4]                            # [Wc, 1]

        pos = (t0 - band + c0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_chunk), 1))            # [1,Wc]
        in_seg = (pos >= ss) & (pos < se)           # [T,Wc]
        mask = in_seg & (val_t > 0) & (
            jnp.transpose(vmc, (1, 0)) > 0)         # [T,Wc]
        maskf = mask.astype(jnp.float32)

        ridxs, ridxs_tp, onehots_tp = [], [], []
        xk = max(tile, num_bins)      # gather width, key side
        if use_rpe:
            ridxs, ridxs_tp, onehots_tp = rel_bins_chunk(
                x_t, xc, tile=tile, w_chunk=w_chunk, num_bins=num_bins,
                bin_lo=bin_lo, num_bins_full=num_bins_full,
                window_size=window_size, quant_size=quant_size,
                xq=xq, xk=xk, with_onehot=use_rel_value)

        m_parts, den_parts, acc_parts = [], [], []
        mass_parts = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]                       # [T,d]
            k_h = kc[:, sl]                          # [Wc,d]
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec)  # [T,Wc]

            if use_rpe:
                for a in range(3):
                    # q-side bias: lane gather qproj[t, ridx[t,w]] (Mosaic
                    # supports same-shape take_along_axis on 2D operands)
                    logits += jnp.take_along_axis(
                        qprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]
                    # k-side bias: kproj[w, ridx[t,w]] via the transposed
                    # index layout
                    kproj = jax.lax.dot_general(
                        k_h, tk_ref[a][:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)   # [Wc,L2]
                    kproj = jnp.pad(
                        kproj, ((0, 0), (0, xk - num_bins)))
                    bk = jnp.take_along_axis(
                        kproj, ridxs_tp[a], axis=1)[:, :tile]  # [Wc,T]
                    logits += jnp.transpose(bk, (1, 0))

            logits = jnp.where(mask, logits, NEG_INF)
            m_prev = m_run[:, i:i + 1]                        # [T,1]
            m_new = jnp.maximum(
                m_prev, jnp.max(logits, axis=-1, keepdims=True))
            rescale = jnp.exp(m_prev - m_new)                 # [T,1]
            p = jnp.exp(logits - m_new) * maskf               # [T,Wc]
            den_new = den_run[:, i:i + 1] * rescale + jnp.sum(
                p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec)           # [T,d]
            acc_new = acc_run[:, sl] * rescale + pv

            m_parts.append(m_new)
            den_parts.append(den_new)
            acc_parts.append(acc_new)
            if use_rpe and use_rel_value:
                for a in range(3):
                    # mass[t,l] += sum_w p[t,w] * onehot_tp[t,l,w]
                    # (last-axis reduction of a bins-major one-hot)
                    pm = jnp.sum(
                        onehots_tp[a] * p[:, None, :], axis=-1)  # [T,L2]
                    mass_parts.append(
                        mass_run[:, (i * 3 + a) * num_bins:
                                 (i * 3 + a + 1) * num_bins] * rescale + pm)

        m_run = jnp.concatenate(m_parts, axis=1)
        den_run = jnp.concatenate(den_parts, axis=1)
        acc_run = jnp.concatenate(acc_parts, axis=1)
        if use_rpe and use_rel_value:
            mass_run = jnp.concatenate(mass_parts, axis=1)
        return (m_run, den_run, acc_run, mass_run)

    m0 = jnp.full((tile, h), NEG_INF, jnp.float32)
    den0 = jnp.zeros((tile, h), jnp.float32)
    acc0 = jnp.zeros((tile, h * d), jnp.float32)
    mass0 = (jnp.zeros((tile, h * 3 * num_bins), jnp.float32)
             if use_rpe and use_rel_value
             else jnp.zeros((tile, 1), jnp.float32))

    m_f, den_f, acc_f, mass_f = jax.lax.fori_loop(
        c_start, c_end, chunk_body, (m0, den0, acc0, mass0))

    if use_rpe and use_rel_value:
        outs = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            acc_h = acc_f[:, sl]
            for a in range(3):
                mass_ha = mass_f[:, (i * 3 + a) * num_bins:
                                 (i * 3 + a + 1) * num_bins]  # [T,L2]
                acc_h = acc_h + jax.lax.dot_general(
                    mass_ha.astype(tv_ref.dtype), tv_ref[a][:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec)
            outs.append(acc_h)
        acc_f = jnp.concatenate(outs, axis=1)

    acc_ref[:] = acc_f
    m_ref[:] = m_f
    den_ref[:] = den_f


def _sparse_kernel(
    # scalar prefetch
    bases_ref,    # [nt] int32 — aux slice base per query tile (SMEM)
    # inputs
    q_ref,        # [T, h*d] VMEM (pre-scaled, lw-sorted)
    ks_ref,       # [T, 1] int32 aux segment start
    ke_ref,       # [T, 1] int32 aux segment end
    skq_ref,      # [T, 1] int32 query small-window key
    xq_ref,       # [T, 128] f32 — query xyz cols 0..2, valid col 3
    kx_ref,       # [A, hd_pad]  (ANY)
    vx_ref,       # [A, hd_pad]  (ANY)
    xx_ref,       # [A, 128]     (ANY; member xyz cols 0..2, valid col 3)
    skx_ref,      # [A, 128]     (ANY int32; member small-window key col 0)
    tq_ref,       # [3, L2, h*d] VMEM (or [1,1,1] dummy)
    tk_ref,
    tv_ref,
    # outputs
    acc_ref,      # [T, h*d]
    m_ref,        # [T, h]
    den_ref,      # [T, h]
    # scratch
    kb_ref,       # [S, hd_pad]
    vb_ref,       # [S, hd_pad]
    xb_ref,       # [S, 128]
    skb_ref,      # [S, 128] int32
    sem,
    *,
    tile,
    s_band,
    w_chunk,
    num_heads,
    head_dim,
    num_bins,
    window_size,
    quant_size,
    use_rpe,
    use_rel_value,
    fast,
):
    """Stratified far-key half over the `SparseBandLayout` aux arrays.

    Identical flash-attention structure to `_band_kernel`, except:
      * the key slice base is *dynamic* — ``bases[t] = min(sb_start[t*T],
        A - S)`` (key segments advance monotonically in lw order, so one
        contiguous aux window covers the whole query tile);
      * the mask is the aux segment ``[ks, ke)`` per query plus the
        "not in my small window" exclusion (reference ``mask_mat_prev``,
        ``model/stratified_transformer.py:28-35``);
      * cRPE bins span the full ±2·window range (no band slicing).
    """
    mm_prec = (jax.lax.Precision.DEFAULT if fast
               else jax.lax.Precision.HIGHEST)
    t_idx = pl.program_id(0)
    base = pl.multiple_of(bases_ref[t_idx], 16)
    h, d = num_heads, head_dim

    cps = [
        pltpu.make_async_copy(
            kx_ref.at[pl.ds(base, s_band)], kb_ref, sem.at[0]),
        pltpu.make_async_copy(
            vx_ref.at[pl.ds(base, s_band)], vb_ref, sem.at[1]),
        pltpu.make_async_copy(
            xx_ref.at[pl.ds(base, s_band)], xb_ref, sem.at[2]),
        pltpu.make_async_copy(
            skx_ref.at[pl.ds(base, s_band)], skb_ref, sem.at[3]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    ks = ks_ref[:]
    ke = ke_ref[:]
    skq = skq_ref[:]                                 # [T,1]
    x_t = xq_ref[:]                                  # [T,128]
    val_t = x_t[:, 3:4]                              # [T,1]

    # Dynamic chunk bounds over the union of (valid) aux segments — the
    # typical tile span is far below s_band (sized for the worst case).
    n_chunks = s_band // w_chunk
    c_start, c_end = dynamic_chunk_bounds(
        ks, ke, val_t, base, w_chunk, n_chunks)
    xq = max(w_chunk, num_bins)   # gather width, query side

    qprojs = []                   # [h][a] -> [T, xq] padded
    if use_rpe:
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]
            row = []
            for a in range(3):
                qp = jax.lax.dot_general(
                    q_h, tq_ref[a][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec)      # [T,L2]
                row.append(jnp.pad(qp, ((0, 0), (0, xq - num_bins))))
            qprojs.append(row)

    def chunk_body(c, carry):
        m_run, den_run, acc_run, mass_run = carry
        c0 = pl.multiple_of(c * w_chunk, w_chunk)
        kc = kb_ref[pl.ds(c0, w_chunk)]             # [Wc, hd_pad]
        vc = vb_ref[pl.ds(c0, w_chunk)]
        xc = xb_ref[pl.ds(c0, w_chunk)]             # [Wc, 128]
        skc = skb_ref[pl.ds(c0, w_chunk)]           # [Wc, 128] int32
        vmc = xc[:, 3:4]                            # [Wc, 1]
        sk_b = jnp.transpose(skc[:, 0:1], (1, 0))   # [1, Wc]

        pos = (base + c0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_chunk), 1))            # [1,Wc]
        in_seg = (pos >= ks) & (pos < ke)           # [T,Wc]
        not_same = sk_b != skq                      # [T,Wc]
        mask = in_seg & not_same & (val_t > 0) & (
            jnp.transpose(vmc, (1, 0)) > 0)         # [T,Wc]
        maskf = mask.astype(jnp.float32)

        ridxs, ridxs_tp, onehots_tp = [], [], []
        xk = max(tile, num_bins)      # gather width, key side
        if use_rpe:
            ridxs, ridxs_tp, onehots_tp = rel_bins_chunk(
                x_t, xc, tile=tile, w_chunk=w_chunk, num_bins=num_bins,
                bin_lo=0, num_bins_full=num_bins,
                window_size=window_size, quant_size=quant_size,
                xq=xq, xk=xk, with_onehot=use_rel_value)

        m_parts, den_parts, acc_parts = [], [], []
        mass_parts = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]                       # [T,d]
            k_h = kc[:, sl]                          # [Wc,d]
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec)  # [T,Wc]

            if use_rpe:
                for a in range(3):
                    logits += jnp.take_along_axis(
                        qprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]
                    kproj = jax.lax.dot_general(
                        k_h, tk_ref[a][:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)   # [Wc,L2]
                    kproj = jnp.pad(
                        kproj, ((0, 0), (0, xk - num_bins)))
                    bk = jnp.take_along_axis(
                        kproj, ridxs_tp[a], axis=1)[:, :tile]  # [Wc,T]
                    logits += jnp.transpose(bk, (1, 0))

            logits = jnp.where(mask, logits, NEG_INF)
            m_prev = m_run[:, i:i + 1]                        # [T,1]
            m_new = jnp.maximum(
                m_prev, jnp.max(logits, axis=-1, keepdims=True))
            rescale = jnp.exp(m_prev - m_new)                 # [T,1]
            p = jnp.exp(logits - m_new) * maskf               # [T,Wc]
            den_new = den_run[:, i:i + 1] * rescale + jnp.sum(
                p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vc.dtype), vc[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_prec)           # [T,d]
            acc_new = acc_run[:, sl] * rescale + pv

            m_parts.append(m_new)
            den_parts.append(den_new)
            acc_parts.append(acc_new)
            if use_rpe and use_rel_value:
                for a in range(3):
                    pm = jnp.sum(
                        onehots_tp[a] * p[:, None, :], axis=-1)  # [T,L2]
                    mass_parts.append(
                        mass_run[:, (i * 3 + a) * num_bins:
                                 (i * 3 + a + 1) * num_bins] * rescale + pm)

        m_run = jnp.concatenate(m_parts, axis=1)
        den_run = jnp.concatenate(den_parts, axis=1)
        acc_run = jnp.concatenate(acc_parts, axis=1)
        if use_rpe and use_rel_value:
            mass_run = jnp.concatenate(mass_parts, axis=1)
        return (m_run, den_run, acc_run, mass_run)

    m0 = jnp.full((tile, h), NEG_INF, jnp.float32)
    den0 = jnp.zeros((tile, h), jnp.float32)
    acc0 = jnp.zeros((tile, h * d), jnp.float32)
    mass0 = (jnp.zeros((tile, h * 3 * num_bins), jnp.float32)
             if use_rpe and use_rel_value
             else jnp.zeros((tile, 1), jnp.float32))

    m_f, den_f, acc_f, mass_f = jax.lax.fori_loop(
        c_start, c_end, chunk_body, (m0, den0, acc0, mass0))

    if use_rpe and use_rel_value:
        outs = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            acc_h = acc_f[:, sl]
            for a in range(3):
                mass_ha = mass_f[:, (i * 3 + a) * num_bins:
                                 (i * 3 + a + 1) * num_bins]  # [T,L2]
                acc_h = acc_h + jax.lax.dot_general(
                    mass_ha.astype(tv_ref.dtype), tv_ref[a][:, sl],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_prec)
            outs.append(acc_h)
        acc_f = jnp.concatenate(outs, axis=1)

    acc_ref[:] = acc_f
    m_ref[:] = m_f
    den_ref[:] = den_f


def sparse_band_attention(
    q, k, v, sb,
    table_q=None, table_k=None, table_v=None,
    *,
    window_size, quant_size, scale, s_band=128, tile=128, w_chunk=64,
    interpret=False, fast=False,
):
    """Pallas stratified far-key attention over the band-structured layout.

    Drop-in replacement for ``ops.attention.sparse_band_triple``: q/k/v are
    ``[N, h, d]`` in *small*-window-sorted order, ``sb`` is an
    ``ops.plan.SparseBandLayout``. Returns the unnormalised online-softmax
    triple ``(acc, m, den)`` in small-sorted order.
    """
    n, h, d = q.shape
    assert n % tile == 0, (n, tile)
    nt = n // tile
    a_sz = int(sb.sb_src.shape[0])
    ws_band = min(s_band, a_sz)
    if ws_band % w_chunk:
        w_chunk = ws_band  # degenerate small layouts: one chunk
    use_rpe = table_q is not None
    use_rel_value = table_v is not None
    num_bins = table_q.shape[0] if use_rpe else 0

    hd = h * d
    hd_pad = ((hd + 127) // 128) * 128
    # All buffers stay fp32: Mosaic cannot dynamic-offset-slice packed
    # (bf16) memrefs, and the kernel's DMA base is data-dependent. ``fast``
    # instead selects DEFAULT matmul precision = bf16 MXU passes on fp32
    # operands (same MXU throughput; only the staging bytes differ, and the
    # aux buffers are small).
    cdt = jnp.float32
    qf = (jnp.asarray(q, jnp.float32) * scale).reshape(n, hd)
    # queries to lw order ([N]-index row gathers — cheap)
    q_lw = qf[sb.lw_map].astype(cdt)
    xq = jnp.concatenate([
        jnp.asarray(sb.xyz_lw, jnp.float32),
        jnp.asarray(sb.valid_lw, jnp.float32)[:, None],
    ], axis=1)
    xq = jnp.pad(xq, ((0, 0), (0, 128 - 4)))

    # aux member arrays (one [A]-row gather each)
    src = jnp.clip(sb.sb_src, 0, n - 1)
    okm = sb.sb_valid[:, None]
    kx = jnp.pad(
        jnp.where(okm, jnp.asarray(k, jnp.float32).reshape(n, hd)[src], 0.0),
        ((0, 0), (0, hd_pad - hd))).astype(cdt)
    vx = jnp.pad(
        jnp.where(okm, jnp.asarray(v, jnp.float32).reshape(n, hd)[src], 0.0),
        ((0, 0), (0, hd_pad - hd))).astype(cdt)
    xx = jnp.concatenate([
        jnp.asarray(sb.sb_xyz, jnp.float32),
        jnp.asarray(sb.sb_valid, jnp.float32)[:, None],
    ], axis=1)
    xx = jnp.pad(xx, ((0, 0), (0, 128 - 4)))
    skx = jnp.pad(jnp.asarray(sb.sb_skey, jnp.int32)[:, None],
                  ((0, 0), (0, 127)))

    ks = jnp.asarray(sb.sb_start, jnp.int32)[:, None]
    ke = jnp.asarray(sb.sb_end, jnp.int32)[:, None]
    skq = jnp.asarray(sb.q_skey_lw, jnp.int32)[:, None]
    # Align the dynamic DMA base to the sublane packing (16 rows covers
    # both fp32 (8,128) and bf16 (16,128) tilings — Mosaic cannot slice a
    # packed memref at an unaligned dynamic row offset). Rounding DOWN
    # keeps coverage: segments start at >= base.
    bases = jnp.minimum(
        sb.sb_start.reshape(nt, tile)[:, 0], a_sz - ws_band
    ).astype(jnp.int32)
    bases = (bases // 16) * 16

    def pack(t):
        tt = jnp.asarray(t, cdt)
        return jnp.transpose(tt, (3, 0, 1, 2)).reshape(3, num_bins, hd)

    dummy = jnp.zeros((1, 1, 1), cdt)
    tq = pack(table_q) if use_rpe else dummy
    tk = pack(table_k) if use_rpe else dummy
    tv = pack(table_v) if use_rel_value else dummy

    kernel = functools.partial(
        _sparse_kernel, tile=tile, s_band=ws_band, w_chunk=w_chunk,
        num_heads=h, head_dim=d, num_bins=num_bins,
        window_size=float(window_size), quant_size=float(quant_size),
        use_rpe=use_rpe, use_rel_value=use_rel_value, fast=fast,
    )

    vmem = pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i, b: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i, b: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i, b: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 128), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec(memory_space=pl.ANY),      # kx
            pl.BlockSpec(memory_space=pl.ANY),      # vx
            pl.BlockSpec(memory_space=pl.ANY),      # xx
            pl.BlockSpec(memory_space=pl.ANY),      # skx
            pl.BlockSpec(memory_space=vmem),        # tq
            pl.BlockSpec(memory_space=vmem),        # tk
            pl.BlockSpec(memory_space=vmem),        # tv
        ],
        out_specs=[
            pl.BlockSpec((tile, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i, b: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i, b: (i, 0), memory_space=vmem),
        ],
        scratch_shapes=[
            pltpu.VMEM((ws_band, hd_pad), cdt),
            pltpu.VMEM((ws_band, hd_pad), cdt),
            pltpu.VMEM((ws_band, 128), jnp.float32),
            pltpu.VMEM((ws_band, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    acc, m, den = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, hd), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
            disable_bounds_checks=_DISABLE_BOUNDS),
        interpret=interpret,
    )(bases, q_lw, ks, ke, skq, xq, kx, vx, xx, skx, tq, tk, tv)
    # back to small-sorted order
    u = sb.lw_unmap
    return acc.reshape(n, h, d)[u], m[u], den[u]


def band_attention(
    q, k, v, xyz, seg_start, seg_end, valid,
    table_q=None, table_k=None, table_v=None,
    *,
    window_size, quant_size, scale, band, tile=128, w_chunk=64,
    interpret=False, fast=False,
):
    """Dense band half of the stratified attention.

    Args mirror ``ops.attention.stratified_attention`` (sorted order,
    ``[N, h, d]`` q/k/v). Returns the online-softmax triple
    ``(acc [N,h,d], m [N,h], denom [N,h])`` with tile-local maxima, ready
    for composition with the sparse half.
    """
    n, h, d = q.shape
    assert n % tile == 0
    w = tile + 2 * band
    assert w % w_chunk == 0, (w, w_chunk)
    nt = n // tile

    use_rpe = table_q is not None
    use_rel_value = table_v is not None
    num_bins_full = table_q.shape[0] if use_rpe else 0

    # Band pairs share a small window => per-axis |rel| < window, so only
    # the middle ~qgl+3 of the 2*qgl table rows are reachable (the rest
    # exist for the +-2*window sparse pairs). Slice the tables and shift
    # the bin index — exact for every unmasked pair, ~2x less RPE compute.
    # nb is rounded to a sublane multiple for Mosaic-friendly shapes.
    bin_lo = 0
    num_bins = num_bins_full
    if use_rpe:
        qgl = num_bins_full // 2
        bin_lo = max(qgl // 2 - 1, 0)
        nb = ((qgl + 3 + 7) // 8) * 8
        num_bins = min(num_bins_full - bin_lo, nb)

    hd = h * d
    hd_pad = ((hd + 127) // 128) * 128
    cdt = jnp.bfloat16 if fast else jnp.float32
    # q is pre-scaled in fp32, then staged at the compute dtype
    qf = (jnp.asarray(q, jnp.float32) * scale).reshape(n, hd).astype(cdt)
    # Manually-DMA'd (ANY-space) buffers need 128-multiple lane dims —
    # Mosaic cannot memref_slice partially-padded lane tiles.
    kx = jnp.pad(jnp.asarray(k, cdt).reshape(n, hd),
                 ((band, band), (0, hd_pad - hd)))
    vx = jnp.pad(jnp.asarray(v, cdt).reshape(n, hd),
                 ((band, band), (0, hd_pad - hd)))
    xx = jnp.concatenate([
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(valid, jnp.float32)[:, None],
    ], axis=1)
    xx = jnp.pad(xx, ((band, band), (0, 128 - 4)))
    ss = jnp.asarray(seg_start, jnp.int32)[:, None]
    se = jnp.asarray(seg_end, jnp.int32)[:, None]

    def pack(t):
        # [L2,h,d,3] -> [3, nb, h*d] (band slice of the table rows)
        tt = jnp.asarray(t, cdt)[bin_lo:bin_lo + num_bins]
        return jnp.transpose(tt, (3, 0, 1, 2)).reshape(3, num_bins, h * d)

    dummy = jnp.zeros((1, 1, 1), cdt)
    tq = pack(table_q) if use_rpe else dummy
    tk = pack(table_k) if use_rpe else dummy
    tv = pack(table_v) if use_rel_value else dummy

    kernel = functools.partial(
        _band_kernel, tile=tile, band=band, w_chunk=w_chunk,
        num_heads=h, head_dim=d, num_bins=num_bins, bin_lo=bin_lo,
        num_bins_full=num_bins_full,
        window_size=float(window_size), quant_size=float(quant_size),
        use_rpe=use_rpe, use_rel_value=use_rel_value, fast=fast,
    )

    vmem = pltpu.VMEM
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, h * d), lambda i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec(memory_space=pl.ANY),      # kx
            pl.BlockSpec(memory_space=pl.ANY),      # vx
            pl.BlockSpec(memory_space=pl.ANY),      # xx
            pl.BlockSpec(memory_space=vmem),        # tq
            pl.BlockSpec(memory_space=vmem),        # tk
            pl.BlockSpec(memory_space=vmem),        # tv
        ],
        out_specs=[
            pl.BlockSpec((tile, h * d), lambda i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, hd_pad), cdt),
            pltpu.VMEM((w, hd_pad), cdt),
            pltpu.VMEM((w, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    acc, m, den = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, h * d), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
        ],
        grid_spec=grid_spec,
        # v5e has 128MB VMEM; the compiler's default scoped limit is 16MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
            disable_bounds_checks=_DISABLE_BOUNDS),
        interpret=interpret,
    )(qf, ss, se, kx, vx, xx, tq, tk, tv)
    return acc.reshape(n, h, d), m, den
