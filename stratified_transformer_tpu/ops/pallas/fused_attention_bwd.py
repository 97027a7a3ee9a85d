"""Pallas TPU backward kernels for the fused stratified attention.

Flash-style backward: given the forward residuals (merged online-softmax
statistics ``m``/``den`` and the normalised output ``o``), each query tile
recomputes its pair logits exactly as the forward kernel does, forms the
normalised probabilities ``r = exp(l - m)/den`` and the logit cotangent

    dl = r * (g . (v + T_v[ridx]) - g . o)

and accumulates

    dq   += dl @ (k + T_q[ridx])          (tile-local)
    dk_w += dl^T @ q + one_hot-mass @ T_k (per-tile band buffer)
    dv_w += r^T @ g
    dT_q += dmass_q^T @ q,  dT_k += dmass_k @ k,  dT_v += mass_r^T @ g

The per-tile ``dk``/``dv`` band buffers overlap between neighbouring tiles;
with ``band % tile == 0`` they are re-composed in XLA as ``W/tile`` shifted
diagonal adds (no scatters). Table gradients are emitted per tile and summed
in XLA. This replaces the reference's backward chain of four CUDA kernels
with shared-memory + atomicAdd accumulation
(``lib/pointops2/src/attention_v2/attention_cuda_kernel_v2.cu:53-91``,
``relative_pos_encoding_cuda_kernel_v2.cu:287-340,441-484``) — here the
"atomics" become deterministic diagonal adds and tile-sums.

Both halves share the same statistics: the forward merge produces one global
``(m, den)`` per (query, head), so each half's backward is independent and
their parameter gradients add.
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


def _band_bwd_kernel(
    # inputs
    q_ref,        # [T, h*d] VMEM (pre-scaled)
    g_ref,        # [T, h*d] dL/dout
    o_ref,        # [T, h*d] normalised forward output
    m_ref,        # [T, h]  merged row max
    den_ref,      # [T, h]  merged denominator
    ss_ref,       # [T, 1] int32
    se_ref,       # [T, 1] int32
    kx_ref,       # [N + 2B, hd_pad]  (ANY)
    vx_ref,       # [N + 2B, hd_pad]  (ANY)
    xx_ref,       # [N + 2B, 128]     (ANY)
    tq_ref,       # [3, L, h*d] VMEM (or dummy)
    tk_ref,
    tv_ref,
    # outputs
    dq_ref,       # [T, h*d]
    dk_ref,       # [W, hd_pad]   (per-tile band slice)
    dv_ref,       # [W, hd_pad]
    dtq_ref,      # [3*L, h*d]    (per-tile partial)
    dtk_ref,
    dtv_ref,
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
    # zero the accumulators while the DMA flies
    dk_ref[:] = jnp.zeros_like(dk_ref)
    dv_ref[:] = jnp.zeros_like(dv_ref)
    if use_rpe:
        dtq_ref[:] = jnp.zeros_like(dtq_ref)
        dtk_ref[:] = jnp.zeros_like(dtk_ref)
        dtv_ref[:] = jnp.zeros_like(dtv_ref)
    for cp in cps:
        cp.wait()

    ss = ss_ref[:]
    se = se_ref[:]
    x_t = xb_ref[pl.ds(band, tile)]                 # [T,128]
    val_t = x_t[:, 3:4]

    n_chunks = w // w_chunk
    c_start, c_end = dynamic_chunk_bounds(
        ss, se, val_t, t0 - band, w_chunk, n_chunks)
    xq = max(w_chunk, num_bins)

    den = jnp.maximum(den_ref[:], 1e-20)            # [T,h]
    m_all = m_ref[:]

    # per-(head, axis) projections hoisted out of the chunk loop
    qprojs, gprojs = [], []
    go = []                                         # [h] -> [T,1]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        go.append(jnp.sum(g_ref[:, sl] * o_ref[:, sl], axis=-1,
                          keepdims=True))
        if use_rpe:
            rowq, rowg = [], []
            for a in range(3):
                qp = jax.lax.dot_general(
                    q_ref[:, sl], tq_ref[a][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=mm_prec)
                rowq.append(jnp.pad(qp, ((0, 0), (0, xq - num_bins))))
                if use_rel_value:
                    gp = jax.lax.dot_general(
                        g_ref[:, sl], tv_ref[a][:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    rowg.append(jnp.pad(gp, ((0, 0), (0, xq - num_bins))))
            qprojs.append(rowq)
            gprojs.append(rowg)

    def chunk_body(c, dq_run):
        c0 = pl.multiple_of(c * w_chunk, w_chunk)
        kc = kb_ref[pl.ds(c0, w_chunk)]
        vc = vb_ref[pl.ds(c0, w_chunk)]
        xc = xb_ref[pl.ds(c0, w_chunk)]
        vmc = xc[:, 3:4]

        pos = (t0 - band + c0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_chunk), 1))
        in_seg = (pos >= ss) & (pos < se)
        mask = in_seg & (val_t > 0) & (jnp.transpose(vmc, (1, 0)) > 0)
        maskf = mask.astype(jnp.float32)

        ridxs, ridxs_tp, onehots = [], [], []
        xk = max(tile, num_bins)
        if use_rpe:
            ridxs, ridxs_tp, onehots = rel_bins_chunk(
                x_t, xc, tile=tile, w_chunk=w_chunk, num_bins=num_bins,
                bin_lo=bin_lo, num_bins_full=num_bins_full,
                window_size=window_size, quant_size=quant_size,
                xq=xq, xk=xk, with_onehot=True)

        dq_parts = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]
            g_h = g_ref[:, sl]
            k_h = kc[:, sl]
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            gv = jax.lax.dot_general(
                g_h, vc[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)

            if use_rpe:
                for a in range(3):
                    logits += jnp.take_along_axis(
                        qprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]
                    kproj = jax.lax.dot_general(
                        k_h, tk_ref[a][:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    kproj = jnp.pad(kproj, ((0, 0), (0, xk - num_bins)))
                    bk = jnp.take_along_axis(
                        kproj, ridxs_tp[a], axis=1)[:, :tile]
                    logits += jnp.transpose(bk, (1, 0))
                    if use_rel_value:
                        gv += jnp.take_along_axis(
                            gprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]

            m_h = m_all[:, i:i + 1]
            # mask BEFORE exp: a masked slot's raw logit can exceed the
            # valid row max, and exp overflow * maskf(0) would give NaN
            logits = jnp.where(mask, logits, NEG_INF)
            r = jnp.exp(logits - m_h) * maskf / den[:, i:i + 1]  # [T,Wc]
            dl = r * (gv - go[i])                                # [T,Wc]

            # dq (tile-local)
            dq_h = jax.lax.dot_general(
                dl, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            # dk/dv (band accumulators)
            dk_h = jax.lax.dot_general(
                dl, q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            dv_h = jax.lax.dot_general(
                r, g_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)

            if use_rpe:
                for a in range(3):
                    oh = onehots[a]                               # [T,L,Wc]
                    # query-table mass of dl: [T,L]
                    dmq = jnp.sum(oh * dl[:, None, :], axis=-1)
                    dq_h += jax.lax.dot_general(
                        dmq, tq_ref[a][:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    # key-table mass of dl: [L,Wc]
                    dmk = jnp.sum(oh * dl[:, None, :], axis=0)
                    dk_h += jax.lax.dot_general(
                        jnp.transpose(dmk, (1, 0)), tk_ref[a][:, sl],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    # table grads
                    dtq_ref[pl.ds(a * num_bins, num_bins), sl] += (
                        jax.lax.dot_general(
                            dmq, q_h, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_prec))
                    dtk_ref[pl.ds(a * num_bins, num_bins), sl] += (
                        jax.lax.dot_general(
                            dmk, k_h, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_prec))
                    if use_rel_value:
                        mass_r = jnp.sum(oh * r[:, None, :], axis=-1)
                        dtv_ref[pl.ds(a * num_bins, num_bins), sl] += (
                            jax.lax.dot_general(
                                mass_r, g_h, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=mm_prec))

            dk_ref[pl.ds(c0, w_chunk), sl] += dk_h
            dv_ref[pl.ds(c0, w_chunk), sl] += dv_h
            dq_parts.append(dq_h)

        return dq_run + jnp.concatenate(dq_parts, axis=1)

    dq0 = jnp.zeros((tile, h * d), jnp.float32)
    dq_f = jax.lax.fori_loop(c_start, c_end, chunk_body, dq0)
    dq_ref[:] = dq_f


def band_attention_bwd(
    q, k, v, xyz, seg_start, seg_end, valid, g, o, m, den,
    table_q=None, table_k=None, table_v=None,
    *,
    window_size, quant_size, scale, band, tile=128, w_chunk=64,
    interpret=False, fast=False,
):
    """Backward of the band half w.r.t. (q, k, v, table_q/k/v).

    Args mirror `fused_attention.band_attention` plus the cotangent ``g``
    [N,h,d] and the forward residuals ``o`` (normalised output, [N,h,d]),
    ``m``/``den`` ([N,h], MERGED over both halves).
    Returns ``(dq, dk, dv, dtq, dtk, dtv)`` (table grads None when absent).
    """
    n, h, d = q.shape
    assert n % tile == 0
    assert band % tile == 0, (band, tile)  # diagonal re-add needs alignment
    w = tile + 2 * band
    assert w % w_chunk == 0
    nt = n // tile

    use_rpe = table_q is not None
    use_rel_value = table_v is not None
    num_bins_full = table_q.shape[0] if use_rpe else 0
    bin_lo = 0
    num_bins = num_bins_full
    if use_rpe:
        qgl = num_bins_full // 2
        bin_lo = max(qgl // 2 - 1, 0)
        nb = ((qgl + 3 + 7) // 8) * 8
        num_bins = min(num_bins_full - bin_lo, nb)

    hd = h * d
    hd_pad = ((hd + 127) // 128) * 128
    qf = (jnp.asarray(q, jnp.float32) * scale).reshape(n, hd)
    gf = jnp.asarray(g, jnp.float32).reshape(n, hd)
    of = jnp.asarray(o, jnp.float32).reshape(n, hd)
    kx = jnp.pad(jnp.asarray(k, jnp.float32).reshape(n, hd),
                 ((band, band), (0, hd_pad - hd)))
    vx = jnp.pad(jnp.asarray(v, jnp.float32).reshape(n, hd),
                 ((band, band), (0, hd_pad - hd)))
    xx = jnp.concatenate([
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(valid, jnp.float32)[:, None],
    ], axis=1)
    xx = jnp.pad(xx, ((band, band), (0, 128 - 4)))
    ss = jnp.asarray(seg_start, jnp.int32)[:, None]
    se = jnp.asarray(seg_end, jnp.int32)[:, None]

    def pack(t):
        tt = jnp.asarray(t, jnp.float32)[bin_lo:bin_lo + num_bins]
        return jnp.transpose(tt, (3, 0, 1, 2)).reshape(3, num_bins, hd)

    dummy = jnp.zeros((1, 1, 1), jnp.float32)
    tq = pack(table_q) if use_rpe else dummy
    tk = pack(table_k) if use_rpe else dummy
    tv = pack(table_v) if use_rel_value else dummy
    lrows = max(3 * num_bins, 8)

    kernel = functools.partial(
        _band_bwd_kernel, tile=tile, band=band, w_chunk=w_chunk,
        num_heads=h, head_dim=d, num_bins=num_bins, bin_lo=bin_lo,
        num_bins_full=num_bins_full,
        window_size=float(window_size), quant_size=float(quant_size),
        use_rpe=use_rpe, use_rel_value=use_rel_value, fast=fast,
    )

    vmem = pltpu.VMEM
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
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
            pl.BlockSpec((tile, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((w, hd_pad), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((w, hd_pad), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i: (i, 0), memory_space=vmem),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, hd_pad), jnp.float32),
            pltpu.VMEM((w, hd_pad), jnp.float32),
            pltpu.VMEM((w, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    dq, dkw, dvw, dtqw, dtkw, dtvw = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * w, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt * w, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
            disable_bounds_checks=_DISABLE_BOUNDS),
        interpret=interpret,
    )(qf, gf, of, m, den, ss, se, kx, vx, xx, tq, tk, tv)

    # --- compose the overlapping band buffers: W/tile shifted diagonals ---
    def diag_add(buf):
        parts = buf.reshape(nt, w // tile, tile, hd_pad)[..., :hd]
        total = jnp.zeros((n, hd), jnp.float32)
        bt = band // tile
        for j in range(w // tile):
            rows = parts[:, j].reshape(nt * tile, hd)
            shift = (j - bt) * tile     # absolute offset of part j
            if abs(shift) >= n:
                continue                # band wider than the whole input
            if shift == 0:
                total = total + rows
            elif shift > 0:
                total = total.at[shift:].add(rows[:n - shift])
            else:
                total = total.at[:n + shift].add(rows[-shift:])
        return total

    dk = diag_add(dkw).reshape(n, h, d)
    dv = diag_add(dvw).reshape(n, h, d)
    dq = (dq * scale).reshape(n, h, d)

    def table_sum(tw):
        if not use_rpe:
            return None
        # [nt*lrows, hd] -> [nt, 3, num_bins, hd] -> sum tiles -> unpack
        t = tw.reshape(nt, lrows, hd)[:, :3 * num_bins]
        t = jnp.sum(t, axis=0).reshape(3, num_bins, h, d)
        full = jnp.zeros((3, num_bins_full, h, d), jnp.float32)
        full = jax.lax.dynamic_update_slice(full, t, (0, bin_lo, 0, 0))
        return jnp.transpose(full, (1, 2, 3, 0))     # [L,h,d,3]

    dtq = table_sum(dtqw)
    dtk = table_sum(dtkw)
    dtv = table_sum(dtvw) if use_rel_value else None
    return dq, dk, dv, dtq, dtk, dtv


def _sparse_bwd_kernel(
    # scalar prefetch
    bases_ref,    # [nt] int32
    # inputs (lw order)
    q_ref,        # [T, h*d] (pre-scaled)
    g_ref,        # [T, h*d]
    o_ref,        # [T, h*d]
    m_ref,        # [T, h]
    den_ref,      # [T, h]
    ks_ref,       # [T, 1] int32
    ke_ref,       # [T, 1] int32
    skq_ref,      # [T, 1] int32
    xq_ref,       # [T, 128]
    kx_ref,       # [A, hd_pad]  (ANY; aux order)
    vx_ref,       # [A, hd_pad]  (ANY)
    xx_ref,       # [A, 128]     (ANY)
    skx_ref,      # [A, 128]     (ANY int32)
    tq_ref,       # [3, L, h*d]
    tk_ref,
    tv_ref,
    # outputs
    dq_ref,       # [T, h*d]
    dk_ref,       # [S, hd_pad]  (per-tile aux window)
    dv_ref,       # [S, hd_pad]
    dtq_ref,      # [3*L, h*d]
    dtk_ref,
    dtv_ref,
    # scratch
    kb_ref,
    vb_ref,
    xb_ref,
    skb_ref,
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
    dk_ref[:] = jnp.zeros_like(dk_ref)
    dv_ref[:] = jnp.zeros_like(dv_ref)
    if use_rpe:
        dtq_ref[:] = jnp.zeros_like(dtq_ref)
        dtk_ref[:] = jnp.zeros_like(dtk_ref)
        dtv_ref[:] = jnp.zeros_like(dtv_ref)
    for cp in cps:
        cp.wait()

    ks = ks_ref[:]
    ke = ke_ref[:]
    skq = skq_ref[:]
    x_t = xq_ref[:]
    val_t = x_t[:, 3:4]

    n_chunks = s_band // w_chunk
    c_start, c_end = dynamic_chunk_bounds(
        ks, ke, val_t, base, w_chunk, n_chunks)
    xq = max(w_chunk, num_bins)

    den = jnp.maximum(den_ref[:], 1e-20)
    m_all = m_ref[:]

    qprojs, gprojs = [], []
    go = []
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        go.append(jnp.sum(g_ref[:, sl] * o_ref[:, sl], axis=-1,
                          keepdims=True))
        if use_rpe:
            rowq, rowg = [], []
            for a in range(3):
                qp = jax.lax.dot_general(
                    q_ref[:, sl], tq_ref[a][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=mm_prec)
                rowq.append(jnp.pad(qp, ((0, 0), (0, xq - num_bins))))
                if use_rel_value:
                    gp = jax.lax.dot_general(
                        g_ref[:, sl], tv_ref[a][:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    rowg.append(jnp.pad(gp, ((0, 0), (0, xq - num_bins))))
            qprojs.append(rowq)
            gprojs.append(rowg)

    def chunk_body(c, dq_run):
        c0 = pl.multiple_of(c * w_chunk, w_chunk)
        kc = kb_ref[pl.ds(c0, w_chunk)]
        vc = vb_ref[pl.ds(c0, w_chunk)]
        xc = xb_ref[pl.ds(c0, w_chunk)]
        skc = skb_ref[pl.ds(c0, w_chunk)]
        vmc = xc[:, 3:4]
        sk_b = jnp.transpose(skc[:, 0:1], (1, 0))

        pos = (base + c0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_chunk), 1))
        in_seg = (pos >= ks) & (pos < ke)
        mask = in_seg & (sk_b != skq) & (val_t > 0) & (
            jnp.transpose(vmc, (1, 0)) > 0)
        maskf = mask.astype(jnp.float32)

        ridxs, ridxs_tp, onehots = [], [], []
        xk = max(tile, num_bins)
        if use_rpe:
            ridxs, ridxs_tp, onehots = rel_bins_chunk(
                x_t, xc, tile=tile, w_chunk=w_chunk, num_bins=num_bins,
                bin_lo=0, num_bins_full=num_bins,
                window_size=window_size, quant_size=quant_size,
                xq=xq, xk=xk, with_onehot=True)

        dq_parts = []
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[:, sl]
            g_h = g_ref[:, sl]
            k_h = kc[:, sl]
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            gv = jax.lax.dot_general(
                g_h, vc[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)

            if use_rpe:
                for a in range(3):
                    logits += jnp.take_along_axis(
                        qprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]
                    kproj = jax.lax.dot_general(
                        k_h, tk_ref[a][:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    kproj = jnp.pad(kproj, ((0, 0), (0, xk - num_bins)))
                    bk = jnp.take_along_axis(
                        kproj, ridxs_tp[a], axis=1)[:, :tile]
                    logits += jnp.transpose(bk, (1, 0))
                    if use_rel_value:
                        gv += jnp.take_along_axis(
                            gprojs[i][a], ridxs[a], axis=1)[:, :w_chunk]

            m_h = m_all[:, i:i + 1]
            # mask BEFORE exp: a masked slot's raw logit can exceed the
            # valid row max, and exp overflow * maskf(0) would give NaN
            logits = jnp.where(mask, logits, NEG_INF)
            r = jnp.exp(logits - m_h) * maskf / den[:, i:i + 1]
            dl = r * (gv - go[i])

            dq_h = jax.lax.dot_general(
                dl, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            dk_h = jax.lax.dot_general(
                dl, q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)
            dv_h = jax.lax.dot_general(
                r, g_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mm_prec)

            if use_rpe:
                for a in range(3):
                    oh = onehots[a]
                    dmq = jnp.sum(oh * dl[:, None, :], axis=-1)
                    dq_h += jax.lax.dot_general(
                        dmq, tq_ref[a][:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    dmk = jnp.sum(oh * dl[:, None, :], axis=0)
                    dk_h += jax.lax.dot_general(
                        jnp.transpose(dmk, (1, 0)), tk_ref[a][:, sl],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)
                    dtq_ref[pl.ds(a * num_bins, num_bins), sl] += (
                        jax.lax.dot_general(
                            dmq, q_h, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_prec))
                    dtk_ref[pl.ds(a * num_bins, num_bins), sl] += (
                        jax.lax.dot_general(
                            dmk, k_h, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mm_prec))
                    if use_rel_value:
                        mass_r = jnp.sum(oh * r[:, None, :], axis=-1)
                        dtv_ref[pl.ds(a * num_bins, num_bins), sl] += (
                            jax.lax.dot_general(
                                mass_r, g_h, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=mm_prec))

            dk_ref[pl.ds(c0, w_chunk), sl] += dk_h
            dv_ref[pl.ds(c0, w_chunk), sl] += dv_h
            dq_parts.append(dq_h)

        return dq_run + jnp.concatenate(dq_parts, axis=1)

    dq0 = jnp.zeros((tile, h * d), jnp.float32)
    dq_f = jax.lax.fori_loop(c_start, c_end, chunk_body, dq0)
    dq_ref[:] = dq_f


def sparse_band_attention_bwd(
    q, k, v, sb, g, o, m, den,
    table_q=None, table_k=None, table_v=None,
    *,
    window_size, quant_size, scale, s_band=128, tile=128, w_chunk=64,
    interpret=False, fast=False,
):
    """Backward of the sparse (far-key) half.

    q/k/v/g/o/m/den are in *small*-window-sorted order (m/den merged over
    both halves). Returns ``(dq, dk, dv, dtq, dtk, dtv)`` in small order.
    """
    n, h, d = q.shape
    assert n % tile == 0
    nt = n // tile
    a_sz = int(sb.sb_src.shape[0])
    ws_band = min(s_band, a_sz)
    if ws_band % w_chunk:
        w_chunk = ws_band
    use_rpe = table_q is not None
    use_rel_value = table_v is not None
    num_bins = table_q.shape[0] if use_rpe else 0

    hd = h * d
    hd_pad = ((hd + 127) // 128) * 128
    qf = (jnp.asarray(q, jnp.float32) * scale).reshape(n, hd)
    q_lw = qf[sb.lw_map]
    g_lw = jnp.asarray(g, jnp.float32).reshape(n, hd)[sb.lw_map]
    o_lw = jnp.asarray(o, jnp.float32).reshape(n, hd)[sb.lw_map]
    m_lw = jnp.asarray(m, jnp.float32)[sb.lw_map]
    den_lw = jnp.asarray(den, jnp.float32)[sb.lw_map]
    xq_in = jnp.concatenate([
        jnp.asarray(sb.xyz_lw, jnp.float32),
        jnp.asarray(sb.valid_lw, jnp.float32)[:, None],
    ], axis=1)
    xq_in = jnp.pad(xq_in, ((0, 0), (0, 128 - 4)))

    src = jnp.clip(sb.sb_src, 0, n - 1)
    okm = sb.sb_valid[:, None]
    k_flat = jnp.asarray(k, jnp.float32).reshape(n, hd)
    v_flat = jnp.asarray(v, jnp.float32).reshape(n, hd)
    kx = jnp.pad(jnp.where(okm, k_flat[src], 0.0),
                 ((0, 0), (0, hd_pad - hd)))
    vx = jnp.pad(jnp.where(okm, v_flat[src], 0.0),
                 ((0, 0), (0, hd_pad - hd)))
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
    bases = jnp.minimum(
        sb.sb_start.reshape(nt, tile)[:, 0], a_sz - ws_band
    ).astype(jnp.int32)
    bases = (bases // 16) * 16

    def pack(t):
        tt = jnp.asarray(t, jnp.float32)
        return jnp.transpose(tt, (3, 0, 1, 2)).reshape(3, num_bins, hd)

    dummy = jnp.zeros((1, 1, 1), jnp.float32)
    tq = pack(table_q) if use_rpe else dummy
    tk = pack(table_k) if use_rpe else dummy
    tv = pack(table_v) if use_rel_value else dummy
    lrows = max(3 * num_bins, 8)

    kernel = functools.partial(
        _sparse_bwd_kernel, tile=tile, s_band=ws_band, w_chunk=w_chunk,
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
            pl.BlockSpec((tile, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i, b: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i, b: (i, 0), memory_space=vmem),
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
            pl.BlockSpec((ws_band, hd_pad), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((ws_band, hd_pad), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((lrows, hd), lambda i, b: (i, 0),
                         memory_space=vmem),
        ],
        scratch_shapes=[
            pltpu.VMEM((ws_band, hd_pad), jnp.float32),
            pltpu.VMEM((ws_band, hd_pad), jnp.float32),
            pltpu.VMEM((ws_band, 128), jnp.float32),
            pltpu.VMEM((ws_band, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    dq_lw, dkw, dvw, dtqw, dtkw, dtvw = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * ws_band, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt * ws_band, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
            jax.ShapeDtypeStruct((nt * lrows, hd), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_MB * 1024 * 1024,
            disable_bounds_checks=_DISABLE_BOUNDS),
        interpret=interpret,
    )(bases, q_lw, g_lw, o_lw, m_lw, den_lw, ks, ke, skq, xq_in,
      kx, vx, xx, skx, tq, tk, tv)

    # dq: lw -> small order, undo pre-scale
    dq = (dq_lw[sb.lw_unmap] * scale).reshape(n, h, d)

    # dk/dv: per-tile aux windows -> aux slots (scatter-add over the nt
    # overlapping windows) -> small-sorted points (VJP of the sb_src gather)
    rows = (bases[:, None] +
            jnp.arange(ws_band, dtype=jnp.int32)[None, :]).reshape(-1)
    dk_aux = jnp.zeros((a_sz, hd), jnp.float32).at[rows].add(
        dkw[:, :hd], mode="drop")
    dv_aux = jnp.zeros((a_sz, hd), jnp.float32).at[rows].add(
        dvw[:, :hd], mode="drop")
    okf = okm.astype(jnp.float32)
    dk = jnp.zeros((n, hd), jnp.float32).at[src].add(
        dk_aux * okf, mode="drop").reshape(n, h, d)
    dv = jnp.zeros((n, hd), jnp.float32).at[src].add(
        dv_aux * okf, mode="drop").reshape(n, h, d)

    def table_sum(tw):
        if not use_rpe:
            return None
        t = tw.reshape(nt, lrows, hd)[:, :3 * num_bins]
        t = jnp.sum(t, axis=0).reshape(3, num_bins, h, d)
        return jnp.transpose(t, (1, 2, 3, 0))
    dtq = table_sum(dtqw)
    dtk = table_sum(dtkw)
    dtv = table_sum(dtvw) if use_rel_value else None
    return dq, dk, dv, dtq, dtk, dtv
