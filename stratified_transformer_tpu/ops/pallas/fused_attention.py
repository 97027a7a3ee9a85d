"""Fused banded window attention — Pallas TPU kernel.

Computes, per query tile of the window-sorted point array, the *dense* half
of the stratified attention (the band part of
``ops.attention.stratified_attention``) as one VMEM-resident flash-style
kernel: QK^T + contextual-RPE (query & key tables) -> online softmax ->
(V + value-table) accumulation. Replaces the four-kernel CUDA chain of the
reference (``attention_step1_v2`` / ``dot_prod_with_idx_v3`` /
``scatter_softmax`` / ``attention_step2_with_rel_pos_value_v2``,
``lib/pointops2/src``) for the in-window pairs.

cRPE gathers are reformulated as one-hot matmuls (MXU-friendly, no gather):
  bias_q[t,w]  = sum_a  (q_t . Tq[l, :, a]) @ onehot_l(ridx_a[t, w])
  bias_k[t,w]  = sum_a  (k_w . Tk[l, :, a]) @ onehot_l(ridx_a[t, w])
  value bias   = accumulate probability mass per (bin, axis), then one
                 [T, L] x [L, d] matmul per axis at tile end.

The kernel returns the *unnormalised* triple (acc, row_max, denom) so the
sparse (far-key) half — a small gathered computation left to XLA — can be
merged by standard online-softmax composition in
`ops.attention_fused.stratified_attention_fused`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _band_kernel(
    # inputs (VMEM unless noted)
    q_ref,        # [T, h, d]  (pre-scaled)
    x_ref,        # [T, 3]
    ss_ref,       # [T, 1] int32 seg_start
    se_ref,       # [T, 1] int32 seg_end
    val_ref,      # [T, 1] float32 validity
    kx_ref,       # [N + 2B, h, d]   (ANY/HBM)
    vx_ref,       # [N + 2B, h, d]   (ANY/HBM)
    xx_ref,       # [N + 2B, 3]      (ANY/HBM)
    vmx_ref,      # [N + 2B, 1] f32  (ANY/HBM)
    tq_ref,       # [L2, h, d, 3] or dummy [1,1,1,3]
    tk_ref,
    tv_ref,
    # outputs
    acc_ref,      # [T, h, d] unnormalised value accumulation
    m_ref,        # [T, h] running max
    den_ref,      # [T, h] running denom
    # scratch
    kb_ref,       # [W, h, d]
    vb_ref,       # [W, h, d]
    xb_ref,       # [W, 3]
    vb_mask_ref,  # [W, 1]
    sem,          # DMA sems (4,)
    *,
    tile,
    band,
    w_chunk,
    num_bins,
    window_size,
    quant_size,
    use_rpe,
    use_rel_value,
):
    t_idx = pl.program_id(0)
    t0 = t_idx * tile
    w = tile + 2 * band
    h = q_ref.shape[1]
    d = q_ref.shape[2]

    # ---- DMA the band into VMEM ----
    cp_k = pltpu.make_async_copy(
        kx_ref.at[pl.ds(t0, w)], kb_ref, sem.at[0])
    cp_v = pltpu.make_async_copy(
        vx_ref.at[pl.ds(t0, w)], vb_ref, sem.at[1])
    cp_x = pltpu.make_async_copy(
        xx_ref.at[pl.ds(t0, w)], xb_ref, sem.at[2])
    cp_m = pltpu.make_async_copy(
        vmx_ref.at[pl.ds(t0, w)], vb_mask_ref, sem.at[3])
    cp_k.start()
    cp_v.start()
    cp_x.start()
    cp_m.start()
    cp_k.wait()
    cp_v.wait()
    cp_x.wait()
    cp_m.wait()

    q = q_ref[:]                                   # [T,h,d] already scaled
    x_t = x_ref[:]
    ss = ss_ref[:]                                 # [T,1]
    se = se_ref[:]
    val_t = val_ref[:]                             # [T,1]

    qh = jnp.transpose(q, (1, 0, 2))               # [h,T,d]

    if use_rpe:
        # qproj[a]: [T, h, L2] for each axis; computed once per tile.
        tq = tq_ref[:]                             # [L2,h,d,3]
        tk = tk_ref[:]
        qproj = []
        for a in range(3):
            # [h,T,d] @ [h,d,L2] -> [h,T,L2]
            qp = jax.lax.dot_general(
                qh, jnp.transpose(tq[:, :, :, a], (1, 2, 0)),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            qproj.append(qp)                       # [h,T,L2]

    n_chunks = w // w_chunk

    def chunk_body(c, carry):
        m_run, den_run, acc_run, mass_run = carry
        c0 = c * w_chunk
        kc = kb_ref[pl.ds(c0, w_chunk)]            # [Wc,h,d]
        vc = vb_ref[pl.ds(c0, w_chunk)]
        xc = xb_ref[pl.ds(c0, w_chunk)]            # [Wc,3]
        vmc = vb_mask_ref[pl.ds(c0, w_chunk)]      # [Wc,1]

        kh = jnp.transpose(kc, (1, 2, 0))          # [h,d,Wc]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [h,T,Wc]

        # positions of the chunk in sorted space
        pos = (t0 - band + c0 + jax.lax.broadcasted_iota(
            jnp.int32, (1, w_chunk), 1))           # [1,Wc]
        in_seg = (pos >= ss) & (pos < se)          # [T,Wc]
        mask = in_seg & (val_t > 0) & (
            jnp.transpose(vmc, (1, 0)) > 0)        # [T,Wc]

        if use_rpe:
            rel = x_t[:, None, :] - xc[None, :, :]          # [T,Wc,3]
            rel = jnp.round(rel * 1e5) / 1e5
            ridx = jnp.floor(
                (rel + 2.0 * window_size - 1e-4) / quant_size)
            ridx = jnp.clip(ridx, 0, num_bins - 1).astype(jnp.int32)
            mass_new = []
            bins = jax.lax.broadcasted_iota(
                jnp.int32, (w_chunk, num_bins), 1)          # [Wc,L2]
            for a in range(3):
                onehot = (ridx[:, :, a, None] ==
                          bins[None, :, :]).astype(jnp.float32)  # [T,Wc,L2]
                # bias_q: [T? dot] qproj[a] [h,T,L2] x onehot [T,Wc,L2]
                #   batch T: -> [T,h,Wc]
                bq = jax.lax.dot_general(
                    jnp.transpose(qproj[a], (1, 0, 2)),     # [T,h,L2]
                    onehot, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # [T,h,Wc]
                logits += jnp.transpose(bq, (1, 0, 2))      # [h,T,Wc]
                # kproj chunk: [h,Wc,L2]
                kp = jax.lax.dot_general(
                    jnp.transpose(kc, (1, 0, 2)),           # [h,Wc,d]
                    jnp.transpose(tk[:, :, :, a], (1, 2, 0)),  # [h,d,L2]
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                # bias_k[t,w] = sum_l onehot[t,w,l] * kp[h,w,l]
                #   batch over w: onehot^T [Wc,T,L2] x kp^T [Wc,h,L2]
                bk = jax.lax.dot_general(
                    jnp.transpose(onehot, (1, 0, 2)),       # [Wc,T,L2]
                    jnp.transpose(kp, (1, 0, 2)),           # [Wc,h,L2]
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # [Wc,T,h]
                logits += jnp.transpose(bk, (2, 1, 0))      # [h,T,Wc]
                mass_new.append(onehot)

        logits = jnp.where(
            jnp.transpose(mask, (0, 1))[None, :, :], logits, NEG_INF)

        m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1))  # [h,T]
        rescale = jnp.exp(m_run - m_new)                       # [h,T]
        p = jnp.exp(logits - m_new[:, :, None])                # [h,T,Wc]
        p = jnp.where(jnp.transpose(mask, (0, 1))[None], p, 0.0)
        den_new = den_run * rescale + jnp.sum(p, axis=-1)
        # acc: [h,T,d] += p [h,T,Wc] @ v [h,Wc,d]
        pv = jax.lax.dot_general(
            p, jnp.transpose(vc, (1, 0, 2)),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_new = acc_run * rescale[:, :, None] + pv

        if use_rpe and use_rel_value:
            mass_upd = []
            for a in range(3):
                # [T? ] pmass[a]: [h,T,L2] += p [h,T,Wc] x onehot [T,Wc,L2]
                pm = jax.lax.dot_general(
                    jnp.transpose(p, (1, 0, 2)),            # [T,h,Wc]
                    mass_new[a], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # [T,h,L2]
                mass_upd.append(
                    mass_run[a] * jnp.transpose(
                        rescale, (1, 0))[:, :, None] + pm)
            mass_run = tuple(mass_upd)

        return (m_new, den_new, acc_new, mass_run)

    m0 = jnp.full((h, tile), NEG_INF, jnp.float32)
    den0 = jnp.zeros((h, tile), jnp.float32)
    acc0 = jnp.zeros((h, tile, d), jnp.float32)
    if use_rpe and use_rel_value:
        mass0 = tuple(
            jnp.zeros((tile, h, num_bins), jnp.float32) for _ in range(3))
    else:
        mass0 = tuple(jnp.zeros((1, 1, 1), jnp.float32) for _ in range(3))

    m_f, den_f, acc_f, mass_f = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (m0, den0, acc0, mass0))

    if use_rpe and use_rel_value:
        tv = tv_ref[:]
        for a in range(3):
            # [T,h,L2] x [L2,d] per head -> accumulate [h,T,d]
            contrib = jax.lax.dot_general(
                jnp.transpose(mass_f[a], (1, 0, 2)),        # [h,T,L2]
                jnp.transpose(tv[:, :, :, a], (1, 0, 2)),   # [h,L2,d]
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_f = acc_f + contrib

    acc_ref[:] = jnp.transpose(acc_f, (1, 0, 2))            # [T,h,d]
    m_ref[:] = jnp.transpose(m_f, (1, 0))
    den_ref[:] = jnp.transpose(den_f, (1, 0))


def band_attention(
    q, k, v, xyz, seg_start, seg_end, valid,
    table_q=None, table_k=None, table_v=None,
    *,
    window_size, quant_size, scale, band, tile=128, w_chunk=128,
    interpret=False,
):
    """Dense band half of the stratified attention.

    Args mirror ``ops.attention.stratified_attention`` (sorted order).
    Returns the online-softmax triple ``(acc [N,h,d], m [N,h],
    denom [N,h])`` with tile-local maxima, ready for composition with the
    sparse half.
    """
    n, h, d = q.shape
    assert n % tile == 0
    w = tile + 2 * band
    assert w % w_chunk == 0, (w, w_chunk)
    nt = n // tile

    use_rpe = table_q is not None
    use_rel_value = table_v is not None
    num_bins = table_q.shape[0] if use_rpe else 0

    qf = jnp.asarray(q, jnp.float32) * scale
    kx = jnp.pad(jnp.asarray(k, jnp.float32), ((band, band), (0, 0), (0, 0)))
    vx = jnp.pad(jnp.asarray(v, jnp.float32), ((band, band), (0, 0), (0, 0)))
    xx = jnp.pad(jnp.asarray(xyz, jnp.float32), ((band, band), (0, 0)))
    vmx = jnp.pad(
        jnp.asarray(valid, jnp.float32)[:, None], ((band, band), (0, 0)))
    ss = jnp.asarray(seg_start, jnp.int32)[:, None]
    se = jnp.asarray(seg_end, jnp.int32)[:, None]
    val = jnp.asarray(valid, jnp.float32)[:, None]

    dummy = jnp.zeros((1, 1, 1, 3), jnp.float32)
    tq = jnp.asarray(table_q, jnp.float32) if use_rpe else dummy
    tk = jnp.asarray(table_k, jnp.float32) if use_rpe else dummy
    tv = jnp.asarray(table_v, jnp.float32) if use_rel_value else dummy

    kernel = functools.partial(
        _band_kernel, tile=tile, band=band, w_chunk=w_chunk,
        num_bins=num_bins, window_size=float(window_size),
        quant_size=float(quant_size), use_rpe=use_rpe,
        use_rel_value=use_rel_value,
    )

    vmem = pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, h, d), lambda i: (i, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec(memory_space=pltpu.ANY),   # kx
            pl.BlockSpec(memory_space=pltpu.ANY),   # vx
            pl.BlockSpec(memory_space=pltpu.ANY),   # xx
            pl.BlockSpec(memory_space=pltpu.ANY),   # vmx
            pl.BlockSpec(memory_space=vmem),        # tq
            pl.BlockSpec(memory_space=vmem),        # tk
            pl.BlockSpec(memory_space=vmem),        # tv
        ],
        out_specs=[
            pl.BlockSpec((tile, h, d), lambda i: (i, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=vmem),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, h, d), jnp.float32),
            pltpu.VMEM((w, h, d), jnp.float32),
            pltpu.VMEM((w, 3), jnp.float32),
            pltpu.VMEM((w, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    acc, m, den = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, h, d), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(qf, jnp.asarray(xyz, jnp.float32), ss, se, val, kx, vx, xx, vmx,
      tq, tk, tv)
    return acc, m, den
