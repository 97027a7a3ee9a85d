"""Stratified window attention — fused, static-shape, TPU-first.

Reference computation chain (``model/stratified_transformer.py:164-217``):
  1. ``attention_step1_v2``: per-pair QK^T over ragged CSR pairs
     (``lib/pointops2/src/attention_v2/attention_cuda_kernel_v2.cu:8-50``);
  2. ``dot_prod_with_idx_v3``: contextual RPE bias
     ``q . T_q[ridx] + k . T_k[ridx]`` summed over the 3 quantized axes
     (``relative_pos_encoding_cuda_kernel_v2.cu:248-283``);
  3. ``scatter_softmax`` over pairs grouped by query;
  4. ``attention_step2_with_rel_pos_value_v2``:
     ``out_q = sum_j p_qj * (v_j + sum_a T_v[ridx_a])``
     (``relative_pos_encoding_cuda_kernel_v2.cu:397-438``).

Here the whole chain is ONE op with two key sets per query and a joint
softmax:
  * dense keys — the query's (small) window, which after sorting by window
    key is the contiguous range ``[seg_start, seg_end)``; evaluated over a
    fixed-width band of the sorted order (block-diagonal masked attention,
    MXU-shaped batched matmuls);
  * sparse keys — a fixed-capacity gathered list (the FPS-downsampled points
    of the query's large window, excluding its own small window; see
    ``ops.windows.sparse_key_table``).

`pair_attention_reference` is the numerical oracle: explicit (padded) pair
lists evaluated exactly like the CUDA chain, used by the test-suite the same
way the reference uses its v1-vs-v2 scripts
(``lib/pointops2/functions/test_attention_op_step1_v2.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float(-1e30)  # python float: no backend init at import (multi-host)


def relative_position_index(rel, window_size, quant_size, num_bins):
    """Quantized relative-position bin per axis.

    Mirrors ``model/stratified_transformer.py:186-190``: round coordinates to
    1e-5, then ``floor((rel + 2*window - 1e-4) / quant)``; valid range is
    ``[0, 2*quant_grid_length)``.
    """
    # Division-free: fp32 divide is lowered DIFFERENTLY by Mosaic vs XLA
    # on TPU (reciprocal-refinement sequences differ), flipping bins at
    # exact quantization boundaries between the fused kernels and this
    # path. Multiply/add are correctly rounded everywhere, so using the
    # same reciprocal constants as ops/pallas/common.rel_bins_chunk makes
    # every backend and kernel agree bit-exactly (tools/bin_math_probe.py).
    rel = jnp.round(rel.astype(jnp.float32) * 1e5) * jnp.float32(1e-5)
    ridx = jnp.floor((rel + jnp.float32(2.0 * window_size - 1e-4))
                     * jnp.float32(1.0 / float(quant_size)))
    return jnp.clip(ridx, 0, num_bins - 1).astype(jnp.int32)


def swin_relative_position_index(rel_quant, num_bins):
    """Swin3D's window-quantized relative bin per axis.

    The caller pre-quantizes each point's in-window position
    ``u = floor(((xyz - xyz.min(0) + shift) % window) / quant)`` (reference
    ``model/swin3d_transformer.py:151-154``) and passes ``rel_quant =
    u_i - u_j`` (integer-valued float); the bin is ``rel + qgl - 1``
    (``map_func``, :129-130) with ``num_bins = 2*qgl - 1`` table rows
    (:110-118). Exact: the subtraction of small integers is exact in fp32.
    """
    qgl = (num_bins + 1) // 2
    ridx = jnp.round(rel_quant).astype(jnp.int32) + (qgl - 1)
    return jnp.clip(ridx, 0, num_bins - 1)


def _rel_index(rel, window_size, quant_size, num_bins, rpe_mode):
    if rpe_mode == "swin_window":
        return swin_relative_position_index(rel, num_bins)
    return relative_position_index(rel, window_size, quant_size, num_bins)


def _prec(name):
    return (jax.lax.Precision.HIGHEST if name == "highest"
            else jax.lax.Precision.DEFAULT)


def _remat(fn, mode):
    """Rematerialisation policy for the per-tile attention bodies.

    "full": recompute everything in backward (min memory — the default);
    "save_p": store the softmax probabilities / online-softmax stats and
      recompute only the cheap elementwise work (one-hots, masks) — the
      backward then skips the QK / bias matmul recompute entirely at
      ~[T,h,W] fp32 per tile of extra HBM;
    "none": no remat (scan saves every intermediate incl. one-hots —
      only viable at small N).
    """
    if mode == "none":
        return fn
    if mode == "save_p":
        policy = jax.checkpoint_policies.save_only_these_names(
            "attn_p", "attn_stat")
        return jax.checkpoint(fn, policy=policy)
    return jax.checkpoint(fn)


def _named(x, name):
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(x, name)


def pack_table3(t):
    """``[L, h, d, 3] -> [3L, h, d]`` — axis ``a``'s rows at ``a*L + l``.

    Packing the 3 quantized axes into one table lets every cRPE bias /
    mass term run as ONE contraction of length ``3L`` instead of three
    thin ``L`` ones (fewer, better-MXU-shaped matmuls; identical math —
    the sum over axes becomes part of the contraction).
    """
    l, h, d, _ = t.shape
    return jnp.transpose(t, (3, 0, 1, 2)).reshape(3 * l, h, d)


def packed_one_hot(ridx, num_bins, dtype=jnp.float32):
    """``[..., 3]`` int bins -> packed one-hot ``[..., 3*num_bins]``.

    Column ``a*num_bins + l`` is 1 where ``ridx[..., a] == l`` — the
    companion layout to `pack_table3`. bf16 entries are exact (0/1).
    """
    bins = jnp.arange(num_bins, dtype=jnp.int32)
    oh = (ridx[..., None] == bins).astype(dtype)       # [..., 3, L]
    return oh.reshape(*ridx.shape[:-1], 3 * num_bins)


def _table_bias_from_proj(proj, ridx):
    """``out[..., j] = sum_a proj[..., ridx[..., j, a], a]``.

    proj: ``[T, h, L, 3]`` (q or k projected onto every table row);
    ridx: ``[T, J, 3]``  ->  ``[T, h, J]``.
    """
    g = jnp.take_along_axis(proj, ridx[:, None, :, :], axis=2)  # [T,h,J,3]
    return jnp.sum(g, axis=-1)


def pair_attention_reference(
    q,
    k,
    v,
    xyz,
    pair_i,
    pair_j,
    pair_mask,
    *,
    window_size,
    quant_size,
    scale,
    table_q=None,
    table_k=None,
    table_v=None,
    rpe_mode="stratified",
):
    """Oracle: reference math over explicit pair lists.

    Args:
      q/k/v: ``[N, h, d]`` float; xyz: ``[N, 3]``.
      pair_i/pair_j: ``[M]`` int32 query/key point indices (padded).
      pair_mask: ``[M]`` bool.
      table_*: optional ``[2L, h, d, 3]`` cRPE tables.

    Returns:
      ``[N, h, d]`` float32 attention output (zeros for queries w/o pairs).
    """
    n = q.shape[0]
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    pi = jnp.clip(pair_i, 0, n - 1)
    pj = jnp.clip(pair_j, 0, n - 1)
    logits = jnp.einsum("mhd,mhd->mh", qf[pi], kf[pj],
                        precision=jax.lax.Precision.HIGHEST)

    num_bins = None
    if table_q is not None or table_k is not None or table_v is not None:
        t = table_q if table_q is not None else (
            table_k if table_k is not None else table_v)
        num_bins = t.shape[0]
        rel = xyz[pi] - xyz[pj]
        ridx = _rel_index(rel, window_size, quant_size, num_bins, rpe_mode)
    if table_q is not None:
        # bias_q[m,h] = sum_a q_i . T_q[ridx_a, h, :, a]
        tq = table_q.astype(jnp.float32)
        for a in range(3):
            logits += jnp.einsum(
                "mhd,mhd->mh", qf[pi], tq[ridx[:, a], :, :, a],
                precision=jax.lax.Precision.HIGHEST)
    if table_k is not None:
        tk = table_k.astype(jnp.float32)
        for a in range(3):
            logits += jnp.einsum(
                "mhd,mhd->mh", kf[pj], tk[ridx[:, a], :, :, a],
                precision=jax.lax.Precision.HIGHEST)

    logits = jnp.where(pair_mask[:, None], logits, NEG_INF)
    seg_i = jnp.where(pair_mask, pi, n)
    mx = jax.ops.segment_max(logits, seg_i, num_segments=n + 1)[:n]
    mx = jnp.maximum(mx, NEG_INF)
    p = jnp.where(pair_mask[:, None], jnp.exp(logits - mx[pi]), 0.0)
    denom = jax.ops.segment_sum(p, seg_i, num_segments=n + 1)[:n]

    vals = vf[pj]
    if table_v is not None:
        tv = table_v.astype(jnp.float32)
        for a in range(3):
            vals = vals + tv[ridx[:, a], :, :, a]
    out = jax.ops.segment_sum(
        p[:, :, None] * vals, seg_i, num_segments=n + 1
    )[:n]
    denom = jnp.maximum(denom, 1e-20)
    return out / denom[:, :, None]


def merge_triples(parts):
    """Compose online-softmax triples ``[(acc, m, den), ...]`` into the
    normalised attention output ``acc_total / den_total``."""
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


def sparse_band_triple(
    q,
    k,
    v,
    xyz_sorted,
    sb,
    table_q=None,
    table_k=None,
    table_v=None,
    *,
    window_size,
    quant_size,
    scale,
    s_band=256,
    tile=128,
    tile_batch=16,
    rpe_precision="highest",
    qk_precision="highest",
    remat="full",
):
    """Stratified far-key attention over the band-structured aux layout.

    (No ``rpe_mode`` parameter: far keys exist only in stratified mode —
    ``swin_window`` RPE is window-dense by construction.)

    Args:
      q/k/v: ``[N, h, d]`` in *small*-window-sorted order.
      xyz_sorted: ``[N, 3]`` small-sorted coordinates.
      sb: `ops.plan.SparseBandLayout`.
      s_band: static aux window width per query tile; a tile's key
        segments span ``~tile/downsample + #windows`` aux slots, so 256
        covers a 128-query tile with wide margin (overflow keys are
        dropped — capacity capping, reference precedent
        ``util/voxelize.py:38-42``).

    Returns:
      Unnormalised online-softmax triple ``(acc [N,h,d], m [N,h],
      den [N,h])`` in small-sorted order.
    """
    n, h, d = q.shape
    assert n % tile == 0, (n, tile)
    nt = n // tile
    a_sz = sb.sb_src.shape[0]
    ws_band = min(s_band, a_sz)

    qf = jnp.asarray(q, jnp.float32) * scale
    kf = jnp.asarray(k, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)

    # queries to lw order ([N]-index row gathers — cheap)
    q_lw = qf[sb.lw_map]
    x_lw = jnp.asarray(sb.xyz_lw, jnp.float32)
    val_lw = sb.valid_lw
    skey_lw = sb.q_skey_lw

    # aux key/value arrays (one [A]-index gather per block)
    src = jnp.clip(sb.sb_src, 0, n - 1)
    k_aux = jnp.where(sb.sb_valid[:, None, None], kf[src], 0.0)
    v_aux = jnp.where(sb.sb_valid[:, None, None], vf[src], 0.0)
    x_aux = jnp.asarray(sb.sb_xyz, jnp.float32)

    use_rpe = table_q is not None or table_k is not None or table_v is not None
    num_bins = 0
    if use_rpe:
        t = table_q if table_q is not None else (
            table_k if table_k is not None else table_v)
        num_bins = t.shape[0]
    tqf = None if table_q is None else table_q.astype(jnp.float32)
    tkf = None if table_k is None else table_k.astype(jnp.float32)
    tvf = None if table_v is None else table_v.astype(jnp.float32)
    rpe_prec = _prec(rpe_precision)
    qk_prec = _prec(qk_precision)
    oh_dtype = jnp.float32 if rpe_precision == "highest" else jnp.bfloat16

    def tile_body(t_idx):
        t0 = t_idx * tile
        q_t = jax.lax.dynamic_slice_in_dim(q_lw, t0, tile)        # [T,h,d]
        x_t = jax.lax.dynamic_slice_in_dim(x_lw, t0, tile)
        val_t = jax.lax.dynamic_slice_in_dim(val_lw, t0, tile)
        sk_t = jax.lax.dynamic_slice_in_dim(skey_lw, t0, tile)
        ks_t = jax.lax.dynamic_slice_in_dim(sb.sb_start, t0, tile)
        ke_t = jax.lax.dynamic_slice_in_dim(sb.sb_end, t0, tile)

        # key segments advance monotonically in lw order: one contiguous
        # aux window covers the whole tile. The base is 16-aligned to match
        # the Pallas kernel exactly (Mosaic requires aligned dynamic DMA
        # offsets): both paths then truncate identical overflow keys when a
        # tile's span exceeds s_band (capacity capping; see
        # `tools/sparse_bench.py --spans` for the operating-point stats).
        base = (jnp.minimum(ks_t[0], a_sz - ws_band) // 16) * 16
        k_b = jax.lax.dynamic_slice_in_dim(k_aux, base, ws_band)  # [S,h,d]
        v_b = jax.lax.dynamic_slice_in_dim(v_aux, base, ws_band)
        x_b = jax.lax.dynamic_slice_in_dim(x_aux, base, ws_band)
        sk_b = jax.lax.dynamic_slice_in_dim(sb.sb_skey, base, ws_band)
        pos_b = base + jnp.arange(ws_band, dtype=jnp.int32)       # [S]

        in_seg = (pos_b[None, :] >= ks_t[:, None]) & (
            pos_b[None, :] < ke_t[:, None])
        # exclude keys in the query's own small window (mask_mat_prev)
        not_same = sk_b[None, :] != sk_t[:, None]
        mask = in_seg & not_same & val_t[:, None]                 # [T,S]

        logits = jnp.einsum(
            "thd,whd->thw", q_t, k_b,
            preferred_element_type=jnp.float32,
            precision=qk_prec)

        ohs = None
        if use_rpe:
            rel = x_t[:, None, :] - x_b[None, :, :]               # [T,S,3]
            ridx = relative_position_index(
                rel, window_size, quant_size, num_bins)
            bins = jnp.arange(num_bins, dtype=jnp.int32)
            ohs = [(ridx[:, :, a, None] == bins).astype(oh_dtype)
                   for a in range(3)]
            for a in range(3):
                if tqf is not None:
                    qproj_a = jnp.einsum(
                        "thd,lhd->thl", q_t, tqf[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    logits += jnp.einsum(
                        "thl,twl->thw", qproj_a, ohs[a],
                        preferred_element_type=jnp.float32,
                        precision=rpe_prec)
                if tkf is not None:
                    kproj_a = jnp.einsum(
                        "whd,lhd->whl", k_b, tkf[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    logits += jnp.einsum(
                        "twl,whl->thw", ohs[a], kproj_a,
                        preferred_element_type=jnp.float32,
                        precision=rpe_prec)

        logits = jnp.where(mask[:, None, :], logits, NEG_INF)
        m = jnp.max(logits, axis=-1)
        m = _named(jnp.maximum(m, NEG_INF), "attn_stat")
        p = jnp.where(mask[:, None, :], jnp.exp(logits - m[:, :, None]), 0.0)
        p = _named(p, "attn_p")
        den = _named(jnp.sum(p, axis=-1), "attn_stat")
        acc = jnp.einsum(
            "thw,whd->thd", p, v_b,
            preferred_element_type=jnp.float32,
            precision=qk_prec)
        if tvf is not None:
            for a in range(3):
                mass = jnp.einsum("thw,twl->thl", p, ohs[a],
                                  precision=rpe_prec)
                acc += jnp.einsum("thl,lhd->thd", mass, tvf[:, :, :, a],
                                  precision=jax.lax.Precision.HIGHEST)
        return acc, m, den

    acc, m, den = jax.lax.map(
        _remat(tile_body, remat), jnp.arange(nt, dtype=jnp.int32),
        batch_size=min(tile_batch, nt) if tile_batch else None)
    acc = acc.reshape(n, h, d)
    m = m.reshape(n, h)
    den = den.reshape(n, h)
    # back to small-sorted order
    u = sb.lw_unmap
    return acc[u], m[u], den[u]


def stratified_attention(
    q,
    k,
    v,
    xyz,
    seg_start,
    seg_end,
    valid,
    sparse_idx=None,
    sparse_mask=None,
    table_q=None,
    table_k=None,
    table_v=None,
    *,
    window_size,
    quant_size,
    scale,
    band,
    tile=128,
    tile_batch=16,
    rpe_precision="highest",
    qk_precision="highest",
    remat="full",
    sparse_band=None,
    s_band=256,
    rpe_mode="stratified",
):
    """Fused banded + sparse window attention (production jnp path).

    Everything is computed per query-tile of ``tile`` sorted points; the
    dense key set is the band ``[tile_start - band, tile_end + band)`` of the
    sorted order, masked to each query's own segment; the sparse key set is
    gathered by ``sparse_idx``. One online softmax spans both.

    Args:
      q/k/v: ``[N, h, d]`` in window-sorted order; ``N % tile == 0``.
      xyz: ``[N, 3]`` sorted coordinates.
      seg_start/seg_end: ``[N]`` int32 segment bounds (sorted positions).
      valid: ``[N]`` bool.
      sparse_idx: optional ``[N, S]`` int32 sorted-space indices (-1 empty).
      sparse_mask: optional ``[N, S]`` bool.
      table_*: optional ``[2L, h, d, 3]`` cRPE tables.
      band: static one-sided band width; windows larger than the band are
        truncated (capacity capping — reference precedent
        ``util/voxelize.py:38-42``).
      tile: static query tile (multiple of 8; 128 aligns with the MXU).
      tile_batch: tiles processed per ``lax.map`` step (chunked vmap) —
        larger = better MXU batching, more transient memory.
      rpe_precision: "highest" (fp32, reference-exact) or "default"
        (bf16 MXU passes + bf16 one-hot materialisation — entries are
        exact in bf16; only the table projections round, ~0.4% relative
        on the bias term).
      qk_precision: "highest" (fp32, reference-exact — the reference
        forces fp32 attention math under AMP) or "default" (bf16 MXU
        passes, 1 pass vs 6) for the QK^T and PV contractions.

    Returns:
      ``[N, h, d]`` float32.
    """
    n, h, d = q.shape
    assert n % tile == 0, (n, tile)
    if rpe_mode == "swin_window":
        # Swin3D has no stratified sparse half; its quantized coords are
        # only defined within a window (reference swin3d_transformer.py)
        assert sparse_idx is None and sparse_band is None, \
            "swin_window RPE is window-dense only"
    nt = n // tile
    w = tile + 2 * band

    qf = jnp.asarray(q, jnp.float32) * scale
    kf = jnp.asarray(k, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)
    xf = jnp.asarray(xyz, jnp.float32)
    seg_start = jnp.asarray(seg_start)
    seg_end = jnp.asarray(seg_end)
    valid = jnp.asarray(valid)
    if sparse_idx is not None:
        sparse_idx = jnp.asarray(sparse_idx)
        sparse_mask = jnp.asarray(sparse_mask)

    kx = jnp.pad(kf, ((band, band), (0, 0), (0, 0)))
    vx = jnp.pad(vf, ((band, band), (0, 0), (0, 0)))
    xx = jnp.pad(xf, ((band, band), (0, 0)))
    validx = jnp.pad(valid, (band, band))

    use_rpe = table_q is not None or table_k is not None or table_v is not None
    num_bins = 0
    if use_rpe:
        t = table_q if table_q is not None else (
            table_k if table_k is not None else table_v)
        num_bins = t.shape[0]
    tqf = None if table_q is None else table_q.astype(jnp.float32)
    tkf = None if table_k is None else table_k.astype(jnp.float32)
    tvf = None if table_v is None else table_v.astype(jnp.float32)

    use_sparse = sparse_idx is not None
    s_cap = 0 if not use_sparse else sparse_idx.shape[1]
    rpe_prec = _prec(rpe_precision)
    qk_prec = _prec(qk_precision)
    oh_dtype = jnp.float32 if rpe_precision == "highest" else jnp.bfloat16

    # Dense (band) pairs live in the same small window, so per-axis
    # |rel| < window  =>  ridx in (qgl/2, 3*qgl/2) where qgl = num_bins/2
    # (bins cover +-2*window for the sparse large-window pairs). The band
    # half therefore only needs the middle ~qgl+2 table rows — out-of-range
    # pairs are exactly the masked ones, so clipping to the slice is exact.
    # NOTE: per-axis one-hot loops beat a 3-axis packed contraction here
    # (measured 884 vs 1076 ms/step at N=40960) — XLA fuses the small
    # per-axis compare+matmul chains better than one wide materialised
    # one-hot.
    tqb = tkb = tvb = None
    b0 = 0
    nb_band = num_bins
    if use_rpe and rpe_mode == "swin_window":
        # swin-window bins already span exactly the in-window range
        # (2*qgl-1 rows) -- no band slice applies
        tqb, tkb, tvb = tqf, tkf, tvf
    elif use_rpe:
        qgl = num_bins // 2
        b0 = max(qgl // 2 - 1, 0)
        b1 = min(num_bins, (3 * qgl + 1) // 2 + 2)
        nb_band = b1 - b0
        tqb = None if tqf is None else tqf[b0:b1]
        tkb = None if tkf is None else tkf[b0:b1]
        tvb = None if tvf is None else tvf[b0:b1]

    def tile_body(t_idx):
        t0 = t_idx * tile
        q_t = jax.lax.dynamic_slice_in_dim(qf, t0, tile)          # [T,h,d]
        x_t = jax.lax.dynamic_slice_in_dim(xf, t0, tile)          # [T,3]
        ss_t = jax.lax.dynamic_slice_in_dim(seg_start, t0, tile)
        se_t = jax.lax.dynamic_slice_in_dim(seg_end, t0, tile)
        val_t = jax.lax.dynamic_slice_in_dim(valid, t0, tile)

        k_b = jax.lax.dynamic_slice_in_dim(kx, t0, w)             # [W,h,d]
        v_b = jax.lax.dynamic_slice_in_dim(vx, t0, w)
        x_b = jax.lax.dynamic_slice_in_dim(xx, t0, w)
        val_b = jax.lax.dynamic_slice_in_dim(validx, t0, w)
        pos_b = t0 - band + jnp.arange(w, dtype=jnp.int32)        # [W]

        logits_b = jnp.einsum(
            "thd,whd->thw", q_t, k_b, preferred_element_type=jnp.float32,
            precision=qk_prec)
        in_seg = (pos_b[None, :] >= ss_t[:, None]) & (
            pos_b[None, :] < se_t[:, None]
        )
        mask_b = in_seg & val_t[:, None] & val_b[None, :]         # [T,W]

        # cRPE biases via one-hot matmuls — TPU-friendly (pure MXU work, no
        # gathers; gathers lower to scalar loops on TPU and are ~50x slower).
        ohs_b = None
        if use_rpe:
            rel_b = x_t[:, None, :] - x_b[None, :, :]             # [T,W,3]
            ridx_b = _rel_index(
                rel_b, window_size, quant_size, num_bins, rpe_mode)
            # shift into the band slice (exact for in-window pairs)
            ridx_b = jnp.clip(ridx_b - b0, 0, nb_band - 1)
            bins = jnp.arange(nb_band, dtype=jnp.int32)
            ohs_b = [(ridx_b[:, :, a, None] == bins).astype(oh_dtype)
                     for a in range(3)]                           # [T,W,Lb]x3
            for a in range(3):
                if tqb is not None:
                    qproj_a = jnp.einsum(
                        "thd,lhd->thl", q_t, tqb[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    logits_b += jnp.einsum(
                        "thl,twl->thw", qproj_a, ohs_b[a],
                        preferred_element_type=jnp.float32,
                        precision=rpe_prec)
                if tkb is not None:
                    kproj_a = jnp.einsum(
                        "whd,lhd->whl", k_b, tkb[:, :, :, a],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    logits_b += jnp.einsum(
                        "twl,whl->thw", ohs_b[a], kproj_a,
                        preferred_element_type=jnp.float32,
                        precision=rpe_prec)

        logits_b = jnp.where(mask_b[:, None, :], logits_b, NEG_INF)

        if use_sparse:
            si_t = jax.lax.dynamic_slice_in_dim(sparse_idx, t0, tile)  # [T,S]
            sm_t = jax.lax.dynamic_slice_in_dim(sparse_mask, t0, tile)
            sg = jnp.clip(si_t, 0, n - 1)
            k_s = kf[sg]                                           # [T,S,h,d]
            v_s = vf[sg]
            x_s = xf[sg]
            sm_t = sm_t & (si_t >= 0) & val_t[:, None]
            logits_s = jnp.einsum(
                "thd,tshd->ths", q_t, k_s,
                preferred_element_type=jnp.float32, precision=qk_prec)
            oh_s = None
            if use_rpe:
                rel_s = x_t[:, None, :] - x_s                      # [T,S,3]
                ridx_s = _rel_index(
                    rel_s, window_size, quant_size, num_bins, rpe_mode)
                bins = jnp.arange(num_bins, dtype=jnp.int32)
                oh_s = [
                    (ridx_s[:, :, a, None] == bins).astype(oh_dtype)
                    for a in range(3)
                ]                                                  # [T,S,L] x3
                for a in range(3):
                    if tqf is not None:
                        qproj_a = jnp.einsum(
                            "thd,lhd->thl", q_t, tqf[:, :, :, a],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        logits_s += jnp.einsum(
                            "thl,tsl->ths", qproj_a, oh_s[a],
                            preferred_element_type=jnp.float32,
                            precision=rpe_prec)
                    if tkf is not None:
                        # bias_k[t,s] = sum_l oh[t,s,l] * (k_s[t,s] . Tk[l])
                        kp = jnp.einsum(
                            "tshd,lhd->tshl", k_s, tkf[:, :, :, a],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        logits_s += jnp.einsum(
                            "tshl,tsl->ths", kp, oh_s[a],
                            precision=rpe_prec)
            logits_s = jnp.where(sm_t[:, None, :], logits_s, NEG_INF)
            mx = jnp.maximum(
                jnp.max(logits_b, axis=-1), jnp.max(logits_s, axis=-1)
            )                                                      # [T,h]
        else:
            mx = jnp.max(logits_b, axis=-1)

        mx = _named(jnp.maximum(mx, NEG_INF), "attn_stat")
        p_b = jnp.where(
            mask_b[:, None, :], jnp.exp(logits_b - mx[:, :, None]), 0.0
        )
        p_b = _named(p_b, "attn_p")
        denom = jnp.sum(p_b, axis=-1)                              # [T,h]
        out = jnp.einsum(
            "thw,whd->thd", p_b, v_b, preferred_element_type=jnp.float32,
            precision=qk_prec)
        if tvb is not None:
            # Probability-mass-per-bin trick: out += sum_l mass[t,h,l,a]*Tv[l]
            for a in range(3):
                mass = jnp.einsum("thw,twl->thl", p_b, ohs_b[a],
                                  precision=rpe_prec)
                out += jnp.einsum("thl,lhd->thd", mass, tvb[:, :, :, a],
                                  precision=jax.lax.Precision.HIGHEST)

        if use_sparse:
            p_s = _named(jnp.where(
                sm_t[:, None, :], jnp.exp(logits_s - mx[:, :, None]), 0.0
            ), "attn_p")
            denom += jnp.sum(p_s, axis=-1)
            out += jnp.einsum(
                "ths,tshd->thd", p_s, v_s,
                preferred_element_type=jnp.float32,
                precision=qk_prec)
            if tvf is not None:
                for a in range(3):
                    mass_s = jnp.einsum(
                        "ths,tsl->thl", p_s, oh_s[a],
                        precision=rpe_prec)
                    out += jnp.einsum(
                        "thl,lhd->thd", mass_s, tvf[:, :, :, a],
                        precision=jax.lax.Precision.HIGHEST)

        return out, mx, denom

    acc_t, m_t, den_t = jax.lax.map(
        _remat(tile_body, remat), jnp.arange(nt, dtype=jnp.int32),
        batch_size=min(tile_batch, nt) if tile_batch else None)
    parts = [(acc_t.reshape(n, h, d), m_t.reshape(n, h),
              den_t.reshape(n, h))]
    if sparse_band is not None:
        parts.append(sparse_band_triple(
            q, k, v, xyz, sparse_band,
            table_q=table_q, table_k=table_k, table_v=table_v,
            window_size=window_size, quant_size=quant_size, scale=scale,
            s_band=s_band, tile=tile, tile_batch=tile_batch,
            rpe_precision=rpe_precision, qk_precision=qk_precision,
            remat=remat))
    return merge_triples(parts)
