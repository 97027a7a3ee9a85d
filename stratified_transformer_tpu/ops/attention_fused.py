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
    sparse_band_attention,
)

NEG_INF = float(-1e30)  # python float: no backend init at import (multi-host)


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

    chunk = min(chunk, n)
    # Pad query rows to a chunk multiple (padding rows are invalid).
    pad = (-n) % chunk
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        xf_q = jnp.pad(xf, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        sparse_idx = jnp.pad(sparse_idx, ((0, pad), (0, 0)),
                             constant_values=-1)
        sparse_mask = jnp.pad(sparse_mask, ((0, pad), (0, 0)))
    else:
        xf_q = xf
    n_pad_rows = n + pad

    @jax.checkpoint
    def row_chunk(c0):
        qc = jax.lax.dynamic_slice_in_dim(qf, c0, chunk)
        xc = jax.lax.dynamic_slice_in_dim(xf_q, c0, chunk)
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

    if chunk == n_pad_rows:
        return row_chunk(jnp.int32(0))
    starts = jnp.arange(0, n_pad_rows, chunk, dtype=jnp.int32)
    acc, m, den = jax.lax.map(row_chunk, starts)
    return (acc.reshape(-1, h, d)[:n], m.reshape(-1, h)[:n],
            den.reshape(-1, h)[:n])


def _merge(parts):
    """Compose online-softmax triples: [(acc, m, den), ...] ->
    ``(normalised out, merged m, merged den)``."""
    m = functools.reduce(jnp.maximum, [p[1] for p in parts])
    m = jnp.maximum(m, NEG_INF)
    acc = 0.0
    den = 0.0
    for a, mi, di in parts:
        s = jnp.exp(mi - m)
        acc = acc + a * s[:, :, None]
        den = den + di * s
    dsafe = jnp.maximum(den, 1e-20)
    return acc / dsafe[:, :, None], m, den


def _hslice(x, sl):
    """Head-axis slice (axis 1) that passes None through."""
    return None if x is None else x[:, sl]


def _by_head_groups(h, group, call):
    """Run ``call(head_slice)`` per head group and concatenate each output
    along the head axis (axis 1); ``None`` outputs stay ``None``.

    Heads are fully independent in every band/sparse kernel (separate
    softmax per head), so splitting h into ceil(h/group) pallas_call's is
    EXACT — it only changes Mosaic program size. The per-head-unrolled
    kernels grow (and compile) superlinearly with h, which is what priced
    the fused path out of stages 2-3 (h=12/24, docs/PERF_NOTES.md
    "fused_stages=2"); head grouping caps the unroll factor instead.
    """
    if not group or group >= h:
        return call(slice(None))
    outs = [call(slice(g0, min(g0 + group, h)))
            for g0 in range(0, h, group)]
    return tuple(
        None if parts[0] is None else jnp.concatenate(parts, axis=1)
        for parts in zip(*outs))


def _fwd_impl(q, k, v, xyz, seg_start, seg_end, valid, sparse_idx,
              sparse_mask, table_q, table_k, table_v, *, window_size,
              quant_size, scale, band, tile, w_chunk, interpret,
              sparse_band=None, s_band=256, fast=False,
              head_group=0, debug_skip=()):
    """``debug_skip``: explicit kernel-bisection switch — any of
    {"band", "sparse"}. Only the debug tools pass it
    (tools/instability_ladder.py); the production path is env-independent.
    Skipping both halves is a caller error (nothing left to merge)."""
    skip_band = "band" in debug_skip
    skip_sparse = "sparse" in debug_skip
    assert not (skip_band and skip_sparse), (
        "debug_skip cannot drop both attention halves")
    h = q.shape[1]
    parts = [] if skip_band else [_by_head_groups(
        h, head_group, lambda sl: band_attention(
            q[:, sl], k[:, sl], v[:, sl], xyz, seg_start, seg_end, valid,
            _hslice(table_q, sl), _hslice(table_k, sl),
            _hslice(table_v, sl),
            window_size=window_size, quant_size=quant_size, scale=scale,
            band=band, tile=tile, w_chunk=w_chunk, interpret=interpret,
            fast=fast))]
    if skip_sparse:
        pass
    elif sparse_band is not None:
        parts.append(_by_head_groups(
            h, head_group, lambda sl: sparse_band_attention(
                q[:, sl], k[:, sl], v[:, sl], sparse_band,
                table_q=_hslice(table_q, sl),
                table_k=_hslice(table_k, sl),
                table_v=_hslice(table_v, sl),
                window_size=window_size, quant_size=quant_size,
                scale=scale, s_band=s_band, tile=tile,
                w_chunk=min(w_chunk, s_band),
                interpret=interpret, fast=fast)))
    elif sparse_idx is not None:
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
    interpret=False, sparse_band=None, s_band=256,
    rpe_precision="highest", qk_precision="highest", remat="full",
    bwd_impl="pallas", head_group=0,
):
    """Drop-in fused (Pallas) variant of
    ``ops.attention.stratified_attention``.

    ``qk_precision``/``rpe_precision`` "default" selects bf16 MXU passes in
    the Pallas forward (``fast`` mode) and in the jnp backward recompute.
    ``bwd_impl``: "pallas" (flash backward kernels) or "jnp" (VJP of the
    jnp reference path — recompute).
    """
    fast = qk_precision == "default" and rpe_precision == "default"
    kw = dict(window_size=window_size, quant_size=quant_size, scale=scale,
              band=band, tile=tile)
    # The Pallas backward re-composes per-tile dk/dv band buffers as
    # shifted diagonals, which needs band % tile == 0; it also only covers
    # the band(+sparse_band) layouts.
    pallas_bwd = (bwd_impl == "pallas" and band % tile == 0
                  and sparse_idx is None)
    if bwd_impl == "pallas" and not pallas_bwd:
        import warnings
        why = ("band %d %% tile %d != 0" % (band, tile)
               if band % tile else "gathered sparse_idx layout")
        warnings.warn(
            "stratified_attention_fused: Pallas backward requested but "
            "unavailable (%s); falling back to the jnp VJP (slower). "
            "Round band to a multiple of tile to enable it." % why,
            stacklevel=2)

    def reference(q, k, v, tq, tk, tv):
        return jnp_attn.stratified_attention(
            q, k, v, xyz, seg_start, seg_end, valid,
            sparse_idx=sparse_idx, sparse_mask=sparse_mask,
            table_q=tq, table_k=tk, table_v=tv,
            sparse_band=sparse_band, s_band=s_band,
            rpe_precision=rpe_precision, qk_precision=qk_precision,
            remat=remat, **kw)

    @jax.custom_vjp
    def f(q, k, v, tq, tk, tv):
        out, _, _ = _fwd_impl(
            q, k, v, xyz, seg_start, seg_end, valid, sparse_idx,
            sparse_mask, tq, tk, tv, **kw, w_chunk=w_chunk,
            interpret=interpret, sparse_band=sparse_band, s_band=s_band,
            fast=fast, head_group=head_group)
        return out

    def f_fwd(q, k, v, tq, tk, tv):
        out, m, den = _fwd_impl(
            q, k, v, xyz, seg_start, seg_end, valid, sparse_idx,
            sparse_mask, tq, tk, tv, **kw, w_chunk=w_chunk,
            interpret=interpret, sparse_band=sparse_band, s_band=s_band,
            fast=fast, head_group=head_group)
        res = ((q, k, v, tq, tk, tv, m, den, out) if pallas_bwd
               else (q, k, v, tq, tk, tv))
        return out, res

    def f_bwd(res, g):
        if not pallas_bwd:
            _, vjp = jax.vjp(reference, *res)
            return vjp(g)
        from stratified_transformer_tpu.ops.pallas.fused_attention_bwd \
            import band_attention_bwd, sparse_band_attention_bwd

        q, k, v, tq, tk, tv, m, den, out = res
        h = q.shape[1]
        grads = _by_head_groups(
            h, head_group, lambda sl: band_attention_bwd(
                q[:, sl], k[:, sl], v[:, sl], xyz, seg_start, seg_end,
                valid, g[:, sl], out[:, sl], m[:, sl], den[:, sl],
                _hslice(tq, sl), _hslice(tk, sl), _hslice(tv, sl),
                **kw, w_chunk=w_chunk, interpret=interpret, fast=fast))
        if sparse_band is not None:
            sgrads = _by_head_groups(
                h, head_group, lambda sl: sparse_band_attention_bwd(
                    q[:, sl], k[:, sl], v[:, sl], sparse_band, g[:, sl],
                    out[:, sl], m[:, sl], den[:, sl],
                    _hslice(tq, sl), _hslice(tk, sl), _hslice(tv, sl),
                    window_size=window_size, quant_size=quant_size,
                    scale=scale, s_band=s_band, tile=tile,
                    w_chunk=min(w_chunk, s_band), interpret=interpret,
                    fast=fast))
            grads = tuple(
                a if b is None else (b if a is None else a + b)
                for a, b in zip(grads, sgrads))
        return grads

    f.defvjp(f_fwd, f_bwd)
    dummy = None
    tq = table_q
    tk = table_k
    tv = table_v
    if tq is None:
        return f(q, k, v, dummy, dummy, dummy)
    return f(q, k, v, tq, tk, tv)
