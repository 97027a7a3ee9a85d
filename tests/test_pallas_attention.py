"""Pallas fused attention vs the jnp production path (interpret mode on CPU;
the same test compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stratified_transformer_tpu.ops import attention as jnp_attn
from stratified_transformer_tpu.ops import plan as plan_mod
from stratified_transformer_tpu.ops.attention_fused import (
    stratified_attention_fused)

H, D = 2, 8
WS = 0.5
QUANT = 0.125
NBINS = 2 * int((2 * WS + 1e-4) // QUANT)
SCALE = D ** -0.5
TILE = 32
BAND = 32
WCHUNK = 32


def _setup(rng, n_valid=100, n_pad=128, with_sparse=True):
    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, 2, n_valid)).astype(np.int32)
    batch = np.concatenate([batch, np.full(n_pad - n_valid, 2, np.int32)])
    valid = np.arange(n_pad) < n_valid
    q = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    k = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    v = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    is_down = ((rng.uniform(size=n_pad) < 0.4) & valid) if with_sparse \
        else None
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
        shifted=False,
        is_down=None if is_down is None else jnp.asarray(is_down),
        sparse_cap=16)
    o = plan.order
    return plan, jnp.asarray(q)[o], jnp.asarray(k)[o], jnp.asarray(v)[o]


def _tables(rng):
    return tuple(
        jnp.asarray((rng.normal(size=(NBINS, H, D, 3)) * 0.05)
                    .astype(np.float32)) for _ in range(3))


@pytest.mark.parametrize("with_rpe", [False, True])
def test_fused_matches_jnp(rng, with_rpe):
    plan, q, k, v = _setup(rng)
    tq, tk, tv = _tables(rng) if with_rpe else (None, None, None)
    kw = dict(window_size=WS, quant_size=QUANT, scale=SCALE, band=BAND,
              tile=TILE)
    ref = jnp_attn.stratified_attention(
        q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
        plan.valid_sorted, sparse_band=plan.sparse_band, table_q=tq, table_k=tk, table_v=tv,
        **kw)
    got = stratified_attention_fused(
        q, k, v, plan.xyz_sorted, plan.seg_start, plan.seg_end,
        plan.valid_sorted, sparse_band=plan.sparse_band, table_q=tq, table_k=tk, table_v=tv,
        **kw, w_chunk=WCHUNK, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_gradients_match(rng):
    plan, q, k, v = _setup(rng, n_valid=60, n_pad=64)
    tq, tk, tv = _tables(rng)
    cot = jnp.asarray(
        rng.normal(size=(64, H, D)).astype(np.float32))
    kw = dict(window_size=WS, quant_size=QUANT, scale=SCALE, band=BAND,
              tile=TILE)

    def loss_ref(q_, k_, v_, a, b, c):
        out = jnp_attn.stratified_attention(
            q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, sparse_band=plan.sparse_band, table_q=a, table_k=b,
            table_v=c, **kw)
        return jnp.sum(out * cot)

    def loss_fused(q_, k_, v_, a, b, c):
        out = stratified_attention_fused(
            q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted, sparse_band=plan.sparse_band, table_q=a, table_k=b,
            table_v=c, **kw, w_chunk=WCHUNK, interpret=True)
        return jnp.sum(out * cot)

    g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(q, k, v, tq, tk, tv)
    g_f = jax.grad(loss_fused, argnums=tuple(range(6)))(q, k, v, tq, tk, tv)
    for a, b, name in zip(g_r, g_f, "q k v tq tk tv".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name)


def test_sparse_band_kernel_direct(rng):
    """Direct parity: Pallas sparse kernel vs jnp sparse_band_triple, with
    bin-center-snapped coordinates (no quantization-boundary ambiguity)."""
    from stratified_transformer_tpu.ops import plan as P
    from stratified_transformer_tpu.ops.pallas.fused_attention import (
        sparse_band_attention)

    n_pad, n_valid = 256, 200
    # snap coords to bin centers: multiples of QUANT plus QUANT/2
    xyz = (rng.integers(0, 16, (n_pad, 3)) * QUANT
           + QUANT / 2).astype(np.float32)
    batch = np.zeros(n_pad, np.int32)
    valid = np.arange(n_pad) < n_valid
    batch[~valid] = 1
    q = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    k = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    v = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    is_down = (rng.uniform(size=n_pad) < 0.4) & valid
    plan = P.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
        shifted=False, is_down=jnp.asarray(is_down), sparse_cap=16)
    sb = plan.sparse_band
    o = plan.order
    qs, ks, vs = (jnp.asarray(a)[o] for a in (q, k, v))
    tq, tk, tv = _tables(rng)
    kw = dict(window_size=WS, quant_size=QUANT, scale=SCALE,
              s_band=64, tile=32)
    from stratified_transformer_tpu.ops import attention as A
    acc_j, m_j, den_j = A.sparse_band_triple(
        qs, ks, vs, plan.xyz_sorted, sb, table_q=tq, table_k=tk,
        table_v=tv, **kw)
    acc_p, m_p, den_p = sparse_band_attention(
        qs, ks, vs, sb, table_q=tq, table_k=tk, table_v=tv, **kw,
        w_chunk=32, interpret=True)
    vq = np.asarray(plan.valid_sorted)
    np.testing.assert_allclose(np.asarray(acc_p)[vq], np.asarray(acc_j)[vq],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(den_p)[vq], np.asarray(den_j)[vq],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_p)[vq], np.asarray(m_j)[vq],
                               rtol=1e-5, atol=1e-6)


def test_head_grouped_matches_ungrouped(rng):
    """head_group=1 (one pallas_call per head) is EXACT vs the all-heads
    call, forward and gradients — grouping only changes Mosaic program
    size (ops/attention_fused._by_head_groups)."""
    plan, q, k, v = _setup(rng, n_valid=60, n_pad=64)
    tq, tk, tv = _tables(rng)
    cot = jnp.asarray(rng.normal(size=(64, H, D)).astype(np.float32))
    kw = dict(window_size=WS, quant_size=QUANT, scale=SCALE, band=BAND,
              tile=TILE, w_chunk=WCHUNK, interpret=True)

    def run(head_group):
        def loss(q_, k_, v_, a, b, c):
            out = stratified_attention_fused(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, sparse_band=plan.sparse_band,
                table_q=a, table_k=b, table_v=c, head_group=head_group,
                **kw)
            return jnp.sum(out * cot), out
        (l, out), grads = jax.value_and_grad(
            loss, argnums=tuple(range(6)), has_aux=True)(
                q, k, v, tq, tk, tv)
        return out, grads

    out0, g0 = run(0)
    out1, g1 = run(1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out0))
    # grads reassociate inside the backward kernels' dk/dv/table
    # reductions (order changes with the per-call head count) — fp32
    # noise only, forward stays bit-exact
    for a, b, name in zip(g0, g1, "q k v tq tk tv".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-6,
            err_msg=name)


@pytest.mark.parametrize("band_mult", [1, 3])
def test_pallas_bwd_matches_jnp_vjp_wide_band(rng, band_mult):
    """Pallas flash backward vs the exact jnp-VJP gradients with
    band = band_mult * tile. band_mult=3 is the PRODUCTION stage-2 shape
    (band 384 = 3 * tile 128, configs band_per_stage) and exercises the
    multi-tile shifted-diagonal dk/dv re-composition
    (fused_attention_bwd.py:390-403) that band=tile never touches.
    Windows here hold ~55-70 points, so pair offsets in sort order span
    past one tile and every diagonal part carries real gradient mass."""
    n_pad, n_valid = 256, 230
    tile, band = 32, 32 * band_mult
    ws = 0.6
    xyz = np.concatenate([
        rng.uniform(0, 1.2, (n_valid, 2)),
        rng.uniform(0, 0.6, (n_valid, 1))], 1).astype(np.float32)
    xyz = np.concatenate(
        [xyz, np.full((n_pad - n_valid, 3), 50.0, np.float32)])
    batch = np.where(np.arange(n_pad) < n_valid, 0, 1).astype(np.int32)
    valid = np.arange(n_pad) < n_valid
    is_down = (rng.uniform(size=n_pad) < 0.3) & valid
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), ws,
        shifted=False, is_down=jnp.asarray(is_down), sparse_cap=16)
    q = jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
    nbins = 2 * int((2 * ws + 1e-4) // QUANT)
    tq, tk, tv = (
        jnp.asarray((rng.normal(size=(nbins, H, D, 3)) * 0.05)
                    .astype(np.float32)) for _ in range(3))
    cot = jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
    kw = dict(window_size=ws, quant_size=QUANT, scale=SCALE, band=band,
              tile=tile, w_chunk=32, s_band=64, interpret=True)

    def run(bwd_impl):
        def loss(q_, k_, v_, a, b, c):
            out = stratified_attention_fused(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, sparse_band=plan.sparse_band,
                table_q=a, table_k=b, table_v=c, bwd_impl=bwd_impl, **kw)
            return jnp.sum(out * cot), out
        (_, out), grads = jax.value_and_grad(
            loss, argnums=tuple(range(6)), has_aux=True)(
                q, k, v, tq, tk, tv)
        return out, grads

    out_p, g_pallas = run("pallas")
    out_j, g_jnp = run("jnp")
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))
    for a, b, name in zip(g_pallas, g_jnp, "q k v tq tk tv".split()):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-4,
            err_msg=f"grad {name} (band={band})")


def test_pallas_bwd_band_wider_than_input(rng):
    """band >= n (tiny inputs, wide production band - the kernels-only
    warmup regime): the backward's shifted-diagonal re-composition must
    clamp empty diagonals instead of slicing negatively
    (fused_attention_bwd.diag_add; r5 warmup crash)."""
    n_pad, n_valid = 64, 50
    tile, band = 32, 96                      # band > n
    ws = 0.6
    xyz = rng.uniform(0, 1.2, (n_pad, 3)).astype(np.float32)
    batch = np.zeros(n_pad, np.int32)
    valid = np.arange(n_pad) < n_valid
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), ws,
        shifted=False, is_down=None, sparse_cap=16)
    q, k, v = (jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
               for _ in range(3))
    nbins = 2 * int((2 * ws + 1e-4) // QUANT)
    tq, tk, tv = (
        jnp.asarray((rng.normal(size=(nbins, H, D, 3)) * 0.05)
                    .astype(np.float32)) for _ in range(3))
    cot = jnp.asarray(rng.normal(size=(n_pad, H, D)).astype(np.float32))
    kw = dict(window_size=ws, quant_size=QUANT, scale=SCALE, band=band,
              tile=tile, w_chunk=32, interpret=True)

    def run(bwd_impl):
        def loss(q_, k_, v_, a, b, c):
            out = stratified_attention_fused(
                q_, k_, v_, plan.xyz_sorted, plan.seg_start, plan.seg_end,
                plan.valid_sorted, table_q=a, table_k=b, table_v=c,
                bwd_impl=bwd_impl, **kw)
            return jnp.sum(out * cot)
        return jax.grad(loss, argnums=tuple(range(6)))(q, k, v, tq, tk, tv)

    g_p = run("pallas")
    g_j = run("jnp")
    for a, b, name in zip(g_p, g_j, "q k v tq tk tv".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"grad {name}")
