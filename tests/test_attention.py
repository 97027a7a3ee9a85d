"""Attention parity tests: production banded/sparse path vs pair-list oracle
vs numpy reference — the analogue of the reference's v1-vs-v2 kernel parity
scripts (``lib/pointops2/functions/test_attention_op_step1_v2.py`` etc.)."""

import numpy as np
import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops import attention as attn
from stratified_transformer_tpu.ops import plan as plan_mod
from reference_impl import np_get_pairs, np_pair_attention

H, D = 2, 8
WS = 0.5
QUANT = 0.125
NBINS = 2 * int((2 * WS + 1e-4) // QUANT)  # 16
SCALE = D ** -0.5


def _scene(rng, n_valid=100, n_pad=128, batches=2):
    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, batches, n_valid)).astype(np.int32)
    batch = np.concatenate(
        [batch, np.full(n_pad - n_valid, batches, np.int32)])
    valid = np.arange(n_pad) < n_valid
    q = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    k = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    v = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    return xyz, batch, valid, q, k, v


def _tables(rng):
    tq = (rng.normal(size=(NBINS, H, D, 3)) * 0.05).astype(np.float32)
    tk = (rng.normal(size=(NBINS, H, D, 3)) * 0.05).astype(np.float32)
    tv = (rng.normal(size=(NBINS, H, D, 3)) * 0.05).astype(np.float32)
    return tq, tk, tv


def test_oracle_matches_numpy(rng):
    xyz, batch, valid, q, k, v = _scene(rng)
    tq, tk, tv = _tables(rng)
    n_valid = valid.sum()
    pi, pj = np_get_pairs(xyz[:n_valid], batch[:n_valid], WS, shifted=False)

    m_pad = len(pi) + 7
    pim = np.concatenate([pi, np.zeros(7, np.int64)])
    pjm = np.concatenate([pj, np.zeros(7, np.int64)])
    mask = np.arange(m_pad) < len(pi)

    out = attn.pair_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(xyz),
        jnp.asarray(pim, jnp.int32), jnp.asarray(pjm, jnp.int32),
        jnp.asarray(mask),
        window_size=WS, quant_size=QUANT, scale=SCALE,
        table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
        table_v=jnp.asarray(tv),
    )
    expect = np_pair_attention(
        q, k, v, xyz, pi, pj, WS, QUANT, SCALE, tq, tk, tv)
    np.testing.assert_allclose(
        np.asarray(out)[:n_valid], expect[:n_valid], rtol=2e-4, atol=2e-5)
    # queries with no pairs (padding) output zero
    np.testing.assert_array_equal(np.asarray(out)[n_valid:], 0.0)


def _production(xyz, batch, valid, q, k, v, tq, tk, tv, is_down, shifted,
                band=32, tile=32, sparse_cap=24, mode="band"):
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
        shifted=shifted,
        is_down=None if is_down is None else jnp.asarray(is_down),
        sparse_cap=sparse_cap,
        with_sparse_gather=(mode == "gather"),
    )
    o = plan.order
    out_sorted = attn.stratified_attention(
        jnp.asarray(q)[o], jnp.asarray(k)[o], jnp.asarray(v)[o],
        plan.xyz_sorted, plan.seg_start, plan.seg_end, plan.valid_sorted,
        sparse_idx=plan.sparse_idx, sparse_mask=plan.sparse_mask,
        table_q=None if tq is None else jnp.asarray(tq),
        table_k=None if tk is None else jnp.asarray(tk),
        table_v=None if tv is None else jnp.asarray(tv),
        window_size=WS, quant_size=QUANT, scale=SCALE,
        band=band, tile=tile,
        sparse_band=None if mode == "gather" else plan.sparse_band,
    )
    return np.asarray(out_sorted[plan.inv_order])


def test_production_dense_only_matches_numpy(rng):
    xyz, batch, valid, q, k, v = _scene(rng)
    tq, tk, tv = _tables(rng)
    n_valid = valid.sum()
    for shifted in (False, True):
        pi, pj = np_get_pairs(
            xyz[:n_valid], batch[:n_valid], WS, shifted=shifted)
        expect = np_pair_attention(
            q, k, v, xyz, pi, pj, WS, QUANT, SCALE, tq, tk, tv)
        got = _production(
            xyz, batch, valid, q, k, v, tq, tk, tv, None, shifted)
        np.testing.assert_allclose(
            got[:n_valid], expect[:n_valid], rtol=2e-4, atol=2e-5,
            err_msg=f"shifted={shifted}")


def test_production_stratified_matches_numpy(rng):
    """Both sparse layouts (band = production, gather = legacy oracle
    path) must match the explicit pair-list reference."""
    xyz, batch, valid, q, k, v = _scene(rng)
    tq, tk, tv = _tables(rng)
    n_valid = valid.sum()
    is_down = (rng.uniform(size=len(valid)) < 0.4) & valid
    for shifted in (False, True):
        pi, pj = np_get_pairs(
            xyz[:n_valid], batch[:n_valid], WS, shifted=shifted,
            down_mask=is_down[:n_valid])
        expect = np_pair_attention(
            q, k, v, xyz, pi, pj, WS, QUANT, SCALE, tq, tk, tv)
        for mode in ("band", "gather"):
            got = _production(
                xyz, batch, valid, q, k, v, tq, tk, tv, is_down, shifted,
                mode=mode)
            np.testing.assert_allclose(
                got[:n_valid], expect[:n_valid], rtol=2e-4, atol=2e-5,
                err_msg=f"shifted={shifted} mode={mode}")


def test_production_no_rpe(rng):
    xyz, batch, valid, q, k, v = _scene(rng, n_valid=64, n_pad=64)
    n_valid = valid.sum()
    pi, pj = np_get_pairs(xyz[:n_valid], batch[:n_valid], WS, shifted=False)
    expect = np_pair_attention(
        q, k, v, xyz, pi, pj, WS, QUANT, SCALE, None, None, None)
    got = _production(xyz, batch, valid, q, k, v, None, None, None,
                      None, False)
    np.testing.assert_allclose(
        got[:n_valid], expect[:n_valid], rtol=2e-4, atol=2e-5)


def test_gradients_match_oracle(rng):
    """d(out)/d(q,k,v,tables) must agree between production and oracle."""
    xyz, batch, valid, q, k, v = _scene(rng, n_valid=60, n_pad=64)
    tq, tk, tv = _tables(rng)
    n_valid = valid.sum()
    is_down = (rng.uniform(size=len(valid)) < 0.5) & valid
    pi, pj = np_get_pairs(
        xyz[:n_valid], batch[:n_valid], WS, shifted=False,
        down_mask=is_down[:n_valid])
    m_pad = len(pi)
    cot = rng.normal(size=(len(valid), H, D)).astype(np.float32)
    cot[~valid] = 0.0

    def f_oracle(q_, k_, v_, tq_, tk_, tv_):
        out = attn.pair_attention_reference(
            q_, k_, v_, jnp.asarray(xyz),
            jnp.asarray(pi, jnp.int32), jnp.asarray(pj, jnp.int32),
            jnp.ones(m_pad, bool),
            window_size=WS, quant_size=QUANT, scale=SCALE,
            table_q=tq_, table_k=tk_, table_v=tv_)
        return jnp.sum(out * cot)

    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
        shifted=False, is_down=jnp.asarray(is_down), sparse_cap=32)

    def f_prod(q_, k_, v_, tq_, tk_, tv_):
        o = plan.order
        out_sorted = attn.stratified_attention(
            q_[o], k_[o], v_[o], plan.xyz_sorted, plan.seg_start,
            plan.seg_end, plan.valid_sorted,
            table_q=tq_, table_k=tk_, table_v=tv_,
            window_size=WS, quant_size=QUANT, scale=SCALE, band=32, tile=32,
            sparse_band=plan.sparse_band)
        return jnp.sum(out_sorted[plan.inv_order] * cot)

    args = tuple(jnp.asarray(a) for a in (q, k, v, tq, tk, tv))
    g_o = jax.grad(f_oracle, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_p = jax.grad(f_prod, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b, name in zip(g_o, g_p, "q k v tq tk tv".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad {name}")


def test_production_fast_precision_modes_close(rng):
    """rpe/qk precision "default" (bf16 MXU passes + bf16 one-hots) must
    stay within bf16-rounding distance of the fp32-exact path."""
    xyz, batch, valid, q, k, v = _scene(rng)
    tq, tk, tv = _tables(rng)
    n_valid = valid.sum()
    is_down = (rng.uniform(size=len(valid)) < 0.4) & valid

    def run(**prec):
        plan = plan_mod.build_attention_plan(
            jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
            shifted=False, is_down=jnp.asarray(is_down), sparse_cap=24)
        o = plan.order
        out = attn.stratified_attention(
            jnp.asarray(q)[o], jnp.asarray(k)[o], jnp.asarray(v)[o],
            plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted,
            table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
            table_v=jnp.asarray(tv),
            window_size=WS, quant_size=QUANT, scale=SCALE,
            band=32, tile=32, sparse_band=plan.sparse_band, **prec)
        return np.asarray(out[plan.inv_order])

    exact = run()
    fast = run(rpe_precision="default", qk_precision="default")
    np.testing.assert_allclose(
        fast[:n_valid], exact[:n_valid], rtol=0.05, atol=0.05)


def test_remat_modes_grad_equivalent(rng):
    """save_p / none remat must give identical outputs AND gradients."""
    xyz, batch, valid, q, k, v = _scene(rng, n_valid=60, n_pad=64)
    tq, tk, tv = _tables(rng)
    is_down = (rng.uniform(size=len(valid)) < 0.4) & valid
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
        shifted=False, is_down=jnp.asarray(is_down), sparse_cap=24)
    o = plan.order

    def loss(args, remat):
        qq, kk, vv, tqq, tkk, tvv = args
        out = attn.stratified_attention(
            qq[o], kk[o], vv[o],
            plan.xyz_sorted, plan.seg_start, plan.seg_end,
            plan.valid_sorted,
            table_q=tqq, table_k=tkk, table_v=tvv,
            window_size=WS, quant_size=QUANT, scale=SCALE,
            band=32, tile=32, sparse_band=plan.sparse_band, remat=remat)
        return jnp.sum(out ** 2)

    args = tuple(jnp.asarray(a) for a in (q, k, v, tq, tk, tv))
    g_full = jax.grad(lambda a: loss(a, "full"))(args)
    g_save = jax.grad(lambda a: loss(a, "save_p"))(args)
    for gf, gs in zip(g_full, g_save):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=1e-5, atol=1e-6)
