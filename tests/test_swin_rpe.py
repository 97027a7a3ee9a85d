"""Swin3D's window-quantized RPE scheme (``rpe_mode="swin_window"``).

Oracle: the reference's quantization + mapping lines executed in torch
(``model/swin3d_transformer.py:129-130`` ``map_func``, ``:151-154``
``xyz_quant``), plus internal band-vs-pair-list consistency and a model-level
smoke of the faithful `Swin3D` construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stratified_transformer_tpu.ops import attention as attn
from stratified_transformer_tpu.ops import plan as plan_mod

H, D = 2, 8
WS = 0.5
QUANT = 0.125
QGL = int(WS / QUANT)             # reference swin3d_transformer.py:109
NBINS = 2 * QGL - 1               # reference table rows :111-118
SCALE = D ** -0.5


def _ref_swin_index(xyz, i0, i1, window_size, quant_size, shift):
    """Reference torch semantics, swin3d_transformer.py:151-154 + map_func
    (:129-130): xyz_quant = ((xyz - xyz.min(0)) + shift) % window // quant;
    idx = (quant[i0] - quant[i1]) + qgl - 1."""
    t = torch.as_tensor(xyz, dtype=torch.float32)
    qgl = int(window_size / quant_size)
    xq = (t - t.min(0)[0] + shift) % window_size
    xq = torch.div(xq, quant_size, rounding_mode="floor")
    rel = xq[i0] - xq[i1]
    return (rel + qgl - 1).long().numpy()


def _our_quant(xyz, valid, window_size, quant_size, shift):
    """The per-point quantization WindowAttention performs for swin mode."""
    xs = jnp.asarray(xyz, jnp.float32)
    origin = jnp.min(jnp.where(jnp.asarray(valid)[:, None], xs, jnp.inf),
                     axis=0)
    r = jnp.mod(xs - origin + shift, window_size)
    return jnp.floor(r / quant_size)


def test_swin_bin_index_parity(rng):
    for shift in (0.0, WS / 2):
        xyz = rng.uniform(-1, 3, (300, 3)).astype(np.float32)
        i0 = rng.integers(0, 300, 500)
        i1 = rng.integers(0, 300, 500)
        ref = _ref_swin_index(xyz, i0, i1, WS, QUANT, shift)
        u = np.asarray(_our_quant(xyz, np.ones(300, bool), WS, QUANT, shift))
        got = np.asarray(attn.swin_relative_position_index(
            jnp.asarray(u[i0] - u[i1]), NBINS))
        # the reference clips nothing (indices are in range by construction
        # for same-window pairs); compare on the in-range subset
        in_range = (ref >= 0) & (ref < NBINS)
        assert in_range.mean() > 0.3
        np.testing.assert_array_equal(got[in_range], ref[in_range])
        # all SAME-window pairs are in range by construction
        key = np.floor((xyz - xyz.min(0) + shift) / WS).astype(np.int64)
        same_w = (key[i0] == key[i1]).all(1)
        assert ((ref[same_w] >= 0) & (ref[same_w] < NBINS)).all()


def test_swin_band_matches_pair_oracle(rng):
    """stratified_attention(rpe_mode=swin_window) over the band layout ==
    pair_attention_reference with the same quantized coords."""
    n_pad, n_valid = 256, 200
    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, 2, n_valid)).astype(np.int32)
    batch = np.concatenate([batch, np.full(n_pad - n_valid, 2, np.int32)])
    valid = np.arange(n_pad) < n_valid
    q = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    k = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    v = rng.normal(size=(n_pad, H, D)).astype(np.float32)
    tq, tk, tv = [
        (rng.normal(size=(NBINS, H, D, 3)) * 0.05).astype(np.float32)
        for _ in range(3)]

    for shifted in (False, True):
        shift = WS / 2 if shifted else 0.0
        p = plan_mod.build_attention_plan(
            jnp.asarray(xyz), jnp.asarray(batch), jnp.asarray(valid), WS,
            shifted=shifted)
        u = _our_quant(xyz, valid, WS, QUANT, shift)
        u_sorted = u[p.order]

        out_band = attn.stratified_attention(
            jnp.asarray(q)[p.order], jnp.asarray(k)[p.order],
            jnp.asarray(v)[p.order], u_sorted, p.seg_start, p.seg_end,
            p.valid_sorted,
            table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
            table_v=jnp.asarray(tv),
            window_size=WS, quant_size=QUANT, scale=SCALE, band=64,
            tile=64, rpe_mode="swin_window")[p.inv_order]

        # pair list from the same plan segments
        from reference_impl import np_get_pairs
        pi, pj = np_get_pairs(xyz[:n_valid], batch[:n_valid], WS,
                              shifted=shifted)
        mask = np.ones(len(pi), bool)
        out_pairs = attn.pair_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), u,
            jnp.asarray(pi, jnp.int32), jnp.asarray(pj, jnp.int32),
            jnp.asarray(mask),
            window_size=WS, quant_size=QUANT, scale=SCALE,
            table_q=jnp.asarray(tq), table_k=jnp.asarray(tk),
            table_v=jnp.asarray(tv), rpe_mode="swin_window")

        np.testing.assert_allclose(
            np.asarray(out_band)[:n_valid], np.asarray(out_pairs)[:n_valid],
            rtol=2e-5, atol=2e-5)


def test_swin3d_model_forward(rng):
    """Faithful Swin3D: table rows 2*qgl-1, forward finite, grads flow."""
    import dataclasses
    from stratified_transformer_tpu.models.stratified import (
        StratifiedConfig)
    from stratified_transformer_tpu.models.swin3d import Swin3D

    n_pad = 512
    cfg = StratifiedConfig(
        num_classes=5, in_channels=6, n_pad=n_pad, num_scenes=2,
        depths=(1, 1), channels=(16, 32), num_heads=(2, 4), num_layers=2,
        window_size=4, grid_size=0.1, quant_size=0.02,
        band=64, tile=64, stem_transformer=True)
    model = Swin3D(cfg)
    assert model.cfg.rpe_mode == "swin_window"
    assert not model.cfg.use_stratified

    xyz = rng.uniform(0, 2, (n_pad, 3)).astype(np.float32)
    feats = rng.normal(size=(n_pad, 6)).astype(np.float32)
    offsets = np.array([n_pad // 2, n_pad], np.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, xyz, offsets)

    # reference swin table: 2*int(window/quant)-1 rows
    # (window_sizes()[0] = grid*patch*window... use the model's own derived
    # window for stage 0)
    ws0 = model.cfg.window_sizes()[0]
    qs0 = model.cfg.quant_sizes()[0]
    want_rows = 2 * int(ws0 / qs0) - 1
    t = variables["params"]["layer_0"]["blocks_0"]["attn"]["rel_query_table"]
    assert t.shape[0] == want_rows, (t.shape, want_rows)

    logits, shift = model.apply(variables, feats, xyz, offsets,
                                training=False)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, xyz, offsets, training=False)
        return (out ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    gt = g["layer_0"]["blocks_0"]["attn"]["rel_query_table"]
    assert np.isfinite(np.asarray(gt)).all()
    assert np.abs(np.asarray(gt)).sum() > 0
