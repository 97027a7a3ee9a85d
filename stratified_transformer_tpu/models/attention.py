"""WindowAttention + transformer block (flax.linen).

Mirrors ``WindowAttention`` (``model/stratified_transformer.py:114-217``) and
``SwinTransformerBlock`` (:219-248): fused QKV projection, contextual RPE
tables of shape ``(2*quant_grid_length, heads, head_dim, 3)`` initialised
trunc_normal(0.02) (:142-152), attention math in fp32 regardless of the
compute dtype (the reference forces ``.float()`` under AMP), pre-LN residual
blocks with per-point DropPath.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stratified_transformer_tpu.models.layers import (
    Mlp, dense, drop_path, layer_norm, trunc_init)
from stratified_transformer_tpu.ops import attention as attn_ops
from stratified_transformer_tpu.ops.plan import AttentionPlan


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: float
    quant_size: float
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    band: int = 256
    tile: int = 128
    tile_batch: int = 16           # tiles per lax.map step (chunked vmap)
    impl: str = "reference"        # "reference" (jnp) | "fused" (Pallas)
    bwd_impl: str = "pallas"       # fused backward: "pallas" | "jnp"
    head_group: int = 0            # fused: heads per pallas_call (0 = all)
    w_chunk: int = 128
    interpret: bool = False        # Pallas interpret mode (CPU testing)
    dtype: str | None = None       # compute dtype for projections
    rpe_precision: str = "highest"
    qk_precision: str = "highest"  # QK^T / PV contraction precision
    remat: str = "full"            # "full" | "save_p" | "none"
    s_band: int = 256              # sparse-band aux window per query tile
    rpe_mode: str = "stratified"   # "stratified" | "swin_window"
    shift_size: float = 0.0        # swin_window: this block's window shift

    @nn.compact
    def __call__(self, feats, plan: AttentionPlan, *, training: bool):
        n, c = feats.shape
        h = self.num_heads
        d = c // h
        scale = self.qk_scale or d ** -0.5
        if self.rpe_mode == "swin_window":
            # table rows 2*qgl - 1, qgl = int(window/quant)
            # (reference model/swin3d_transformer.py:109-118)
            lq = int(self.window_size / self.quant_size)
            nbins = 2 * lq - 1
        else:
            # quant_grid_length, reference :142
            lq = int((2 * self.window_size + 1e-4) // self.quant_size)
            nbins = 2 * lq

        qkv = dense(3 * c, use_bias=self.qkv_bias, name="qkv",
                    dtype=self.dtype)(feats)
        qkv = qkv.reshape(n, 3, h, d)
        o = plan.order
        q = qkv[:, 0][o]
        k = qkv[:, 1][o]
        v = qkv[:, 2][o]

        def table(name):
            return self.param(name, trunc_init, (nbins, h, d, 3), jnp.float32)

        tq = table("rel_query_table") if self.rel_query else None
        tk = table("rel_key_table") if self.rel_key else None
        tv = table("rel_value_table") if self.rel_value else None

        rpe_xyz = plan.xyz_sorted
        impl = self.impl
        if self.rpe_mode == "swin_window":
            # per-point window-quantized position
            # u = floor(((xyz - min + shift) % window) / quant)
            # (reference swin3d_transformer.py:151-154); the relative bin is
            # then u_i - u_j + qgl - 1, computed inside the attention op.
            # The mod origin MUST be the plan's window-grid origin (the
            # global anchor in the sharded halo path, else the batch min):
            # a locally recomputed min would put same-window pairs that
            # straddle a local-min-grid boundary into wrong relative bins.
            xs = plan.xyz_sorted
            if plan.grid_start is not None:
                origin = plan.grid_start
            else:
                origin = jnp.min(
                    jnp.where(plan.valid_sorted[:, None], xs, jnp.inf),
                    axis=0)
            r = jnp.mod(xs - origin + self.shift_size, self.window_size)
            rpe_xyz = jnp.floor(r / self.quant_size)
            if impl == "fused":
                import warnings
                warnings.warn(
                    "rpe_mode='swin_window' is implemented on the jnp "
                    "reference path only; attn_impl='fused' is coerced to "
                    "'reference' for this layer.", stacklevel=2)
            impl = "reference"  # Pallas kernels implement stratified bins

        if impl == "fused":
            from stratified_transformer_tpu.ops.attention_fused import (
                stratified_attention_fused)

            out_sorted = stratified_attention_fused(
                q, k, v, rpe_xyz, plan.seg_start, plan.seg_end,
                plan.valid_sorted,
                sparse_band=plan.sparse_band,
                table_q=tq, table_k=tk, table_v=tv,
                window_size=self.window_size, quant_size=self.quant_size,
                scale=scale, band=self.band, tile=self.tile,
                w_chunk=self.w_chunk, interpret=self.interpret,
                s_band=self.s_band,
                rpe_precision=self.rpe_precision,
                qk_precision=self.qk_precision, remat=self.remat,
                bwd_impl=self.bwd_impl, head_group=self.head_group,
            )
        else:
            out_sorted = attn_ops.stratified_attention(
                q, k, v, rpe_xyz, plan.seg_start, plan.seg_end,
                plan.valid_sorted,
                sparse_idx=plan.sparse_idx, sparse_mask=plan.sparse_mask,
                table_q=tq, table_k=tk, table_v=tv,
                window_size=self.window_size, quant_size=self.quant_size,
                scale=scale, band=self.band, tile=self.tile,
                tile_batch=self.tile_batch,
                rpe_precision=self.rpe_precision,
                qk_precision=self.qk_precision, remat=self.remat,
                sparse_band=plan.sparse_band, s_band=self.s_band,
                rpe_mode=self.rpe_mode,
            )
        out = out_sorted[plan.inv_order].reshape(n, c).astype(feats.dtype)
        return dense(c, name="proj", dtype=self.dtype)(out)


class Block(nn.Module):
    """Pre-LN attention + MLP with DropPath (reference :219-248)."""

    dim: int
    num_heads: int
    window_size: float
    quant_size: float
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    band: int = 256
    tile: int = 128
    tile_batch: int = 16
    impl: str = "reference"
    bwd_impl: str = "pallas"
    head_group: int = 0
    w_chunk: int = 128
    interpret: bool = False
    dtype: str | None = None
    rpe_precision: str = "highest"
    qk_precision: str = "highest"
    remat: str = "full"
    s_band: int = 256
    rpe_mode: str = "stratified"
    shift_size: float = 0.0

    @nn.compact
    def __call__(self, feats, plan: AttentionPlan, *, training: bool):
        shortcut = feats
        x = layer_norm(name="norm1")(feats)
        x = WindowAttention(
            dim=self.dim, num_heads=self.num_heads,
            window_size=self.window_size, quant_size=self.quant_size,
            rel_query=self.rel_query, rel_key=self.rel_key,
            rel_value=self.rel_value, qkv_bias=self.qkv_bias,
            band=self.band, tile=self.tile, tile_batch=self.tile_batch,
            impl=self.impl, bwd_impl=self.bwd_impl,
            head_group=self.head_group,
            w_chunk=self.w_chunk, interpret=self.interpret,
            dtype=self.dtype, rpe_precision=self.rpe_precision,
            qk_precision=self.qk_precision, remat=self.remat,
            s_band=self.s_band, rpe_mode=self.rpe_mode,
            shift_size=self.shift_size, name="attn",
        )(x, plan, training=training)
        if training and self.drop_path_rate > 0:
            x = drop_path(
                x, self.drop_path_rate, self.make_rng("droppath"), training)
        feats = shortcut + x
        y = Mlp(
            hidden=int(self.dim * self.mlp_ratio), out=self.dim,
            dtype=self.dtype, name="mlp"
        )(layer_norm(name="norm2")(feats), training=training)
        if training and self.drop_path_rate > 0:
            y = drop_path(
                y, self.drop_path_rate, self.make_rng("droppath"), training)
        return feats + y
