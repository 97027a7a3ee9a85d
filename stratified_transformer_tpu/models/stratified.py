"""The Stratified Transformer segmentation model (flax.linen).

Mirrors ``Stratified`` (``model/stratified_transformer.py:398-502``) and its
upstream variant (``model/stratified_transformer_backup.py:394-487``): KPConv
stem, U-Net encoder of ``BasicLayer`` stages with stratified window attention,
``TransitionDown``/``Upsample`` pyramid, classifier head, optional per-point
3-vector offset regressor (the DCF fork head, reference :438-443,485-487).

TPU-native dataflow: flat ``[N_pad]`` arrays + traced cumulative ``offsets``;
all stage capacities are static; per-stage attention plans are built once per
shift parity and shared across the stage's blocks, exactly like the reference
shares its ``grid_sample`` results (:277-300).

Derived hyper-parameters follow ``train.py:110-113``:
``patch = grid_size * patch_size``; ``window[i] = patch * window * 2**i``;
``grid[i] = patch * 2**i``; ``quant[i] = quant_size * 2**i``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stratified_transformer_tpu.models.attention import Block
from stratified_transformer_tpu.models.kpconv import (
    KPConvResBlock,
    KPConvSimpleBlock,
)
from stratified_transformer_tpu.models.layers import (
    MaskedBatchNorm,
    TransitionDown,
    Upsample,
    dense,
)
from stratified_transformer_tpu.ops import neighbors, sampling
from stratified_transformer_tpu.ops.plan import build_attention_plan


@dataclasses.dataclass(frozen=True)
class StratifiedConfig:
    """Static model/shape configuration (hashable, jit-friendly)."""

    num_classes: int = 13
    in_channels: int = 6                      # colors (+xyz if concat_xyz)
    channels: Tuple[int, ...] = (48, 96, 192, 384)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    num_layers: int = 4
    window_size: float = 4.0                  # multiplier (config TRAIN)
    patch_size: float = 1.0
    grid_size: float = 0.04
    quant_size: float = 0.01
    downsample_scale: int = 8
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    drop_path_rate: float = 0.3
    concat_xyz: bool = True
    stem_transformer: bool = True
    up_k: int = 3
    ratio: float = 0.25
    k: int = 16
    sigma: float = 1.0
    max_num_neighbors: int = 34
    with_regressor: bool = False              # DCF fork head
    activation: str = "Relu"                  # regressor act: Relu | Tanh
    mlp_ratio: float = 4.0

    # --- TPU static-shape / layout knobs (no reference analogue) ---
    n_pad: int = 140_000                      # flat point capacity
    num_scenes: int = 8                       # static batch capacity
    band: int = 128                           # one-sided dense band width
    # Per-stage band override. Window POINT COUNTS roughly double per stage
    # (volume x8, density /4), so one global band either wastes compute at
    # stage 0 or truncates windows deeper in (measured at the S3DIS-scale
    # synthetic point: stage-2 windows reach 355 pts -> band 128 drops ~30%
    # of in-window pairs; the reference admits windows up to n_max=1024).
    # The Pallas kernels' dynamic chunk bounds make wide bands cheap: tiles
    # only visit chunks their segments touch.
    band_per_stage: Optional[Tuple[int, ...]] = None
    tile: int = 128                           # attention query tile
    sparse_cap: int = 48                      # sparse keys per large window
    use_stratified: bool = True               # False => plain Swin3D windows
    # "stratified": continuous-coordinate quantized bins spanning +-2*window
    # (model/stratified_transformer.py:186-190). "swin_window": the vanilla
    # Swin3D scheme — per-point window-quantized positions, bins u_i - u_j +
    # qgl - 1 over 2*qgl-1 table rows (model/swin3d_transformer.py:129-154);
    # window-dense only (requires use_stratified=False).
    rpe_mode: str = "stratified"
    sampler: str = "grid"                     # "fps" | "grid"
    # Downsample count policy for the grid sampler. "scene" (default):
    # per-scene quota floor(n*ratio)+1 — reference parity
    # (model/stratified_transformer.py:98-100,283-285). "cells": every
    # occupied cell keeps its representative (up to capacity) — counts
    # depend only on local geometry + the global anchor, which sharded
    # halo inference REQUIRES for block forwards to equal the whole-scene
    # forward (a count-derived quota drops different cells in a block
    # than in the full scene; parallel/halo.py).
    down_quota: str = "scene"                 # "scene" | "cells"
    knn_chunk: int = 1024
    neighbor_method: str = "grid"             # "grid" cell-list | "brute"
    neighbor_cap: int = 32                    # cell-list per-cell capacity
    grid_knn_chunk: int | None = 4096         # cell-list query chunk
    bn_axis_name: str | None = None           # SyncBN psum axis (DP mesh)
    attn_impl: str = "reference"              # "reference" | "fused" (Pallas)
    # Stages [0, fused_stages) use the Pallas kernels when attn_impl is
    # "fused"; later stages fall back to the jnp path. The late stages are
    # tiny-N / many-head (h=24): the per-head-unrolled kernels compile
    # slowly and run SLOWER than XLA there, while head_group caps the
    # unroll for stage 2 (h=12) where the Pallas path wins (r4 measured:
    # 460 ms/step vs 499 at fused_stages 2; training validated r5 via the
    # schedule-matched A/B after the r4 plateau was root-caused to LR
    # milestones scaling with `epochs`).
    fused_stages: int = 3
    attn_bwd: str = "pallas"                  # fused backward: "pallas"|"jnp"
    head_group: int = 6                       # fused: heads per pallas_call
    w_chunk: int = 128
    # Sparse-band aux window per query tile. A tile's far-key segments span
    # max(ke)-min(ks) aux slots; measured max 37 at the stage-0 operating
    # point (grid-pool 1/8 downsampling bounds keys/large-window to
    # ~(2w/cell)^3 ~= 22) — 128 keeps >3x margin at half the cost of 256.
    s_band: int = 128
    pallas_interpret: bool = False
    compute_dtype: str | None = None          # e.g. "bfloat16" (AMP analogue)
    rpe_precision: str = "highest"            # "default" = bf16 cRPE matmuls
    qk_precision: str = "highest"             # "default" = bf16 QK/PV matmuls
    tile_batch: int = 16                      # attention tiles per map step
    attn_remat: str = "full"                  # "full" | "save_p" | "none"

    # -------- derived (reference train.py:110-113) --------
    @property
    def patch(self) -> float:
        return self.grid_size * self.patch_size

    def window_sizes(self):
        return [self.patch * self.window_size * 2 ** i
                for i in range(self.num_layers)]

    def grid_sizes(self):
        return [self.patch * 2 ** i for i in range(self.num_layers)]

    def quant_sizes(self):
        return [self.quant_size * 2 ** i for i in range(self.num_layers)]

    @property
    def layer_start(self) -> int:
        return 0 if self.stem_transformer else 1

    def stage_caps(self):
        """Static point capacity entering each stage 0..num_layers-1."""
        caps = []
        n = self.n_pad
        if not self.stem_transformer:
            caps.append(n)                     # stage 0 skip level
            n = int(n * self.ratio) + self.num_scenes
        for i in range(self.layer_start, self.num_layers):
            caps.append(n)
            n = int(n * self.ratio) + self.num_scenes
        return caps

    def drop_path_schedule(self):
        total = sum(self.depths)
        import numpy as np
        return list(np.linspace(0.0, self.drop_path_rate, total))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class BasicLayer(nn.Module):
    """One encoder stage: plans + depth x Block (reference :250-326)."""

    cfg: StratifiedConfig
    stage: int

    @nn.compact
    def __call__(self, feats, xyz, offsets, *, training: bool,
                 is_down_pre=None, anchor=None):
        cfg = self.cfg
        i = self.stage
        n = xyz.shape[0]
        ws = cfg.window_sizes()[i]
        qs = cfg.quant_sizes()[i]
        batch = sampling.offsets_to_batch(offsets, n)
        valid = sampling.offsets_to_valid(offsets, n)

        is_down = None
        if cfg.use_stratified and is_down_pre is not None:
            is_down = jnp.asarray(is_down_pre)
            d_pad = n // cfg.downsample_scale + cfg.num_scenes
        elif cfg.use_stratified:
            counts = offsets - jnp.concatenate(
                [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
            d_counts = sampling.floor_ratio_counts(
                counts, 1.0 / cfg.downsample_scale)
            d_offsets = sampling.counts_to_offsets(d_counts)
            d_pad = n // cfg.downsample_scale + cfg.num_scenes
            if cfg.sampler == "grid":
                cell = cfg.grid_sizes()[i] * float(cfg.downsample_scale) ** 0.5
                if cfg.down_quota == "cells":
                    d_idx, d_valid, _ = sampling.grid_pool_sampling_all(
                        xyz, offsets, d_pad, cell, origin=anchor)
                else:
                    d_idx, d_valid = sampling.grid_pool_sampling(
                        xyz, offsets, d_offsets, d_pad, cell, origin=anchor)
            elif cfg.sampler == "blocked_fps":
                cell = cfg.window_sizes()[i] * 4.0
                d_idx, d_valid = sampling.blocked_fps(
                    xyz, offsets, d_offsets, d_pad, cell)
            else:
                d_idx, d_valid = sampling.farthest_point_sampling(
                    xyz, offsets, d_offsets, d_pad)
            is_down = jnp.zeros((n,), bool).at[d_idx].set(d_valid, mode="drop")

        aux_pad = ((d_pad + 127) // 128) * 128 if cfg.use_stratified else None
        plans = [
            build_attention_plan(
                xyz, batch, valid, ws, shifted=bool(parity),
                is_down=is_down, sparse_cap=cfg.sparse_cap,
                aux_pad=aux_pad, anchor=anchor)
            for parity in (0, 1)
        ]

        impl = cfg.attn_impl
        if impl == "fused" and i >= cfg.fused_stages:
            impl = "reference"
        band = cfg.band
        if cfg.band_per_stage is not None:
            band = cfg.band_per_stage[i]
        dps = self.cfg.drop_path_schedule()
        base = sum(cfg.depths[:i])
        for b in range(cfg.depths[i]):
            feats = Block(
                dim=cfg.channels[i], num_heads=cfg.num_heads[i],
                window_size=ws, quant_size=qs,
                rel_query=cfg.rel_query, rel_key=cfg.rel_key,
                rel_value=cfg.rel_value, drop_path_rate=dps[base + b],
                mlp_ratio=cfg.mlp_ratio, band=band, tile=cfg.tile,
                tile_batch=cfg.tile_batch, remat=cfg.attn_remat,
                impl=impl, bwd_impl=cfg.attn_bwd,
                head_group=cfg.head_group,
                rpe_mode=cfg.rpe_mode,
                shift_size=(ws / 2.0) if (b % 2) else 0.0,
                w_chunk=cfg.w_chunk,
                interpret=cfg.pallas_interpret, dtype=cfg.compute_dtype,
                rpe_precision=cfg.rpe_precision,
                qk_precision=cfg.qk_precision, s_band=cfg.s_band,
                name=f"blocks_{b}",
            )(feats, plans[b % 2], training=training)
        return feats


class Stratified(nn.Module):
    cfg: StratifiedConfig

    @nn.compact
    def __call__(self, feats, xyz, offsets, *, training: bool = False,
                 stem_nidx=None, stem_nmask=None, pyramid=None,
                 anchor=None):
        """feats ``[N_pad, C_in]``, xyz ``[N_pad, 3]``, offsets ``[B]``.

        ``pyramid``: optional HOST-computed geometry pyramid
        (`data.pyramid.build_geometry_pyramid`) — downsample indices, kNN
        graphs, 3-NN upsample indices and stratified member masks; when
        given, all on-device neighbor searches and sampling sorts outside
        the attention plans are skipped.
        ``stem_nidx``/``stem_nmask`` (``[N_pad, K]``): optional HOST-computed
        radius neighbors for the KPConv stem — the reference computes
        ball_query on CPU inside the train loop (``train.py:324-329``), so
        the input pipeline can supply them prefetched and off the device
        critical path (`data.collate.with_stem_neighbors`). When absent they
        are computed on-device (whole-scene inference path).

        ``anchor``: optional ``[3]`` global grid origin for every window /
        pooling grid (default: batch min of valid points, the reference's
        ``xyz.min(0)``). Sharded halo inference passes the whole-scene
        anchor so all blocks share one grid (`parallel.halo`).

        Returns ``(logits [N_pad, num_classes], shift [N_pad, 3] | None)``.
        """
        cfg = self.cfg
        feats = jnp.asarray(feats)
        xyz = jnp.asarray(xyz)
        offsets = jnp.asarray(offsets)
        n = xyz.shape[0]
        assert n % cfg.tile == 0, (
            f"n_pad {n} must be a multiple of tile {cfg.tile}")
        batch = sampling.offsets_to_batch(offsets, n)
        valid = sampling.offsets_to_valid(offsets, n)

        # --- KPConv stem neighbors: host-supplied (prefetched, like the
        # reference's CPU ball_query, train.py:324-329) or on-device ---
        if stem_nidx is not None:
            nidx = jnp.asarray(stem_nidx, jnp.int32)
            nmask = jnp.asarray(stem_nmask)
        else:
            radius = 2.5 * cfg.grid_size * cfg.sigma
            nidx, nmask = neighbors.radius_neighbors(
                xyz, batch, xyz, batch, valid, radius, cfg.max_num_neighbors,
                chunk=cfg.knn_chunk, method=cfg.neighbor_method,
                cap=cfg.neighbor_cap, grid_chunk=cfg.grid_knn_chunk,
                origin=anchor)
        feats = KPConvSimpleBlock(
            cfg.channels[0], cfg.grid_size * cfg.sigma,
            bn_axis_name=cfg.bn_axis_name, name="stem_0",
        )(feats, xyz, nidx, nmask, valid, training=training)
        if not cfg.stem_transformer:
            feats = KPConvResBlock(
                cfg.channels[0], cfg.grid_size * cfg.sigma,
                bn_axis_name=cfg.bn_axis_name, name="stem_1",
            )(feats, xyz, nidx, nmask, valid, training=training)

        feats_stack, xyz_stack, off_stack, grid_stack = [], [], [], []
        caps = cfg.stage_caps()
        cap_i = 0
        if pyramid is not None:
            # accept uint16-narrowed payloads from the loader directly
            # (data/compress.py) so direct model.apply callers need no
            # manual widening
            from stratified_transformer_tpu.data.compress import widen_batch
            pyramid = widen_batch(pyramid)
        down_pre = list(pyramid["down"]) if pyramid is not None else None
        up_pre = list(pyramid["up"]) if pyramid is not None else None
        sd_pre = (list(pyramid["stage_down"])
                  if pyramid is not None and cfg.use_stratified else None)

        if not cfg.stem_transformer:
            feats_stack.append(feats)
            xyz_stack.append(xyz)
            off_stack.append(offsets)
            grid_stack.append(cfg.grid_sizes()[0])
            out_pad = _round_up(
                int(caps[0] * cfg.ratio) + cfg.num_scenes, cfg.tile)
            feats, xyz, offsets, _ = TransitionDown(
                cfg.channels[1], ratio=cfg.ratio, k=cfg.k,
                sampler=cfg.sampler,
                grid_cell=cfg.grid_sizes()[0] * 2.0,
                out_pad=out_pad, name="stem_down",
                knn_method=cfg.neighbor_method,
                knn_cell=cfg.grid_sizes()[0] * 3.0,
                knn_cap=cfg.neighbor_cap,
                knn_chunk=cfg.grid_knn_chunk,
                quota=cfg.down_quota,
            )(feats, xyz, offsets,
              precomp=down_pre.pop(0) if down_pre else None, origin=anchor)
            cap_i = 1

        for i in range(cfg.layer_start, cfg.num_layers):
            feats = BasicLayer(cfg, i, name=f"layer_{i}")(
                feats, xyz, offsets, training=training,
                is_down_pre=(sd_pre.pop(0)["is_down"]
                             if sd_pre is not None else None),
                anchor=anchor)
            feats_stack.append(feats)
            xyz_stack.append(xyz)
            off_stack.append(offsets)
            grid_stack.append(cfg.grid_sizes()[i])
            if i < cfg.num_layers - 1:
                out_pad = _round_up(
                    int(xyz.shape[0] * cfg.ratio) + cfg.num_scenes, cfg.tile)
                feats, xyz, offsets, _ = TransitionDown(
                    cfg.channels[i + 1], ratio=cfg.ratio, k=cfg.k,
                    sampler=cfg.sampler,
                    grid_cell=cfg.grid_sizes()[i] * 2.0,
                    out_pad=out_pad, name=f"down_{i}",
                    knn_method=cfg.neighbor_method,
                    knn_cell=cfg.grid_sizes()[i] * 3.0,
                    knn_cap=cfg.neighbor_cap,
                    knn_chunk=cfg.grid_knn_chunk,
                    quota=cfg.down_quota,
                )(feats, xyz, offsets,
                  precomp=down_pre.pop(0) if down_pre else None,
                  origin=anchor)

        feats = feats_stack.pop()
        xyz = xyz_stack.pop()
        offsets = off_stack.pop()
        grid_stack.pop()
        up_idx = 0
        while feats_stack:
            # Coarse-level point spacing is ~2x the fine level's grid
            # (TransitionDown pools at grid_cell = 2 * stage grid); cell
            # 6x the fine grid covers the 3-NN radius with wide margin.
            fine_grid = grid_stack.pop()
            feats, xyz, offsets = Upsample(
                feats_stack[-1].shape[-1], name=f"up_{up_idx}",
                knn_method=cfg.neighbor_method,
                knn_cell=fine_grid * 6.0,
                knn_cap=cfg.neighbor_cap,
                knn_chunk=cfg.grid_knn_chunk,
            )(feats, xyz, offsets,
              feats_stack.pop(), xyz_stack.pop(), off_stack.pop(),
              precomp=up_pre.pop(0) if up_pre is not None else None,
              origin=anchor)
            up_idx += 1

        valid0 = sampling.offsets_to_valid(offsets, xyz.shape[0])
        # classifier head (reference :426-431)
        h = dense(cfg.channels[0], name="cls_fc1")(feats)
        h = MaskedBatchNorm(axis_name=cfg.bn_axis_name, name="cls_bn")(
            h, valid0, training=training)
        h = nn.relu(h)
        logits = dense(cfg.num_classes, name="cls_fc2")(h)

        shift = None
        if cfg.with_regressor:
            g = dense(cfg.channels[0], name="reg_fc1")(feats)
            g = MaskedBatchNorm(axis_name=cfg.bn_axis_name, name="reg_bn")(
                g, valid0, training=training)
            g = jnp.tanh(g) if cfg.activation == "Tanh" else nn.relu(g)
            shift = dense(3, name="reg_fc2")(g)
        return logits, shift
