"""Swin3D: the vanilla fixed-window baseline (reference
``model/swin3d_transformer.py:364-453``).

The reference's Swin3D is the Stratified backbone without stratified sparse
keys (dense in-window pairs only) and with its OWN RPE indexing scheme:
per-point *window-quantized* positions ``u = floor(((xyz - min + shift) %
window) / quant)`` with bins ``u_i - u_j + qgl - 1`` over ``2*qgl - 1`` table
rows (``swin3d_transformer.py:109-118,129-154``) — distinct from the
stratified model's continuous-coordinate ±2·window binning. In this framework
that is `Stratified` with ``use_stratified=False, rpe_mode="swin_window"``,
so Swin3D is a construction helper rather than a second code path.
"""

from __future__ import annotations

import dataclasses

from stratified_transformer_tpu.models.stratified import (
    Stratified,
    StratifiedConfig,
)


def Swin3D(cfg: StratifiedConfig, rpe_mode: str = "swin_window") -> Stratified:
    """Build the fixed-window (non-stratified) baseline model."""
    cfg = dataclasses.replace(cfg, use_stratified=False, rpe_mode=rpe_mode)
    return Stratified(cfg)
