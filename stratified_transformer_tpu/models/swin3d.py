"""Swin3D: the vanilla fixed-window baseline (reference
``model/swin3d_transformer.py:364-453``).

The reference's Swin3D is the Stratified backbone without stratified sparse
keys: dense in-window pairs only, same RPE-table machinery (its quantized
window-relative indexing, ``swin3d_transformer.py:129-154``, is the same
``floor(rel / quant)`` binning the stratified model uses). In this framework
that is exactly `Stratified` with ``use_stratified=False``, so Swin3D is a
construction helper rather than a second code path.
"""

from __future__ import annotations

import dataclasses

from stratified_transformer_tpu.models.stratified import (
    Stratified,
    StratifiedConfig,
)


def Swin3D(cfg: StratifiedConfig) -> Stratified:
    """Build the fixed-window (non-stratified) baseline model."""
    cfg = dataclasses.replace(cfg, use_stratified=False)
    return Stratified(cfg)
