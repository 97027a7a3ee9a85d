"""Model layer: Stratified Transformer and Swin3D baselines in flax.linen."""

from stratified_transformer_tpu.models.stratified import (  # noqa: F401
    Stratified,
    StratifiedConfig,
)
from stratified_transformer_tpu.models.swin3d import Swin3D  # noqa: F401
