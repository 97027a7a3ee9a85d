"""Host-side data pipeline: datasets, voxelization, augmentation, collation.

All numpy/CPU — feeds padded static-shape batches to the device pipeline.
"""

from stratified_transformer_tpu.data.collate import (  # noqa: F401
    PaddedBatch,
    collate_scenes,
)
