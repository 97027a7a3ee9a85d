"""Core geometry / attention ops (jittable, static-shape, mask-based).

Each op has a pure-jnp implementation that serves as the correctness oracle
(mirroring the semantics of the reference CUDA kernels in
``/root/reference/lib/pointops2/src``) and, for the hot ones, a Pallas TPU
kernel under ``stratified_transformer_tpu.ops.pallas``.
"""

from stratified_transformer_tpu.ops.hashing import (  # noqa: F401
    window_cells,
    window_keys,
)
from stratified_transformer_tpu.ops.windows import (  # noqa: F401
    WindowPartition,
    partition_windows,
    sparse_key_table,
)
from stratified_transformer_tpu.ops.sampling import (  # noqa: F401
    counts_to_offsets,
    farthest_point_sampling,
    floor_ratio_counts,
    grid_pool_sampling,
    offsets_to_batch,
    offsets_to_valid,
)
from stratified_transformer_tpu.ops.plan import (  # noqa: F401
    AttentionPlan,
    build_attention_plan,
)
from stratified_transformer_tpu.ops.neighbors import (  # noqa: F401
    aggregation,
    grid_knn,
    knn,
    radius_neighbors,
    subtraction,
    three_nn_interpolate,
)
from stratified_transformer_tpu.ops.attention import (  # noqa: F401
    pair_attention_reference,
    stratified_attention,
)
from stratified_transformer_tpu.ops.legacy import (  # noqa: F401
    ball_query_dense,
    feature_distribute,
    feature_gather,
    gathering,
    grouping_dense,
    knn_dense,
    labelstat_and_ballquery,
    labelstat_ballrange,
    labelstat_idx,
)
