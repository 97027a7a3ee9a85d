"""Stratified Transformer, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
waldstein94/Stratified-Transformer (CVPR 2022 Stratified Transformer for 3D
point cloud segmentation, plus the fork's cuboid-decomposition offset head).

Design stance (NOT a port):
  * All shapes are static by construction. The reference's data-dependent
    ragged CSR pair lists (``index_0/index_1`` + ``index_0_offsets``/``n_max``,
    see reference ``model/stratified_transformer.py:309-317``) are replaced by
    a sort-by-window-key layout in which each window is a contiguous segment
    and attention is computed over a fixed-width band of the sorted order
    (block-diagonal masking), with fixed-capacity gathered tables for the
    stratified sparse (far) keys.
  * The four CUDA kernels of the reference attention chain
    (``attention_step1_v2`` -> ``dot_prod_with_idx_v3`` -> ``scatter_softmax``
    -> ``attention_step2_with_rel_pos_value_v2``) collapse into one fused
    windowed attention op with a joint online softmax, implemented in pure
    jnp (reference/oracle path) and as a Pallas TPU kernel (production path).
  * Parallelism is a ``jax.sharding.Mesh`` + ``pjit`` data-parallel design
    (gradient ``psum`` over ICI), replacing the reference's
    DDP/NCCL (reference ``train.py:88-105,152-161``).
"""

__version__ = "0.1.0"
