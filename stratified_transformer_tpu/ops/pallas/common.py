"""Shared Mosaic-safe building blocks for the fused attention kernels.

The four kernels (band/sparse x fwd/bwd) quantize relative positions and
build gather indices / one-hots identically; keeping the bin math in ONE
place guards the reference-parity constants (1e-5 rounding, the -1e-4
epsilon, the band-slice shift — ``model/stratified_transformer.py:186-190``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rel_bins_chunk(
    x_t,          # [T, 128] query rows (xyz in cols 0..2)
    xc,           # [Wc, 128] key-chunk rows (xyz in cols 0..2)
    *,
    tile,
    w_chunk,
    num_bins,          # table rows available (band slice or full range)
    bin_lo,            # first table row's bin (0 for the full range)
    num_bins_full,     # full quantized range (2 * quant_grid_length)
    window_size,
    quant_size,
    xq,                # gather width, query side (>= max(w_chunk, num_bins))
    xk,                # gather width, key side (>= max(tile, num_bins))
    with_onehot,       # build [T, L, Wc] bins-major one-hots
):
    """Per-axis quantized relative-position machinery for one key chunk.

    Returns ``(ridxs, ridxs_tp, onehots)``:
      ridxs:    3 x [T, xq] int32 — bin per (query, key), padded for the
                query-side ``take_along_axis`` gather;
      ridxs_tp: 3 x [Wc, xk] int32 — transposed layout for the key-side
                gather;
      onehots:  3 x [T, num_bins, Wc] f32 (empty list unless requested).

    Bin formula (reference-exact): round coords' difference to 1e-5, then
    ``floor((rel + 2*window - 1e-4) / quant)``, clipped to the full range,
    then shifted into the table slice (exact for in-slice pairs; out-of-
    slice pairs are the masked ones).
    """
    ridxs, ridxs_tp, onehots = [], [], []
    bins_t = None
    if with_onehot:
        bins_t = jax.lax.broadcasted_iota(
            jnp.int32, (tile, num_bins, w_chunk), 1)
    # Division-free bin math. TPU has no native fp32 divide; Mosaic and
    # XLA lower it with DIFFERENT reciprocal-refinement sequences, so
    # `(rel + c) / quant` flips bins at exact quantization boundaries
    # between the fused kernels and the jnp path (measured: 76/65536 on a
    # boundary-dense sweep, tools/bin_math_probe.py) — and real stage-2
    # data (grid-pool representatives) lives ON those boundaries. fp32
    # multiply/add are correctly rounded on every backend, so a shared
    # reciprocal constant makes all paths bit-identical.
    inv_1e5 = jnp.float32(1e-5)
    inv_qs = jnp.float32(1.0 / float(quant_size))
    for a in range(3):
        rel_a = x_t[:, a:a + 1] - jnp.transpose(xc[:, a:a + 1], (1, 0))
        rel_a = jnp.round(rel_a * 1e5) * inv_1e5
        ridx_a = jnp.floor(
            (rel_a + jnp.float32(2.0 * window_size - 1e-4)) * inv_qs)
        ridx_a = jnp.clip(ridx_a, 0, num_bins_full - 1)
        ridx_a = jnp.clip(
            ridx_a - bin_lo, 0, num_bins - 1).astype(jnp.int32)
        ridxs.append(jnp.pad(ridx_a, ((0, 0), (0, xq - w_chunk))))
        ridxs_tp.append(jnp.pad(
            jnp.transpose(ridx_a, (1, 0)), ((0, 0), (0, xk - tile))))
        if with_onehot:
            onehots.append(
                (ridx_a[:, None, :] == bins_t).astype(jnp.float32))
    return ridxs, ridxs_tp, onehots


def dynamic_chunk_bounds(starts, ends, val_t, origin, w_chunk, n_chunks):
    """[c_start, c_end) chunk range covering the union of valid segments.

    ``starts``/``ends`` are [T, 1] absolute positions, ``origin`` the
    buffer's absolute position 0 (``t0 - band`` for the band kernels, the
    DMA ``base`` for the sparse kernels).
    """
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    sv = jnp.where(val_t > 0, starts, big)
    ev = jnp.where(val_t > 0, ends, 0)
    lo = jnp.min(sv) - origin
    hi = jnp.max(ev) - origin
    c_start = jnp.clip(lo // w_chunk, 0, n_chunks)
    c_end = jnp.clip((hi + w_chunk - 1) // w_chunk, c_start, n_chunks)
    return c_start, c_end
