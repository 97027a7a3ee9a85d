"""Debug: isolate which cRPE term diverges between jnp and Pallas sparse."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from stratified_transformer_tpu.ops import attention as A
from stratified_transformer_tpu.ops import plan as P
from stratified_transformer_tpu.ops import sampling as S
from stratified_transformer_tpu.ops.pallas.fused_attention import (
    sparse_band_attention)
from __graft_entry__ import _example_batch

n = 2048
h, d = 3, 16
ws, qs = 0.16, 0.01
scale = d ** -0.5
b = _example_batch(n, 2, 6, seed=0)
xyz = jnp.asarray(b.xyz)
offsets = jnp.asarray(b.offsets)
batch_ids = S.offsets_to_batch(offsets, n)
valid = S.offsets_to_valid(offsets, n)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
nbins = 2 * int((2 * ws + 1e-4) // qs)
tabs = [jnp.asarray(rng.normal(size=(nbins, h, d, 3)).astype(np.float32) * .02)
        for _ in range(3)]

def build():
    counts = offsets - jnp.concatenate(
        [jnp.zeros((1,), offsets.dtype), offsets[:-1]])
    d_counts = S.floor_ratio_counts(counts, 1.0 / 8)
    d_offsets = S.counts_to_offsets(d_counts)
    d_pad = n // 8 + 2
    d_idx, d_valid = S.grid_pool_sampling(
        xyz, offsets, d_offsets, d_pad, 0.04 * 8 ** 0.5)
    is_down = jnp.zeros((n,), bool).at[d_idx].set(d_valid, mode="drop")
    aux_pad = ((d_pad + 127) // 128) * 128
    return P.build_attention_plan(
        xyz, batch_ids, valid, ws, shifted=False, is_down=is_down,
        sparse_cap=48, aux_pad=aux_pad)

plan = jax.jit(build)()
sb = plan.sparse_band

def norm(o3):
    acc, m, den = o3
    return np.asarray(acc) / np.maximum(np.asarray(den), 1e-20)[:, :, None]

for name, (tq, tk, tv) in {
    "none": (None, None, None),
    "qk": (tabs[0], tabs[1], None),  # model asserts rel_q & rel_k together
    "qkv": (tabs[0], tabs[1], tabs[2]),
}.items():
    oj = jax.jit(lambda q, k, v: A.sparse_band_triple(
        q, k, v, plan.xyz_sorted, sb, table_q=tq, table_k=tk, table_v=tv,
        window_size=ws, quant_size=qs, scale=scale, s_band=128,
        tile=128))(q, k, v)
    op = jax.jit(lambda q, k, v: sparse_band_attention(
        q, k, v, sb, table_q=tq, table_k=tk, table_v=tv,
        window_size=ws, quant_size=qs, scale=scale, s_band=128,
        tile=128, w_chunk=64))(q, k, v)
    a, bb = norm(oj), norm(op)
    err = np.abs(a - bb).max() / (np.abs(a).max() + 1e-9)
    # also compare denominators and maxima
    derr = np.abs(np.asarray(oj[2]) - np.asarray(op[2])).max()
    merr = np.abs(np.asarray(oj[1]) - np.asarray(op[1])).max()
    nbad = int((np.abs(a - bb).max(axis=(1, 2)) >
                1e-4 * np.abs(a).max()).sum())
    print(f"{name}: out-err {err:.2e} den-err {derr:.2e} "
          f"m-err {merr:.2e} bad-rows {nbad}/{n}")

# span statistics per tile
ks = np.asarray(sb.sb_start).reshape(-1, 128)
ke = np.asarray(sb.sb_end).reshape(-1, 128)
span = ke.max(axis=1) - ks.min(axis=1)
print(f"n={n}: tile spans min/mean/max = {span.min()}/{span.mean():.1f}/"
      f"{span.max()}  (window 128, align slack 15)")
