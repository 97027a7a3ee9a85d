"""Runtime truncation counters: how many attention pairs do the static
capacity caps actually drop on the CURRENT batch?

The TPU layout bounds three things with static capacities (reference
precedent: the 48-point window cap ``util/voxelize.py:38-42`` and
``n_max <= 1024`` ``lib/pointops2/functions/pointops.py:150``):

  * dense band — a query only sees keys within ``[tile_start - band,
    tile_end + band)`` of the sorted order (``ops/attention.py``);
  * sparse band — a query tile reads one contiguous ``s_band``-wide aux
    window of far keys (``ops/attention.py sparse_band_triple``);
  * sparse_cap / aux_pad — at most ``sparse_cap`` downsampled members per
    large window survive into the aux array (``ops/plan.py``).

These were audited OFFLINE at one synthetic operating point
(docs/PERF_NOTES.md); this module makes the drop fractions a TRAINING-LOG
metric so a real-data density shift can't silently eat pairs. ``train.py``
calls `audit_truncation` every ``print_freq`` iterations (config key
``truncation_audit``, default on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stratified_transformer_tpu.ops import sampling
from stratified_transformer_tpu.ops.plan import build_attention_plan


def _dense_band_drops(plan, band, tile):
    """Dropped / total in-window dense pairs under the band layout."""
    n = plan.seg_start.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    t0 = (pos // tile) * tile
    lo = t0 - band
    hi = t0 + tile + band
    s, e = plan.seg_start, plan.seg_end
    vis = jnp.maximum(
        0, jnp.minimum(e, hi) - jnp.maximum(s, lo))
    tot = jnp.maximum(e - s, 0)
    v = plan.valid_sorted
    dropped = jnp.sum(jnp.where(v, tot - vis, 0))
    total = jnp.sum(jnp.where(v, tot, 0))
    return dropped, total


def _sparse_band_drops(plan, s_band, tile):
    """Dropped / total far-key pairs under the s_band aux window (mirrors
    the tile base arithmetic of ``sparse_band_triple`` /
    ``ops/pallas/fused_attention.sparse_band_attention``)."""
    sb = plan.sparse_band
    a_sz = sb.sb_src.shape[0]
    ws_band = min(s_band, a_sz)
    ks = sb.sb_start.reshape(-1, tile)
    ke = sb.sb_end.reshape(-1, tile)
    base = (jnp.minimum(ks[:, 0], a_sz - ws_band) // 16) * 16  # [T]
    lo = base[:, None]
    hi = (base + ws_band)[:, None]
    vis = jnp.maximum(0, jnp.minimum(ke, hi) - jnp.maximum(ks, lo))
    tot = jnp.maximum(ke - ks, 0)
    v = sb.valid_lw.reshape(-1, tile)
    dropped = jnp.sum(jnp.where(v, tot - vis, 0))
    total = jnp.sum(jnp.where(v, tot, 0))
    return dropped, total


def _stage_stats(xyz, offsets, is_down, *, ws, band, tile, s_band,
                 sparse_cap, aux_pad):
    n = xyz.shape[0]
    batch = sampling.offsets_to_batch(offsets, n)
    valid = sampling.offsets_to_valid(offsets, n)
    db = dt = sb_d = sb_t = jnp.int32(0)
    kept = jnp.int32(0)
    for parity in (0, 1):
        plan = build_attention_plan(
            xyz, batch, valid, ws, shifted=bool(parity),
            is_down=is_down, sparse_cap=sparse_cap, aux_pad=aux_pad)
        d, t = _dense_band_drops(plan, band, tile)
        db, dt = db + d, dt + t
        d, t = _sparse_band_drops(plan, s_band, tile)
        sb_d, sb_t = sb_d + d, sb_t + t
        kept = kept + jnp.sum(plan.sparse_band.sb_valid)
    members = 2 * jnp.sum(is_down & valid)
    return {"band_dropped": db, "band_total": dt,
            "sband_dropped": sb_d, "sband_total": sb_t,
            "cap_dropped": members - kept, "cap_total": members}


@functools.partial(jax.jit, static_argnames=("mcfg",))
def audit_truncation(mcfg, batch):
    """Per-stage truncation counters for one (host-pyramid) batch.

    Returns {stage_i: {band_dropped, band_total, sband_dropped,
    sband_total, cap_dropped, cap_total}} of int32 scalars. Requires
    ``batch["pyramid"]`` (the training loader supplies it when
    ``host_pyramid: true``, the default).
    """
    cfg = mcfg
    if not cfg.use_stratified:
        return {}
    pyramid = batch["pyramid"]
    xyz = jnp.asarray(batch["xyz"])
    offsets = jnp.asarray(batch["offsets"])

    # level coordinates, mirroring Stratified.__call__'s TransitionDown
    # chain (stage levels are the pyramid's "down" entries)
    levels = [(xyz, offsets)]
    for lvl in pyramid["down"]:
        idx = jnp.asarray(lvl["idx"], jnp.int32)
        levels.append((levels[-1][0][idx],
                       jnp.asarray(lvl["offsets"], jnp.int32)))

    out = {}
    lvl_i = 1 if not cfg.stem_transformer else 0
    for si, i in enumerate(range(cfg.layer_start, cfg.num_layers)):
        lx, loff = levels[lvl_i]
        is_down = jnp.asarray(pyramid["stage_down"][si]["is_down"])
        band = (cfg.band_per_stage[i]
                if cfg.band_per_stage is not None else cfg.band)
        n_lvl = lx.shape[0]
        d_pad = n_lvl // cfg.downsample_scale + cfg.num_scenes
        aux_pad = ((d_pad + 127) // 128) * 128
        out[f"stage_{i}"] = _stage_stats(
            lx, loff, is_down, ws=cfg.window_sizes()[i], band=band,
            tile=cfg.tile, s_band=cfg.s_band, sparse_cap=cfg.sparse_cap,
            aux_pad=aux_pad)
        lvl_i += 1
    return out


_FIELDS = ("band_dropped", "band_total", "sband_dropped", "sband_total",
           "cap_dropped", "cap_total")


@functools.partial(jax.jit, static_argnames=("mcfg",))
def audit_truncation_packed(mcfg, batch):
    """`audit_truncation` with the counters packed into ONE int32 array
    ``[n_stages, 6]`` (field order ``_FIELDS``, stages sorted by name).

    One array = one host transfer. The dict-of-scalars form costs 24
    separate device->host round trips at harvest time — ~0.5 s/line over
    the tunneled axon runtime (measured r4), which was most of the round-3
    wall-cadence mystery.
    """
    stats = audit_truncation(mcfg, batch)
    keys = sorted(stats)
    return jnp.stack([
        jnp.stack([stats[k][f] for f in _FIELDS]) for k in keys])


def unpack_truncation(mcfg, arr):
    """numpy ``[n_stages, 6]`` -> the `audit_truncation` dict shape."""
    keys = [f"stage_{i}" for i in range(mcfg.layer_start, mcfg.num_layers)]
    return {k: {f: int(arr[si, fi]) for fi, f in enumerate(_FIELDS)}
            for si, k in enumerate(sorted(keys))}


def format_truncation(stats) -> str:
    """One log line: per-stage drop fractions (b=band, s=s_band window,
    c=sparse_cap members)."""
    parts = []
    for k in sorted(stats):
        s = stats[k]
        def frac(d, t):
            d, t = int(d), int(t)
            return d / t if t else 0.0
        parts.append(
            f"{k.replace('stage_', 's')}: "
            f"b={frac(s['band_dropped'], s['band_total']):.4f} "
            f"s={frac(s['sband_dropped'], s['sband_total']):.4f} "
            f"c={frac(s['cap_dropped'], s['cap_total']):.4f}")
    return "pair-drop fractions [" + "; ".join(parts) + "]"
