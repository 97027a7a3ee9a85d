"""EXECUTED full-model forward parity vs the reference torch model.

Runs ``/root/reference/model/stratified_transformer.py:398-502`` on CPU with
this repo's functional shims for its native deps (``ref_shims``: pointops2
torch implementations written from the CUDA kernel semantics, voxel_grid,
scatter_softmax, a functional KPConvLayer sharing this repo's deterministic
kernel dispositions), loads IDENTICAL weights into ``models/stratified.py``,
and asserts the two full-model forwards agree on every valid point.

This is the strongest accuracy-parity evidence producible without datasets:
every component — KPConv stem, stratified pair construction (both shift
parities via depth-2 stages), 4-op attention chain with cRPE q/k/v tables,
segment softmax, FPS TransitionDown + kNN max-pool, 3-NN Upsample,
classifier/regressor heads — executes end-to-end through BOTH frameworks on
the same inputs.

Determinism note: coordinates are drawn on a 1/64 grid so every pairwise
squared distance is EXACT in fp32 and fp64 — FPS/kNN argmax decisions are
then bit-identical across frameworks and ties resolve to the same (first)
index on both sides.
"""

import os
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ref_shims import load_ref  # noqa: E402

import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# weight porting: reference state_dict -> flax {params, batch_stats}
# ---------------------------------------------------------------------------

def _lin(sd, prefix, bias=True):
    d = {"kernel": jnp.asarray(sd[prefix + ".weight"].T)}
    if bias:
        d["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return d


def _ln(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = {"scale": jnp.asarray(sd[prefix + ".weight"]),
              "bias": jnp.asarray(sd[prefix + ".bias"])}
    stats = {"mean": jnp.asarray(sd[prefix + ".running_mean"]),
             "var": jnp.asarray(sd[prefix + ".running_var"])}
    return params, stats


def port_reference_weights(ref_model, cfg):
    """Map the reference ``Stratified`` state_dict onto our param tree."""
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    P, S = {}, {}

    # stem
    bn_p, bn_s = _bn(sd, "stem_layer.0.bn.batch_norm")
    P["stem_0"] = {
        "kpconv": {"kernel_weights":
                   jnp.asarray(sd["stem_layer.0.kpconv.weight"])},
        "bn": bn_p}
    S["stem_0"] = {"bn": bn_s}
    if not cfg.stem_transformer:
        b1p, b1s = _bn(sd, "stem_layer.1.unary_1.1.batch_norm")
        b2p, b2s = _bn(sd, "stem_layer.1.unary_2.1.batch_norm")
        P["stem_1"] = {
            "unary1": _lin(sd, "stem_layer.1.unary_1.0", bias=False),
            "bn1": b1p,
            "kpconv": {"kernel_weights":
                       jnp.asarray(sd["stem_layer.1.kpconv.weight"])},
            "unary2": _lin(sd, "stem_layer.1.unary_2.0", bias=False),
            "bn2": b2p}
        S["stem_1"] = {"bn1": b1s, "bn2": b2s}
        if "stem_layer.1.shortcut_op.0.weight" in sd:  # in_ch != out_ch
            scp, scs = _bn(sd, "stem_layer.1.shortcut_op.1.batch_norm")
            P["stem_1"]["shortcut"] = _lin(
                sd, "stem_layer.1.shortcut_op.0", bias=False)
            P["stem_1"]["bn_sc"] = scp
            S["stem_1"]["bn_sc"] = scs
        P["stem_down"] = {"norm": _ln(sd, "downsample.norm"),
                          "linear": _lin(sd, "downsample.linear", bias=False)}

    # encoder stages
    for j, i in enumerate(range(cfg.layer_start, cfg.num_layers)):
        blocks = {}
        for b in range(cfg.depths[i]):
            pre = f"layers.{j}.blocks.{b}"
            attn = {"qkv": _lin(sd, pre + ".attn.qkv"),
                    "proj": _lin(sd, pre + ".attn.proj")}
            if cfg.rel_query:
                attn["rel_query_table"] = jnp.asarray(
                    sd[pre + ".attn.relative_pos_query_table"])
            if cfg.rel_key:
                attn["rel_key_table"] = jnp.asarray(
                    sd[pre + ".attn.relative_pos_key_table"])
            if cfg.rel_value:
                attn["rel_value_table"] = jnp.asarray(
                    sd[pre + ".attn.relative_pos_value_table"])
            blocks[f"blocks_{b}"] = {
                "norm1": _ln(sd, pre + ".norm1"),
                "attn": attn,
                "norm2": _ln(sd, pre + ".norm2"),
                "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"),
                        "fc2": _lin(sd, pre + ".mlp.fc2")}}
        P[f"layer_{i}"] = blocks
        if i < cfg.num_layers - 1:
            P[f"down_{i}"] = {
                "norm": _ln(sd, f"layers.{j}.downsample.norm"),
                "linear": _lin(sd, f"layers.{j}.downsample.linear",
                               bias=False)}

    # decoder
    for j in range(cfg.num_layers - 1):
        P[f"up_{j}"] = {
            "norm1": _ln(sd, f"upsamples.{j}.linear1.0"),
            "linear1": _lin(sd, f"upsamples.{j}.linear1.1"),
            "norm2": _ln(sd, f"upsamples.{j}.linear2.0"),
            "linear2": _lin(sd, f"upsamples.{j}.linear2.1")}

    # heads
    cls_bn_p, cls_bn_s = _bn(sd, "classifier.1")
    P["cls_fc1"] = _lin(sd, "classifier.0")
    P["cls_bn"] = cls_bn_p
    P["cls_fc2"] = _lin(sd, "classifier.3")
    S["cls_bn"] = cls_bn_s
    if cfg.with_regressor:
        reg_bn_p, reg_bn_s = _bn(sd, "regressor.1")
        P["reg_fc1"] = _lin(sd, "regressor.0")
        P["reg_bn"] = reg_bn_p
        P["reg_fc2"] = _lin(sd, "regressor.3")
        S["reg_bn"] = reg_bn_s
    return {"params": P, "batch_stats": S}


def _randomize_(model, gen):
    """Give every parameter and BN running stat a nontrivial value so any
    porting slip (missed bias, wrong transpose, stats not carried) shows."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=gen))
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(0.05 * torch.randn(buf.shape, generator=gen))
            elif name.endswith("running_var"):
                buf.copy_(1.0 + 0.3 * torch.rand(buf.shape, generator=gen))


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

def _grid_cloud(rng, counts, span=48):
    """Scenes of points on a 1/64 grid (exact fp32/fp64 distances)."""
    xyz, colors = [], []
    for n in counts:
        xyz.append(rng.integers(0, span, (n, 3)).astype(np.float32) / 64.0)
        colors.append(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    xyz = np.concatenate(xyz)
    colors = np.concatenate(colors)
    offsets = np.cumsum(counts).astype(np.int32)
    return xyz, colors, offsets


def _stem_neighbors(xyz, offsets, radius, cap):
    """One shared radius-neighbor list for both frameworks (the reference
    computes this OUTSIDE the model, train.py:324-329, so it is a model
    input, not model semantics)."""
    n = len(xyz)
    batch = np.searchsorted(offsets, np.arange(n), side="right")
    idx = np.full((n, cap), n, np.int64)       # shadow = n (torch side)
    for i in range(n):
        cand = np.nonzero(batch == batch[i])[0]
        d2 = ((xyz[cand] - xyz[i]) ** 2).sum(-1)
        near = cand[np.argsort(d2, kind="stable")]
        near = near[d2[np.argsort(d2, kind="stable")] <= radius * radius]
        take = near[:cap]
        idx[i, :len(take)] = take
    return idx


def _run_reference(st, cfg, weights_gen, xyz, feats, offsets, nidx):
    ws = cfg.window_sizes()
    gs = cfg.grid_sizes()
    qs = cfg.quant_sizes()
    model = st.Stratified(
        cfg.downsample_scale, list(cfg.depths), list(cfg.channels),
        list(cfg.num_heads), ws, cfg.up_k, gs, qs,
        rel_query=cfg.rel_query, rel_key=cfg.rel_key,
        rel_value=cfg.rel_value, drop_path_rate=0.0,
        num_layers=cfg.num_layers, concat_xyz=cfg.concat_xyz,
        num_classes=cfg.num_classes, ratio=cfg.ratio, k=cfg.k,
        prev_grid_size=cfg.grid_size, sigma=cfg.sigma,
        stem_transformer=cfg.stem_transformer, activation=cfg.activation)
    _randomize_(model, weights_gen)
    model.eval()
    n = len(xyz)
    batch = torch.from_numpy(
        np.searchsorted(offsets, np.arange(n), side="right")).long()
    with torch.no_grad():
        out, shift = model(
            torch.from_numpy(feats), torch.from_numpy(xyz),
            torch.from_numpy(offsets.astype(np.int64)), batch,
            torch.from_numpy(nidx))
    return model, out.numpy(), shift.numpy()


def _run_ours(cfg, variables, xyz, feats, offsets, nidx):
    from stratified_transformer_tpu.models.stratified import Stratified
    n = len(xyz)
    n_pad = cfg.n_pad
    pad = n_pad - n
    xyz_p = np.pad(xyz, ((0, pad), (0, 0)), constant_values=1e6)
    feats_p = np.pad(feats, ((0, pad), (0, 0)))
    cap = nidx.shape[1]
    nmask = nidx < n
    nidx_p = np.where(nmask, nidx, np.arange(n)[:, None]).astype(np.int32)
    nidx_p = np.pad(nidx_p, ((0, pad), (0, 0)),
                    constant_values=0)
    nidx_p[n:] = np.arange(n, n_pad)[:, None]
    nmask_p = np.pad(nmask, ((0, pad), (0, 0)), constant_values=False)
    model = Stratified(cfg)
    logits, shift = model.apply(
        variables, jnp.asarray(feats_p), jnp.asarray(xyz_p),
        jnp.asarray(offsets.astype(np.int32)), training=False,
        stem_nidx=jnp.asarray(nidx_p), stem_nmask=jnp.asarray(nmask_p))
    return np.asarray(logits)[:n], (
        None if shift is None else np.asarray(shift)[:n])


def _full_parity(rng_seed, *, stem_transformer, with_regressor,
                 num_layers, depths, channels, heads, counts,
                 downsample_scale=8, k=16, atol=1e-4):
    from stratified_transformer_tpu.models.stratified import StratifiedConfig
    st = load_ref("model/stratified_transformer.py")
    rng = np.random.default_rng(rng_seed)
    gen = torch.Generator().manual_seed(rng_seed)

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6,
        channels=channels, depths=depths, num_heads=heads,
        num_layers=num_layers, window_size=4.0, patch_size=1.0,
        grid_size=0.04, quant_size=0.01,
        downsample_scale=downsample_scale,
        rel_query=True, rel_key=True, rel_value=True,
        drop_path_rate=0.0, concat_xyz=True,
        stem_transformer=stem_transformer, k=k,
        with_regressor=with_regressor,
        n_pad=448, num_scenes=len(counts), band=128, tile=64,
        sparse_cap=64, sampler="fps", attn_impl="reference",
        neighbor_method="brute",
        rpe_precision="highest", qk_precision="highest")

    xyz, colors, offsets = _grid_cloud(rng, counts)
    feats = np.concatenate([colors, xyz], 1)          # concat_xyz
    radius = 2.5 * cfg.grid_size * cfg.sigma
    nidx = _stem_neighbors(xyz, offsets, radius, cfg.max_num_neighbors)

    ref_model, ref_logits, ref_shift = _run_reference(
        st, cfg, gen, xyz, feats, offsets, nidx)
    variables = port_reference_weights(ref_model, cfg)
    logits, shift = _run_ours(cfg, variables, xyz, feats, offsets, nidx)

    err = np.abs(logits - ref_logits).max()
    scale = np.abs(ref_logits).max()
    assert err <= atol * max(scale, 1.0), (
        f"full-model logit mismatch: max|d|={err:.3e} "
        f"(ref scale {scale:.3e})")
    if with_regressor:
        errs = np.abs(shift - ref_shift).max()
        assert errs <= atol * max(np.abs(ref_shift).max(), 1.0), (
            f"regressor mismatch: max|d|={errs:.3e}")
    return err, scale


def test_full_model_parity_s3dis_style():
    """S3DIS architecture shape: stem_transformer=True, 2 stages of depth 2
    (both shift parities exercised), cRPE q/k/v, stratified sparse keys."""
    err, scale = _full_parity(
        11, stem_transformer=True, with_regressor=False,
        num_layers=2, depths=(2, 2), channels=(16, 32), heads=(2, 4),
        counts=[220, 180])
    print(f"s3dis-style full-model parity: max|d|={err:.2e} scale={scale:.2e}")


def test_full_model_parity_scannet_style():
    """ScanNet architecture shape: stem_transformer=False (KPConvRes stem +
    TransitionDown before stage 1), 3 levels, downsample_scale 4."""
    err, scale = _full_parity(
        13, stem_transformer=False, with_regressor=False,
        num_layers=3, depths=(1, 2, 2), channels=(16, 32, 32),
        heads=(2, 4, 4), counts=[260, 140], downsample_scale=4, k=8)
    print(f"scannet-style full-model parity: max|d|={err:.2e}")


def test_full_model_parity_swin3d():
    """Swin3D baseline (reference model/swin3d_transformer.py:364-453):
    fixed-window dense pairs, window-quantized RPE bins (u_i - u_j + qgl - 1
    over 2*qgl - 1 table rows), no stratified sparse keys."""
    from stratified_transformer_tpu.models.stratified import StratifiedConfig
    from stratified_transformer_tpu.models.swin3d import Swin3D
    sw = load_ref("model/swin3d_transformer.py")
    rng = np.random.default_rng(23)
    gen = torch.Generator().manual_seed(23)

    cfg = StratifiedConfig(
        num_classes=13, in_channels=6,
        channels=(16, 32), depths=(2, 2), num_heads=(2, 4),
        num_layers=2, window_size=4.0, patch_size=1.0,
        grid_size=0.04, quant_size=0.01,
        rel_query=True, rel_key=True, rel_value=True,
        drop_path_rate=0.0, concat_xyz=True,
        stem_transformer=True, k=16, with_regressor=False,
        n_pad=448, num_scenes=2, band=128, tile=64,
        sampler="fps", attn_impl="reference",
        neighbor_method="brute",
        rpe_precision="highest", qk_precision="highest")

    counts = [220, 180]
    xyz, colors, offsets = _grid_cloud(rng, counts)
    feats = np.concatenate([colors, xyz], 1)
    radius = 2.5 * cfg.grid_size * cfg.sigma
    nidx = _stem_neighbors(xyz, offsets, radius, cfg.max_num_neighbors)

    model = sw.Swin(
        list(cfg.depths), list(cfg.channels), list(cfg.num_heads),
        cfg.window_sizes(), cfg.up_k, cfg.grid_sizes(), cfg.quant_sizes(),
        rel_query=True, rel_key=True, rel_value=True, drop_path_rate=0.0,
        num_layers=cfg.num_layers, concat_xyz=True, num_classes=13,
        ratio=cfg.ratio, k=cfg.k, prev_grid_size=cfg.grid_size,
        sigma=cfg.sigma, stem_transformer=True)
    _randomize_(model, gen)
    model.eval()
    n = len(xyz)
    batch = torch.from_numpy(
        np.searchsorted(offsets, np.arange(n), side="right")).long()
    with torch.no_grad():
        ref_logits = model(
            torch.from_numpy(feats), torch.from_numpy(xyz),
            torch.from_numpy(offsets.astype(np.int64)), batch,
            torch.from_numpy(nidx)).numpy()

    variables = port_reference_weights(model, cfg)

    # our Swin3D = Stratified(use_stratified=False, rpe_mode="swin_window")
    # (the constructor applies the replace itself)
    n_pad = cfg.n_pad
    pad = n_pad - n
    xyz_p = np.pad(xyz, ((0, pad), (0, 0)), constant_values=1e6)
    feats_p = np.pad(feats, ((0, pad), (0, 0)))
    nmask = nidx < n
    nidx_p = np.where(nmask, nidx, np.arange(n)[:, None]).astype(np.int32)
    nidx_p = np.pad(nidx_p, ((0, pad), (0, 0)), constant_values=0)
    nidx_p[n:] = np.arange(n, n_pad)[:, None]
    nmask_p = np.pad(nmask, ((0, pad), (0, 0)), constant_values=False)
    logits, _ = Swin3D(cfg).apply(
        variables, jnp.asarray(feats_p), jnp.asarray(xyz_p),
        jnp.asarray(offsets.astype(np.int32)), training=False,
        stem_nidx=jnp.asarray(nidx_p), stem_nmask=jnp.asarray(nmask_p))
    logits = np.asarray(logits)[:n]

    err = np.abs(logits - ref_logits).max()
    assert err <= 1e-4 * max(np.abs(ref_logits).max(), 1.0), (
        f"swin3d full-model logit mismatch: max|d|={err:.3e}")
    print(f"swin3d full-model parity: max|d|={err:.2e}")


def test_full_model_parity_dcf_regressor():
    """DCF fork: offset-regressor head active (reference :433-443,485-487)."""
    err, scale = _full_parity(
        17, stem_transformer=True, with_regressor=True,
        num_layers=2, depths=(2, 1), channels=(16, 32), heads=(2, 4),
        counts=[200, 160])
    print(f"dcf-regressor full-model parity: max|d|={err:.2e}")
