"""Load modules from the READ-ONLY reference repo (/root/reference) for
cross-framework parity testing.

The reference's pure-PyTorch/numpy pieces (``get_indice_pairs``,
``util/transform.py``, ``util/voxelize.py``, ``util/lr.py``,
``util/evaluation.py``, ``util/train_utils.py``) are executable on CPU once
their CUDA-only / uninstalled dependencies are stubbed:

  * ``torch_geometric.nn.voxel_grid``  -> faithful numpy/torch shim
    (grouping by (batch, floor((pos - start) / size)) — the only property
    downstream code depends on);
  * ``torch_scatter.scatter_softmax``  -> small torch implementation;
  * ``timm`` DropPath / trunc_normal_  -> torch equivalents;
  * ``torch_points3d`` KPConvLayer / FastBatchNorm1d -> import-only stubs;
  * ``lib.pointops2.functions.pointops`` -> import-only stub;
  * ``open3d`` -> numpy PointCloud with faithful ``voxel_down_sample``
    (per-voxel centroid) and ``remove_radius_outlier`` (keep points with
    >= nb_points neighbours within radius, self included — Open3D
    semantics);
  * ``skimage`` -> import-only stub;
  * ``torch.Tensor.cuda`` -> identity (CPU execution).

Nothing here copies reference code — it only executes it as an oracle.
"""

from __future__ import annotations

import collections
import collections.abc
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"

_loaded = {}


def _install_stubs():
    if "torch_geometric" in sys.modules:
        return

    # --- torch_geometric.nn.voxel_grid ------------------------------------
    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")

    def voxel_grid(pos, batch, size, start=None, end=None):
        pos = pos.detach().cpu()
        batch = torch.as_tensor(batch).cpu().to(torch.int64)
        size_t = torch.as_tensor(size, dtype=pos.dtype).reshape(-1)
        if size_t.numel() == 1:
            size_t = size_t.repeat(pos.shape[1])
        if start is None:
            start_t = pos.min(0)[0]
        else:
            start_t = torch.as_tensor(start, dtype=pos.dtype).reshape(-1)
        cells = torch.floor((pos - start_t) / size_t).to(torch.int64)
        rows = torch.cat([batch[:, None], cells], dim=1).numpy()
        _, inverse = np.unique(rows, axis=0, return_inverse=True)
        return torch.from_numpy(inverse.astype(np.int64))

    tg_nn.voxel_grid = voxel_grid
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn

    # --- torch_scatter -----------------------------------------------------
    ts = types.ModuleType("torch_scatter")

    def scatter_softmax(src, index, dim=0):
        assert dim == 0
        n = int(index.max().item()) + 1 if index.numel() else 0
        shape = (n,) + src.shape[1:]
        idx = index.reshape(-1, *([1] * (src.dim() - 1))).expand_as(src)
        mx = torch.full(shape, -1e30, dtype=src.dtype).scatter_reduce(
            0, idx, src, reduce="amax", include_self=True)
        ex = torch.exp(src - mx.gather(0, idx))
        den = torch.zeros(shape, dtype=src.dtype).scatter_add(0, idx, ex)
        return ex / den.gather(0, idx)

    ts.scatter_softmax = scatter_softmax
    sys.modules["torch_scatter"] = ts

    # --- timm ---------------------------------------------------------------
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.dim() - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    # --- torch_points3d ------------------------------------------------------
    tp3d = types.ModuleType("torch_points3d")
    tp3d_mod = types.ModuleType("torch_points3d.modules")
    tp3d_kp = types.ModuleType("torch_points3d.modules.KPConv")
    tp3d_kernels = types.ModuleType("torch_points3d.modules.KPConv.kernels")
    tp3d_core = types.ModuleType("torch_points3d.core")
    tp3d_common = types.ModuleType("torch_points3d.core.common_modules")

    class KPConvLayer(torch.nn.Module):
        """Functional CPU stand-in for torch_points3d's KPConvLayer:
        15 kernel points in a ball of radius 1.5 * point_influence,
        linear influence max(0, 1 - d / point_influence), "sum"
        aggregation, one (in, out) weight matrix per kernel point.

        Kernel dispositions come from this repo's deterministic
        `generate_kernel_points` so the reference model and the JAX model
        share identical kernel geometry in full-model parity tests (the
        disposition is a constant, not a learned weight)."""

        _INFLUENCE_TO_RADIUS = 1.5

        def __init__(self, num_inputs=None, num_outputs=None,
                     point_influence=None, add_one=False, **k):
            super().__init__()
            self.point_influence = point_influence
            if num_inputs is None or point_influence is None:
                return  # import-only usage
            import os
            import sys as _sys
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if repo not in _sys.path:
                _sys.path.insert(0, repo)
            from stratified_transformer_tpu.models.kpconv import (
                generate_kernel_points)
            kp = generate_kernel_points(
                self._INFLUENCE_TO_RADIUS * point_influence, 15)
            self.register_buffer("kernel_points", torch.from_numpy(kp))
            self.weight = torch.nn.Parameter(
                torch.zeros(15, num_inputs, num_outputs))

        def forward(self, query_points, support_points, neighbors, x):
            n = support_points.shape[0]
            nb = neighbors.long()
            shadow = (nb < 0) | (nb >= n)   # ball_query pad conventions
            nb = nb.clamp(0, n - 1)
            diff = support_points[nb] - query_points[:, None, :]  # [N,K,3]
            d = torch.linalg.norm(
                diff[:, :, None, :] - self.kernel_points[None, None],
                dim=-1)                                            # [N,K,P]
            infl = torch.clamp(1.0 - d / self.point_influence, min=0.0)
            infl = torch.where(shadow[:, :, None], torch.zeros(()), infl)
            gathered = torch.where(shadow[:, :, None], torch.zeros(()),
                                   x[nb])                          # [N,K,C]
            per_kernel = torch.einsum("nkp,nkc->npc", infl, gathered)
            return torch.einsum("npc,pco->no", per_kernel, self.weight)

    class FastBatchNorm1d(torch.nn.Module):
        def __init__(self, num_features, momentum=0.1, **k):
            super().__init__()
            self.batch_norm = torch.nn.BatchNorm1d(
                num_features, momentum=momentum)

        def forward(self, x):
            return self.batch_norm(x)

    tp3d_kernels.KPConvLayer = KPConvLayer
    tp3d_common.FastBatchNorm1d = FastBatchNorm1d
    tp3d.modules = tp3d_mod
    tp3d_mod.KPConv = tp3d_kp
    tp3d_kp.kernels = tp3d_kernels
    tp3d.core = tp3d_core
    tp3d_core.common_modules = tp3d_common
    for name, mod in [
        ("torch_points3d", tp3d),
        ("torch_points3d.modules", tp3d_mod),
        ("torch_points3d.modules.KPConv", tp3d_kp),
        ("torch_points3d.modules.KPConv.kernels", tp3d_kernels),
        ("torch_points3d.core", tp3d_core),
        ("torch_points3d.core.common_modules", tp3d_common),
    ]:
        sys.modules[name] = mod

    # --- lib.pointops2.functions.pointops (FUNCTIONAL torch shims) ----------
    # Real CPU implementations of every pointops2 op the models call,
    # written from the kernel semantics (lib/pointops2/src/* — the v1
    # "naive" kernels are the spec) so the reference MODEL executes
    # end-to-end on CPU. Forward-only (parity tests diff logits).
    lib = types.ModuleType("lib")
    lib_p2 = types.ModuleType("lib.pointops2")
    lib_fn = types.ModuleType("lib.pointops2.functions")
    lib_po = types.ModuleType("lib.pointops2.functions.pointops")

    def _i0_from_offsets(index_0_offsets):
        off = index_0_offsets.long()
        counts = off[1:] - off[:-1]
        return torch.repeat_interleave(
            torch.arange(counts.numel(), dtype=torch.long), counts)

    def _offsets_to_batch(offset, n):
        offset = torch.as_tensor(offset, dtype=torch.long)
        counts = offset.clone()
        counts[1:] = offset[1:] - offset[:-1]
        return torch.repeat_interleave(
            torch.arange(offset.numel(), dtype=torch.long), counts)[:n]

    def furthestsampling(xyz, offset, new_offset):
        # src/sampling/sampling_cuda_kernel.cu:14-129 — per-scene exact
        # FPS, first point of the segment seeds.
        xyz_np = xyz.detach().cpu().double().numpy()
        offset = torch.as_tensor(offset, dtype=torch.long).tolist()
        new_offset = torch.as_tensor(new_offset, dtype=torch.long).tolist()
        out = []
        prev, nprev = 0, 0
        for b in range(len(offset)):
            lo, hi = prev, offset[b]
            m = new_offset[b] - nprev
            pts = xyz_np[lo:hi]
            sel = [0]
            mind = np.full(hi - lo, 1e10)
            for _ in range(1, m):
                mind = np.minimum(
                    mind, ((pts - pts[sel[-1]]) ** 2).sum(-1))
                sel.append(int(np.argmax(mind)))
            out.extend(lo + s for s in sel[:m])
            prev, nprev = offset[b], new_offset[b]
        return torch.tensor(out, dtype=torch.int32)

    def knnquery(nsample, xyz, new_xyz, offset, new_offset):
        # src/knnquery/knnquery_cuda_kernel.cu:65-108 — exact KNN within
        # the query's batch segment, ascending by distance; returns
        # (idx [m,k] int32, dist [m,k] = sqrt(d2)) per the wrapper.
        if new_xyz is None:
            new_xyz = xyz
        rx = xyz.detach().cpu().double().numpy()
        qx = new_xyz.detach().cpu().double().numpy()
        rb = _offsets_to_batch(offset, len(rx)).numpy()
        qb = _offsets_to_batch(new_offset, len(qx)).numpy()
        m = len(qx)
        idx = np.zeros((m, nsample), np.int64)
        d2 = np.zeros((m, nsample), np.float64)
        for i in range(m):
            cand = np.nonzero(rb == qb[i])[0]
            dd = ((rx[cand] - qx[i]) ** 2).sum(-1)
            o = np.argsort(dd, kind="stable")[:nsample]
            take = cand[o]
            nn_ = len(take)
            idx[i, :nn_] = take
            d2[i, :nn_] = dd[o]
            if nn_ < nsample:
                idx[i, nn_:] = take[0] if nn_ else 0
                d2[i, nn_:] = d2[i, nn_ - 1] if nn_ else 0.0
        return (torch.from_numpy(idx.astype(np.int32)),
                torch.sqrt(torch.from_numpy(d2).float()))

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                      use_xyz=True):
        # functions/pointops.py:648-675 semantics.
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            idx, _ = knnquery(nsample, xyz, new_xyz, offset, new_offset)
        grouped = feat[idx.long()]                      # (m, k, c)
        if use_xyz:
            gxyz = xyz[idx.long()] - new_xyz.unsqueeze(1)
            return torch.cat([gxyz, grouped], dim=-1)
        return grouped

    def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
        # functions/pointops.py:756-770: inverse-distance 3-NN.
        idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / recip.sum(dim=1, keepdim=True)
        out = torch.zeros(new_xyz.shape[0], feat.shape[1],
                          dtype=feat.dtype)
        for i in range(k):
            out += feat[idx[:, i].long()] * weight[:, i].unsqueeze(-1)
        return out

    def attention_step1_v2(query, key, index_1, index_0_offsets, n_max):
        # attn[m, h] = q[i0(m)] . k[i1(m)] over head_dim
        # (src/attention_v2/attention_cuda_kernel_v2.cu:8-50).
        i0 = _i0_from_offsets(index_0_offsets)
        return (query[i0] * key[index_1.long()]).sum(-1)

    def dot_prod_with_idx_v3(query, index_0_offsets, n_max, key, index_1,
                             table_q, table_k, rel_idx):
        # bias[m,h] = sum_a q[i0].T_q[rel[m,a],:,:,a] + k[i1].T_k[...]
        # (src/attention_v2/..._v2.cu dot_prod_with_idx_v3 :248-283).
        i0 = _i0_from_offsets(index_0_offsets)
        i1 = index_1.long()
        ridx = rel_idx.long()
        out = torch.zeros(i0.numel(), query.shape[1], dtype=query.dtype)
        for a in range(3):
            out += (query[i0] * table_q[ridx[:, a], :, :, a]).sum(-1)
            out += (key[i1] * table_k[ridx[:, a], :, :, a]).sum(-1)
        return out

    def dot_prod_with_idx(query, index, table, rel_idx):
        idx = index.long()
        ridx = rel_idx.long()
        out = torch.zeros(idx.numel(), query.shape[1], dtype=query.dtype)
        for a in range(3):
            out += (query[idx] * table[ridx[:, a], :, :, a]).sum(-1)
        return out

    def attention_step2(attn, value, index_0, index_1):
        # out[i0] += attn[m] * v[i1] (src/attention/attention_cuda_kernel.cu).
        out = torch.zeros_like(value)
        out.index_add_(0, index_0.long(),
                       attn.unsqueeze(-1) * value[index_1.long()])
        return out

    def attention_step2_with_rel_pos_value_v2(attn, value, index_0_offsets,
                                              n_max, index_1, table_v,
                                              rel_idx):
        # out[i0] += attn[m] * (v[i1] + sum_a T_v[rel[m,a],:,:,a])
        # (src/attention_v2/..._v2.cu :397-438).
        i0 = _i0_from_offsets(index_0_offsets)
        ridx = rel_idx.long()
        vals = value[index_1.long()]
        for a in range(3):
            vals = vals + table_v[ridx[:, a], :, :, a]
        out = torch.zeros_like(value)
        out.index_add_(0, i0, attn.unsqueeze(-1) * vals)
        return out

    for fn in (furthestsampling, knnquery, queryandgroup, interpolation,
               attention_step1_v2, dot_prod_with_idx_v3, dot_prod_with_idx,
               attention_step2, attention_step2_with_rel_pos_value_v2):
        setattr(lib_po, fn.__name__, fn)

    lib.pointops2 = lib_p2
    lib_p2.functions = lib_fn
    lib_fn.pointops = lib_po
    for name, mod in [("lib", lib), ("lib.pointops2", lib_p2),
                      ("lib.pointops2.functions", lib_fn),
                      ("lib.pointops2.functions.pointops", lib_po)]:
        sys.modules[name] = mod

    # --- open3d ---------------------------------------------------------------
    o3d = types.ModuleType("open3d")
    o3d_geom = types.ModuleType("open3d.geometry")
    o3d_util = types.ModuleType("open3d.utility")

    def Vector3dVector(arr):
        return np.asarray(arr, np.float64)

    class PointCloud:
        def __init__(self):
            self.points = np.zeros((0, 3))

        def voxel_down_sample(self, voxel_size):
            # Open3D: per-voxel centroid, voxel = floor((p - min) / size)
            pts = np.asarray(self.points)
            out = PointCloud()
            if len(pts) == 0:
                return out
            keys = np.floor((pts - pts.min(0)) / voxel_size).astype(np.int64)
            uniq, inv = np.unique(keys, axis=0, return_inverse=True)
            sums = np.zeros((len(uniq), 3))
            np.add.at(sums, inv, pts)
            counts = np.bincount(inv, minlength=len(uniq))
            out.points = sums / counts[:, None]
            return out

        def remove_radius_outlier(self, nb_points, radius):
            # Open3D: keep points with >= nb_points neighbours within
            # radius (the query point itself counts).
            pts = np.asarray(self.points)
            if len(pts) == 0:
                return self, np.zeros(0, np.int64)
            d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
            cnt = (d <= radius * radius).sum(1)
            ind = np.nonzero(cnt >= nb_points)[0]
            cl = PointCloud()
            cl.points = pts[ind]
            return cl, ind

    o3d_geom.PointCloud = PointCloud
    o3d_util.Vector3dVector = Vector3dVector
    o3d.geometry = o3d_geom
    o3d.utility = o3d_util
    sys.modules["open3d"] = o3d
    sys.modules["open3d.geometry"] = o3d_geom
    sys.modules["open3d.utility"] = o3d_util

    # --- skimage (import-only) -------------------------------------------------
    sk = types.ModuleType("skimage")
    sk_tf = types.ModuleType("skimage.transform")
    sk.transform = sk_tf
    sys.modules["skimage"] = sk
    sys.modules["skimage.transform"] = sk_tf

    # --- SharedArray (import-only; the sa_create/attach shm cache is
    # commented out in the reference loaders) -------------------------------
    sa = types.ModuleType("SharedArray")
    sys.modules["SharedArray"] = sa

    # --- plyfile: minimal ASCII reader sufficient for the reference's
    # prepare_data_inst.py (`PlyData().read(fn)`, `f.elements[0]` rows,
    # `f.elements[0]['label']`) ---------------------------------------------
    plyfile_mod = types.ModuleType("plyfile")

    class _PlyElement:
        def __init__(self, names, rows):
            self._names = names
            self._rows = rows

        def __iter__(self):
            return iter(self._rows)

        def __getitem__(self, prop):
            j = self._names.index(prop)
            return np.asarray([r[j] for r in self._rows])

    class PlyData:
        def __init__(self):
            self.elements = []

        def read(self, path):
            with open(path) as f:
                assert f.readline().strip() == "ply"
                n = 0
                names = []
                for line in f:
                    t = line.strip().split()
                    if t[0] == "element" and t[1] == "vertex":
                        n = int(t[2])
                    elif t[0] == "property":
                        names.append(t[-1])
                    elif t[0] == "end_header":
                        break
                rows = []
                for _ in range(n):
                    vals = f.readline().split()
                    rows.append([float(v) if "." in v or "e" in v else
                                 int(v) for v in vals])
            out = PlyData()
            out.elements = [_PlyElement(names, rows)]
            return out

    plyfile_mod.PlyData = PlyData
    sys.modules["plyfile"] = plyfile_mod

    # py3.10+: collections.Sequence moved to collections.abc
    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence

    # CPU execution of .cuda() call sites
    torch.Tensor.cuda = lambda self, *a, **k: self

    # torch.cuda.IntTensor/FloatTensor constructors used by the model
    # drivers (e.g. TransitionDown builds new_offset lists,
    # model/stratified_transformer.py:98-101,287): list -> CPU tensor
    # (int conversion truncates like the CUDA constructor), int -> zeros.
    def _cpu_tensor_ctor(dtype):
        def ctor(arg, *rest):
            if isinstance(arg, int):
                return torch.zeros((arg,) + tuple(rest), dtype=dtype)
            return torch.as_tensor(
                np.asarray(arg), dtype=torch.float64).to(dtype)
        return ctor

    torch.cuda.IntTensor = _cpu_tensor_ctor(torch.int32)
    torch.cuda.LongTensor = _cpu_tensor_ctor(torch.int64)
    torch.cuda.FloatTensor = _cpu_tensor_ctor(torch.float32)

    if REF not in sys.path:
        sys.path.insert(0, REF)  # for `from util.iostream import *` etc.


def load_ref(relpath, name=None):
    """Import a reference source file as a module (CPU, stubs installed)."""
    _install_stubs()
    # re-ensure on every call: a test's monkeypatch.syspath teardown can
    # remove the entry added by a previous test's _install_stubs
    if REF not in sys.path:
        sys.path.insert(0, REF)
    name = name or "ref_" + relpath.replace("/", "_").replace(".py", "")
    if name in _loaded:
        return _loaded[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[name] = mod
    return mod
