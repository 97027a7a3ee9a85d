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
        _INFLUENCE_TO_RADIUS = 1.5

        def __init__(self, *a, **k):
            super().__init__()

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

    # --- lib.pointops2.functions.pointops (import-only) ---------------------
    lib = types.ModuleType("lib")
    lib_p2 = types.ModuleType("lib.pointops2")
    lib_fn = types.ModuleType("lib.pointops2.functions")
    lib_po = types.ModuleType("lib.pointops2.functions.pointops")
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

    # py3.10+: collections.Sequence moved to collections.abc
    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence

    # CPU execution of .cuda() call sites
    torch.Tensor.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)  # for `from util.iostream import *` etc.


def load_ref(relpath, name=None):
    """Import a reference source file as a module (CPU, stubs installed)."""
    _install_stubs()
    name = name or "ref_" + relpath.replace("/", "_").replace(".py", "")
    if name in _loaded:
        return _loaded[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[name] = mod
    return mod
