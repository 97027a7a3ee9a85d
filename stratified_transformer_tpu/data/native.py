"""ctypes bindings for the C++ host-ingest library (cpp/ingest.cpp).

Builds on demand (``make -C cpp``) and degrades gracefully to the numpy
implementations when the toolchain is unavailable. See ``cpp/ingest.cpp``
for the reference-semantics mapping.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "cpp", "libingest.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "cpp")],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, f32, u64, i32 = (ctypes.c_int64, ctypes.c_float, ctypes.c_uint64,
                          ctypes.c_int32)
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pu = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.voxel_hash.argtypes = [pf, i64, f32, pu]
    lib.voxel_select_random.restype = i64
    lib.voxel_select_random.argtypes = [pu, i64, u64, pi]
    lib.voxel_sort_counts.restype = i64
    lib.voxel_sort_counts.argtypes = [pu, i64, pi, pi]
    lib.grid_subsample.restype = i64
    lib.grid_subsample.argtypes = [
        pf, ctypes.c_void_p, ctypes.c_void_p, i64, i64, f32, pf,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.radius_neighbors.argtypes = [pf, pi, i64, f32, i64, pi32]
    lib.knn_grid.argtypes = [pf, pi, pf, pi, i64, i64, f32, pi32,
                             ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize(coord, voxel_size, mode=0, seed=0):
    """Native-accelerated ``data.voxelize.voxelize`` (same contract)."""
    lib = _load()
    if lib is None:
        from stratified_transformer_tpu.data.voxelize import voxelize as v
        return v(coord, voxel_size, mode=mode)
    coord = np.ascontiguousarray(coord, np.float32)
    n = len(coord)
    keys = np.empty(n, np.uint64)
    lib.voxel_hash(coord, n, float(voxel_size), keys)
    if mode == 0:
        out = np.empty(n, np.int64)
        m = lib.voxel_select_random(keys, n, int(seed), out)
        return out[:m]
    sorted_idx = np.empty(n, np.int64)
    counts = np.empty(n, np.int64)
    nv = lib.voxel_sort_counts(keys, n, sorted_idx, counts)
    return sorted_idx, counts[:nv]


def grid_subsample(points, features=None, labels=None, cell=0.1):
    """Barycenter grid pooling (cpp_wrappers ``grid_subsampling``
    semantics). Returns (points[, features][, labels])."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    c = 0 if features is None else features.shape[1]
    if lib is None:
        # numpy fallback
        mins = points.min(0)
        keys = np.floor((points - mins) / cell).astype(np.int64)
        _, inv, counts = np.unique(
            keys, axis=0, return_inverse=True, return_counts=True)
        nv = len(counts)
        out_p = np.zeros((nv, 3), np.float64)
        np.add.at(out_p, inv, points)
        out_p /= counts[:, None]
        outs = [out_p.astype(np.float32)]
        if features is not None:
            out_f = np.zeros((nv, c), np.float64)
            np.add.at(out_f, inv, features)
            outs.append((out_f / counts[:, None]).astype(np.float32))
        if labels is not None:
            out_l = np.zeros(nv, np.int32)
            for v in range(nv):
                vals, cnts = np.unique(labels[inv == v], return_counts=True)
                out_l[v] = vals[np.argmax(cnts)]
            outs.append(out_l)
        return tuple(outs) if len(outs) > 1 else outs[0]

    feats = (np.ascontiguousarray(features, np.float32)
             if features is not None else None)
    labs = (np.ascontiguousarray(labels, np.int32)
            if labels is not None else None)
    out_p = np.empty((n, 3), np.float32)
    out_f = np.empty((n, max(c, 1)), np.float32)
    out_l = np.empty(n, np.int32)
    nv = lib.grid_subsample(
        points,
        feats.ctypes.data_as(ctypes.c_void_p) if feats is not None else None,
        labs.ctypes.data_as(ctypes.c_void_p) if labs is not None else None,
        n, c, float(cell), out_p,
        out_f.ctypes.data_as(ctypes.c_void_p),
        out_l.ctypes.data_as(ctypes.c_void_p))
    outs = [out_p[:nv]]
    if features is not None:
        outs.append(out_f[:nv, :c])
    if labels is not None:
        outs.append(out_l[:nv])
    return tuple(outs) if len(outs) > 1 else outs[0]


def radius_neighbors(points, offsets, radius, k):
    """Grid-hash radius query (CPU). Returns idx [N, k] int32, -1 absent."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    n = len(points)
    out = np.full((n, k), -1, np.int32)  # padded rows stay deterministic
    if lib is None:
        # numpy fallback: brute force per scene
        start = 0
        for e in offsets:
            seg = points[start:e]
            d2 = ((seg[:, None, :] - seg[None, :, :]) ** 2).sum(-1)
            order = np.argsort(d2, axis=1, kind="stable")
            for i in range(len(seg)):
                sel = [j for j in order[i] if d2[i, j] <= radius * radius][:k]
                row = np.full(k, -1, np.int32)
                row[:len(sel)] = np.asarray(sel, np.int32) + start
                out[start + i] = row
            start = e
        return out
    lib.radius_neighbors(points, offsets, len(offsets), float(radius), k, out)
    return out


def knn(query_pts, query_offsets, ref_pts, ref_offsets, k, cell=0.0,
        with_dist=False):
    """Exact per-scene kNN on the host (grid hash + ring expansion).

    Mirrors ``ops.neighbors.knn`` semantics (``pointops.knnquery``,
    ``knnquery_cuda_kernel.cu:65-108``): nearest-first indices into the
    reference set, -1 where fewer than k exist. ``cell<=0`` picks
    ~2 average point spacings automatically.
    """
    lib = _load()
    q = np.ascontiguousarray(query_pts, np.float32)
    r = np.ascontiguousarray(ref_pts, np.float32)
    qo = np.ascontiguousarray(query_offsets, np.int64)
    ro = np.ascontiguousarray(ref_offsets, np.int64)
    nq = len(q)
    # Deterministic padding: rows past query_offsets[-1] are never filled
    # by the kernel, but downstream masks (pyramid "up" entries) key on
    # idx >= 0 — leave them -1 / 1e10, not uninitialized memory.
    out = np.full((nq, k), -1, np.int32)
    d2 = np.full((nq, k), 1e10, np.float32) if with_dist else None
    if lib is None:
        # numpy fallback: brute force per scene
        qs = rs = 0
        for s in range(len(qo)):
            qe, re = int(qo[s]), int(ro[s])
            qseg, rseg = q[qs:qe], r[rs:re]
            if len(qseg):
                dist = ((qseg[:, None, :] - rseg[None, :, :]) ** 2).sum(-1)
                kk = min(k, len(rseg))
                idx = np.argsort(dist, axis=1, kind="stable")[:, :kk]
                out[qs:qe, :kk] = idx + rs
                out[qs:qe, kk:] = -1
                if with_dist:
                    d2[qs:qe, :kk] = np.take_along_axis(dist, idx, 1)
                    d2[qs:qe, kk:] = 1e10
            qs, rs = qe, re
        return (out, d2) if with_dist else out
    lib.knn_grid(
        q, qo, r, ro, len(qo), k, float(cell), out,
        d2.ctypes.data_as(ctypes.c_void_p) if with_dist else None)
    return (out, d2) if with_dist else out
