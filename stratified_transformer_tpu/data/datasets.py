"""Dataset loaders: S3DIS, ScanNetv2, DCF, and a synthetic generator.

Mirrors ``util/s3dis.py`` (room-per-item .npy xyzrgbl, Area-{test_area}
holdout, ``loop`` oversampling), ``util/scannet_v2.py`` (.pth per scene with
pre-scaled colors), ``util/dcf.py`` (npy-of-dicts cuboid scenes with per-point
offset targets + gaussian noise / random-translation augmentation).

The synthetic generator fabricates room-like scenes at configurable density —
used by the test-suite and the benchmark harness so the framework is fully
exercisable without the (license-gated) datasets on disk.
"""

from __future__ import annotations

import glob
import os
import threading
from typing import Optional

import numpy as np

from stratified_transformer_tpu.data.prepare import data_prepare


class _VisitRng:
    """Deterministic per-(item, visit-count) augmentation RNG streams.

    The reference advances ONE ``np.random`` state across the whole run,
    so its augmentation draws depend on DataLoader worker scheduling.
    Here each ``__getitem__`` call gets a fresh generator seeded by
    ``(seed, idx, n_prior_visits_of_idx)`` — the stream is a pure
    function of the access MULTISET, so any number of prefetch workers
    (train.py ``prefetch_workers``) produces bit-identical batches in
    any interleaving. The visit counter is the only shared state and is
    lock-guarded (``np.random.Generator`` is not thread-safe).
    """

    def __init__(self, seed):
        self.seed = int(seed)
        self._visits = {}
        self._lock = threading.Lock()

    def for_item(self, idx):
        idx = int(idx)
        with self._lock:
            v = self._visits.get(idx, 0)
            self._visits[idx] = v + 1
        return np.random.default_rng((self.seed, idx, v))


class S3DIS:
    """Reference ``util/s3dis.py:14-46``."""

    def __init__(self, split="train", data_root="trainval", test_area=5,
                 voxel_size=0.04, voxel_max=None, transform=None,
                 shuffle_index=False, loop=1, seed=0):
        self.split = split
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.shuffle_index = shuffle_index
        self.loop = loop
        self.data_root = data_root
        items = sorted(os.listdir(data_root))
        items = [i[:-4] for i in items if "Area_" in i]
        tag = f"Area_{test_area}"
        if split == "train":
            self.data_list = [i for i in items if tag not in i]
        else:
            self.data_list = [i for i in items if tag in i]
        self._rng = _VisitRng(seed)

    def __len__(self):
        return len(self.data_list) * self.loop

    def __getitem__(self, idx):
        item = self.data_list[idx % len(self.data_list)]
        data = np.load(os.path.join(self.data_root, item + ".npy"))
        coord, feat, label = data[:, 0:3], data[:, 3:6], data[:, 6]
        return data_prepare(
            coord, feat, label, self.split, self.voxel_size, self.voxel_max,
            self.transform, self.shuffle_index, feat_scale=255.0,
            rng=self._rng.for_item(idx))


class Scannetv2:
    """Reference ``util/scannet_v2.py:13-52``: per-scene ``.pth`` tuples of
    (coords, colors in [-1, 1], labels); splits train/val/trainval."""

    def __init__(self, split="train", data_root="scannetv2", voxel_size=0.02,
                 voxel_max=None, transform=None, shuffle_index=False, loop=1,
                 seed=0):
        self.split = split
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.shuffle_index = shuffle_index
        self.loop = loop
        if split in ("train", "val", "test"):
            dirs = [os.path.join(data_root, split)]
        elif split == "trainval":
            dirs = [os.path.join(data_root, "train"),
                    os.path.join(data_root, "val")]
        else:
            raise ValueError(split)
        self.files = sorted(
            f for d in dirs for f in glob.glob(os.path.join(d, "*.pth")))
        self._rng = _VisitRng(seed)

    def __len__(self):
        return len(self.files) * self.loop

    def __getitem__(self, idx):
        import torch  # CPU-only torch, used purely as a .pth reader

        item = torch.load(self.files[idx % len(self.files)],
                          weights_only=False)
        coord, feat, label = item[0], item[1], item[2]
        return data_prepare(
            np.asarray(coord), np.asarray(feat), np.asarray(label),
            self.split, self.voxel_size, self.voxel_max, self.transform,
            self.shuffle_index, feat_scale=1.0,
            rng=self._rng.for_item(idx))


class DCF:
    """Reference ``util/dcf.py:14-90``: cuboid-decomposition scenes with
    per-point 3-vector offset targets; gaussian jitter + random translation."""

    def __init__(self, split="train", data_root=(), voxel_size=0.04,
                 sigma=0.02, voxel_max=None, shuffle_index=False,
                 coord_move=True, seed=0):
        self.split = split
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.sigma = sigma
        self.shuffle_index = shuffle_index
        self.coord_move = coord_move
        flag = "train" if split == "train" else "test"
        self.files = []
        for root in data_root:
            self.files += [
                f for f in glob.glob(os.path.join(root, flag, "*"))
                if "cube" in f]
        self.files.sort()
        self._rng = _VisitRng(seed)

    def __len__(self):
        return len(self.files)

    def load_item(self, path):
        cubes = np.load(path, allow_pickle=True)
        samples, labels, offsets = [], [], []
        params = []
        for i, cube in enumerate(cubes):
            samples.append(np.vstack(
                (cube.get("f_samples"), cube.get("e_samples"))))
            labels.append(np.concatenate(
                (cube.get("f_labels"), cube.get("e_labels"))))
            offsets.append(np.vstack(
                (cube.get("f_offsets"), cube.get("e_offsets"))))
            params.append(np.hstack(
                (cube.get("centroid"), cube.get("lengths"))))
        data = np.concatenate(samples)
        return (data, np.concatenate(labels), np.concatenate(offsets),
                np.ones_like(data), np.asarray(params))

    def __getitem__(self, idx):
        coord, label, t_shift, feat, _ = self.load_item(
            self.files[idx % len(self.files)])
        rng = self._rng.for_item(idx)
        coord = coord + rng.normal(scale=self.sigma, size=coord.shape)
        coord = coord + rng.normal(scale=0.1, size=(1, 3))
        return data_prepare(
            coord, feat, label, self.split, self.voxel_size, self.voxel_max,
            transform=None, shuffle_index=self.shuffle_index, feat_scale=1.0,
            target_shift=t_shift, rng=rng)


class SyntheticRooms:
    """Fabricated room-like scenes (floor/walls/boxes) for tests + benches.

    Produces the same sample dict contract as the real datasets, with
    plausible surface-like geometry so window occupancy statistics resemble
    S3DIS rooms at the same voxel size.
    """

    def __init__(self, num_scenes=16, points=60_000, extent=6.0,
                 num_classes=13, voxel_size=0.04, voxel_max=None,
                 transform=None, with_shift=False, seed=0, split="train"):
        self.num_scenes = num_scenes
        self.points = points
        self.extent = extent
        self.num_classes = num_classes
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.with_shift = with_shift
        self.seed = seed
        self.split = split

    def __len__(self):
        return self.num_scenes

    def raw_scene(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        n = self.points
        ex = self.extent
        parts = []
        # floor + two walls (2D manifolds — realistic window occupancy)
        n_fl = n // 3
        floor = np.stack([
            rng.uniform(0, ex, n_fl), rng.uniform(0, ex, n_fl),
            rng.normal(0, 0.02, n_fl)], 1)
        n_w = n // 4
        wall1 = np.stack([
            rng.uniform(0, ex, n_w), rng.normal(0, 0.02, n_w),
            rng.uniform(0, ex / 2, n_w)], 1)
        wall2 = np.stack([
            rng.normal(0, 0.02, n_w), rng.uniform(0, ex, n_w),
            rng.uniform(0, ex / 2, n_w)], 1)
        parts += [floor, wall1, wall2]
        part_labels = [0, 1, 1]          # floor / walls
        rest = n - n_fl - 2 * n_w
        # a few box-like objects
        nb = max(rest // 6, 1)
        for bi in range(6):
            c = rng.uniform(0.5, ex - 0.5, 3) * np.array([1, 1, 0.3])
            s = rng.uniform(0.2, 0.9, 3)
            face = rng.integers(0, 3, nb)
            pts = rng.uniform(-0.5, 0.5, (nb, 3)) * s
            pts[np.arange(nb), face] = np.sign(
                rng.uniform(-1, 1, nb)) * s[face] / 2
            parts.append(c + pts)
            part_labels.append(2 + bi % max(self.num_classes - 2, 1))
        coord = np.concatenate(parts)[:n].astype(np.float32)
        # geometry-correlated labels (floor/wall/object classes) with color
        # cues per class — the segmentation task is actually learnable,
        # so smoke-training metrics are meaningful
        label = np.concatenate([
            np.full(len(p_), l_, np.int32)
            for p_, l_ in zip(parts, part_labels)])[:n]
        base_colors = np.stack([
            (np.sin(np.arange(self.num_classes) * 2.1 + c0) * 90 + 130)
            for c0 in (0.0, 2.0, 4.0)], 1)      # [C,3]
        feat = base_colors[label % self.num_classes]
        feat = np.clip(
            feat + rng.normal(0, 25, feat.shape), 0, 255).astype(np.float32)
        label = (label % self.num_classes).astype(np.int32)
        shift = (rng.normal(0, 0.1, (len(coord), 3)).astype(np.float32)
                 if self.with_shift else None)
        return coord, feat, label, shift

    def __getitem__(self, idx):
        coord, feat, label, shift = self.raw_scene(idx)
        rng = np.random.default_rng(self.seed + 7919 * (idx + 1))
        return data_prepare(
            coord, feat, label, self.split, self.voxel_size, self.voxel_max,
            self.transform, shuffle_index=False, feat_scale=255.0,
            target_shift=shift, rng=rng)


class PointData:
    """Legacy h5 dataset (reference ``util/dataset.py`` capability):
    fixed-size point clouds with per-point labels from .h5 shards."""

    def __init__(self, split="train", data_root="data", num_point=2048):
        import h5py  # noqa: F401  (validated lazily per file)
        import os as _os

        self.num_point = num_point
        list_file = _os.path.join(
            data_root, f"{split}_files.txt")
        if _os.path.exists(list_file):
            with open(list_file) as f:
                self.files = [l.strip() for l in f if l.strip()]
        else:
            import glob as _glob
            self.files = sorted(_glob.glob(
                _os.path.join(data_root, f"*{split}*.h5")))
        self._index = []
        for fi, fn in enumerate(self.files):
            import h5py
            with h5py.File(fn, "r") as h:
                self._index += [(fi, i) for i in range(len(h["data"]))]

    def __len__(self):
        return len(self._index)

    def __getitem__(self, idx):
        import h5py

        fi, row = self._index[idx % len(self._index)]
        with h5py.File(self.files[fi], "r") as h:
            data = np.asarray(h["data"][row][: self.num_point], np.float32)
            label = np.asarray(h["label"][row], np.int32).reshape(-1)
        return {"xyz": data[:, :3],
                "feats": data[:, 3:] if data.shape[1] > 3 else
                np.ones_like(data[:, :3]),
                "labels": (label if len(label) > 1 else
                           np.full(len(data), label[0], np.int32))}
