"""Loaders proven against on-disk formats PRODUCED BY THE REFERENCE CODE.

Two gaps closed (VERDICT r4 "real-format dataset fixtures"):

* ScanNetv2: fabricate raw ScanNet inputs (ascii ``*_vh_clean_2.ply`` +
  ``labels.ply`` + ``segs.json`` + ``aggregation.json`` + label tsv), then
  EXECUTE the reference ``dataset/scannetv2/prepare_data_inst.py`` ``f()``
  on them — its output ``*_inst_nostuff.pth`` (coords centered, colors
  /127.5-1, 20-class remap with -100 ignore) is what our ``Scannetv2``
  loader must parse. The fixture is no longer hand-fabricated; it is the
  reference pipeline's own artifact.

* S3DIS: run the reference ``util/s3dis.py`` Dataset and our
  ``datasets.S3DIS`` on the SAME ``.npy`` rooms (val split, sub-voxel
  points so the random-pick voxelization is forced deterministic) and
  assert identical samples.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ref_shims import REF, load_ref  # noqa: E402


# ---------------------------------------------------------------------------
# ScanNetv2: reference prep -> our loader -> our driver
# ---------------------------------------------------------------------------

def _write_ascii_ply(path, names, rows, types_=None):
    types_ = types_ or ["float"] * len(names)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(rows)}\n")
        for nm, tp in zip(names, types_):
            f.write(f"property {tp} {nm}\n")
        f.write("end_header\n")
        for r in rows:
            f.write(" ".join(str(v) for v in r) + "\n")


def _make_raw_scannet_scene(d, name, rng, n=900):
    """Raw-format scene: mesh ply + labels ply + segs + aggregation."""
    xyz = rng.uniform(0, 3, (n, 3))
    rgb = rng.integers(0, 256, (n, 3))
    rows = [list(map(float, p)) + list(map(int, c)) + [255]
            for p, c in zip(xyz, rgb)]
    _write_ascii_ply(
        os.path.join(d, f"{name}_vh_clean_2.ply"),
        ["x", "y", "z", "red", "green", "blue", "alpha"], rows,
        ["float"] * 3 + ["uchar"] * 4)

    # raw labels: ids 1 (wall), 2 (floor), 5 (chair->remap 4), 0 (-> -100)
    raw = rng.choice([0, 1, 2, 5], size=n, p=[0.1, 0.3, 0.3, 0.3])
    _write_ascii_ply(
        os.path.join(d, f"{name}_vh_clean_2.labels.ply"),
        ["label"], [[int(v)] for v in raw], ["ushort"])

    # two chair instances: segments drawn from chair-labeled points
    chair_pts = np.nonzero(raw == 5)[0]
    seg_ids = np.arange(n) + 1000          # one segment per point
    segs = {"segIndices": [int(s) for s in seg_ids]}
    with open(os.path.join(d, f"{name}_vh_clean_2.0.010000.segs.json"),
              "w") as f:
        json.dump(segs, f)
    half = len(chair_pts) // 2
    groups = [
        {"label": "chair",
         "segments": [int(seg_ids[i]) for i in chair_pts[:half]]},
        {"label": "chair",
         "segments": [int(seg_ids[i]) for i in chair_pts[half:]]},
    ]
    with open(os.path.join(d, f"{name}.aggregation.json"), "w") as f:
        json.dump({"segGroups": groups}, f)
    return raw


def _make_label_tsv(path):
    """Tiny scannetv2-labels.combined.tsv: col1 raw name, col7 nyu40."""
    hdr = "\t".join(["id", "raw_category", "category", "c3", "c4", "c5",
                     "c6", "nyu40class"])
    rows = [
        "\t".join(["1", "wall", "wall", "-", "-", "-", "-", "wall"]),
        "\t".join(["2", "floor", "floor", "-", "-", "-", "-", "floor"]),
        "\t".join(["3", "chair", "chair", "-", "-", "-", "-", "chair"]),
        "\t".join(["4", "gizmo", "gizmo", "-", "-", "-", "-", "gizmoid"]),
    ]
    with open(path, "w") as f:
        f.write(hdr + "\n" + "\n".join(rows) + "\n")


def test_scannet_reference_prep_feeds_our_loader(tmp_path, monkeypatch):
    rng = np.random.default_rng(5)
    root = tmp_path
    for split, count in (("train", 2), ("val", 1)):
        os.makedirs(root / split, exist_ok=True)
        for i in range(count):
            _make_raw_scannet_scene(
                str(root / split), f"scene{i:04d}_00", rng)
    _make_label_tsv(str(root / "scannetv2-labels.combined.tsv"))
    os.makedirs(root / "empty", exist_ok=True)

    # Execute the reference prep module (import runs its argparse + pool
    # over an EMPTY split so nothing multiprocesses inside pytest), then
    # call its f() per scene — the actual reference prep computation.
    monkeypatch.chdir(root)
    monkeypatch.setattr(sys, "argv",
                        ["prepare_data_inst.py", "--data_split", "empty"])
    scannet_dir = f"{REF}/dataset/scannetv2"
    monkeypatch.syspath_prepend(scannet_dir)
    prep = load_ref("dataset/scannetv2/prepare_data_inst.py")
    for split, count in (("train", 2), ("val", 1)):
        for i in range(count):
            prep.f(f"{split}/scene{i:04d}_00_vh_clean_2.ply")

    # the reference artifact exists and has its documented layout
    out = torch.load(str(root / "train" / "scene0000_00_inst_nostuff.pth"),
                     weights_only=False)
    coords, colors, sem_labels, inst_labels = out
    assert np.abs(coords.mean(0)).max() < 1e-6          # centered
    assert colors.min() >= -1.0 and colors.max() <= 1.0  # /127.5 - 1
    assert set(np.unique(sem_labels)) <= {-100.0, 0.0, 1.0, 4.0}
    assert (sem_labels == -100).any()                    # ignore present

    # OUR loader parses the reference-produced files
    from stratified_transformer_tpu.data.datasets import Scannetv2
    ds = Scannetv2(split="train", data_root=str(root), voxel_size=0.02)
    sample = ds[0]
    coord, feat, label = sample["xyz"], sample["feats"], sample["labels"]
    assert coord.shape[1] == 3 and feat.shape[1] == 3
    assert (label == -100).any() and label.max() <= 4
    assert feat.min() >= -1.0 and feat.max() <= 1.0

    # and the real driver trains one epoch on them (ignore_label -100
    # rides through collate -> compress -> CE/metrics masks).
    # ref_shims put /root/reference on sys.path (which also has a
    # train.py) - make sure OUR repo wins the `train` import.
    sys.path.insert(0, REPO)
    import train as train_mod
    assert train_mod.__file__.startswith(REPO), train_mod.__file__
    from test_driver_smokes import TINY_OPTS
    save = str(tmp_path / "run")
    monkeypatch.chdir(REPO)
    monkeypatch.setattr(sys, "argv", ["train.py", "--config",
                        os.path.join(REPO, "configs", "synthetic_smoke.yaml")]
                        + TINY_OPTS
                        + ["data_name", "scannetv2", "data_root", str(root),
                           "classes", "20", "ignore_label", "-100",
                           "voxel_size", "0.04", "save_path", save])
    train_mod.main()
    assert os.path.exists(os.path.join(save, "metrics.jsonl"))


# ---------------------------------------------------------------------------
# S3DIS: reference loader vs our loader on the same .npy rooms
# ---------------------------------------------------------------------------

def test_s3dis_loader_matches_reference(tmp_path):
    rng = np.random.default_rng(9)
    n = 700
    for name in ["Area_5_office1", "Area_5_office2"]:
        xyz = rng.uniform(0, 2.5, (n, 3))
        rgb = rng.uniform(0, 255, (n, 3))
        lbl = rng.integers(0, 13, (n, 1))
        np.save(str(tmp_path / f"{name}.npy"),
                np.concatenate([xyz, rgb, lbl], 1).astype(np.float32))

    ref_s3dis = load_ref("util/s3dis.py")
    # voxel 0.004 << point spacing: every point its own voxel, so the
    # reference's random-pick voxelization (np.random) is deterministic
    ref_ds = ref_s3dis.S3DIS(split="val", data_root=str(tmp_path),
                             test_area=5, voxel_size=0.004, voxel_max=None,
                             loop=1)
    from stratified_transformer_tpu.data.datasets import S3DIS
    ours = S3DIS(split="val", data_root=str(tmp_path), test_area=5,
                 voxel_size=0.004, voxel_max=None, loop=1)
    assert len(ref_ds) == len(ours) == 2
    for i in range(2):
        rc, rf, rl = (np.asarray(t) for t in ref_ds[i])
        s_i = ours[i]
        np.testing.assert_allclose(np.asarray(s_i["xyz"]), rc, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_i["feats"]), rf, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(s_i["labels"]), rl)
