"""Driver-level smokes on fabricated real-format datasets.

Fabricates tiny S3DIS ``.npy`` rooms, ScanNetv2 ``.pth`` scenes and DCF
npy-dict cubes in tmp, then runs ONE training epoch through ``train.main``
and one eval through ``test.main`` — the actual CLI drivers, not the
library. Also covers mix3d wiring (``mix3d: 1.0`` halves the offset count).
"""

import os
import sys

import jax
import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY_OPTS = [
    "num_layers", "2", "depths", "[1,1]", "channels", "[16,32]",
    "num_heads", "[2,4]", "band_per_stage", "[32,32]",
    "tile", "32", "band", "32", "sparse_cap", "16",
    "max_batch_points", "2048", "voxel_max", "900",
    "batch_size", "2", "epochs", "1", "n_devices", "1",
    "print_freq", "10", "aug", "False", "drop_path_rate", "0.0",
    "host_pyramid", "True", "loop", "1",
]


def _run_train(tmp_path, extra, monkeypatch):
    import train as train_mod
    save = str(tmp_path / "run")
    argv = (["train.py", "--config", os.path.join(
        REPO, "configs", "synthetic_smoke.yaml")]
        + TINY_OPTS + ["save_path", save] + extra)
    monkeypatch.setattr(sys, "argv", argv)
    train_mod.main()
    assert os.path.exists(os.path.join(save, "metrics.jsonl"))
    return save


def _make_s3dis(root, rooms=4, n=1200):
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    names = ["Area_1_office1", "Area_1_office2", "Area_2_office1",
             "Area_5_office1"][:rooms]
    for i, name in enumerate(names):
        xyz = rng.uniform(0, 2, (n, 3))
        rgb = rng.uniform(0, 255, (n, 3))
        lbl = rng.integers(0, 13, (n, 1))
        np.save(os.path.join(root, name + ".npy"),
                np.concatenate([xyz, rgb, lbl], 1).astype(np.float32))


def test_s3dis_driver_train_epoch(tmp_path, monkeypatch):
    root = str(tmp_path / "s3dis")
    _make_s3dis(root)
    _run_train(tmp_path, ["data_name", "s3dis", "data_root", root,
                          "test_area", "5", "classes", "13"], monkeypatch)


def test_swin3d_driver_train_epoch(tmp_path, monkeypatch):
    """One-command Swin3D training: the named config's `arch:
    swin3d_transformer` switch (reference train_backup.py:99-129 /
    config/s3dis/s3dis_swin3d_transformer.yaml:14) must select the
    fixed-window baseline end-to-end through the real driver."""
    import train as train_mod
    root = str(tmp_path / "s3dis")
    _make_s3dis(root)
    save = str(tmp_path / "run")
    argv = (["train.py", "--config", os.path.join(
        REPO, "configs", "s3dis_swin3d.yaml")]
        + TINY_OPTS + ["save_path", save, "data_root", root,
                       "attn_impl", "reference", "aug", "False",
                       "sync_bn", "False", "loop", "1"])
    monkeypatch.setattr(sys, "argv", argv)
    # the named config must actually flip the arch switch
    from stratified_transformer_tpu.utils.config import load_cfg
    mcfg = train_mod.build_model_config(
        load_cfg(os.path.join(REPO, "configs", "s3dis_swin3d.yaml")), 1)
    assert not mcfg.use_stratified and mcfg.rpe_mode == "swin_window"
    train_mod.main()
    assert os.path.exists(os.path.join(save, "metrics.jsonl"))


def _make_scannet(root, n=1000):
    rng = np.random.default_rng(1)
    for split, count in (("train", 3), ("val", 2)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            coords = rng.uniform(0, 2, (n, 3)).astype(np.float32)
            colors = (rng.uniform(-1, 1, (n, 3))).astype(np.float32)
            labels = rng.integers(0, 20, n).astype(np.int64)
            labels[::17] = 255  # unannotated points
            torch.save((coords, colors, labels),
                       os.path.join(d, f"scene{i:04d}_00.pth"))


def test_scannet_driver_train_epoch(tmp_path, monkeypatch):
    root = str(tmp_path / "scannetv2")
    _make_scannet(root)
    _run_train(tmp_path, ["data_name", "scannetv2", "data_root", root,
                          "classes", "20", "voxel_size", "0.04",
                          "stem_transformer", "True"], monkeypatch)


def _make_dcf(root, scenes=2, cubes=2, m=160):
    rng = np.random.default_rng(2)
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    for s in range(scenes):
        items = []
        for c in range(cubes):
            o = rng.uniform(0, 1.5, 3)
            f = rng.uniform(0, 0.5, (m, 3)) + o
            e = rng.uniform(0, 0.5, (m // 4, 3)) + o
            items.append(dict(
                f_samples=f, e_samples=e,
                f_labels=rng.integers(0, 6, m),
                e_labels=rng.integers(6, 18, m // 4),
                f_offsets=rng.normal(0, 0.02, (m, 3)),
                e_offsets=rng.normal(0, 0.02, (m // 4, 3)),
                centroid=o + 0.25, lengths=np.full(3, 0.5)))
        np.save(os.path.join(d, f"cube_{s}.npy"),
                np.asarray(items, dtype=object), allow_pickle=True)


def test_dcf_driver_train_epoch(tmp_path, monkeypatch):
    root = str(tmp_path / "dcf")
    _make_dcf(root)
    _run_train(tmp_path, ["data_name", "dcf", "data_root", root,
                          "classes", "18", "with_regressor", "True",
                          "offset_weight", "1.0"], monkeypatch)


def test_s3dis_driver_eval(tmp_path, monkeypatch):
    """Whole-scene test.py protocol over fabricated S3DIS rooms
    (random-init model: exercises voting/chunking/IoU plumbing)."""
    import test as test_mod
    root = str(tmp_path / "s3dis")
    _make_s3dis(root)
    argv = (["test.py", "--config", os.path.join(
        REPO, "configs", "synthetic_smoke.yaml")] + TINY_OPTS + [
        "data_name", "s3dis", "data_root", root, "test_area", "5",
        "classes", "13", "batch_size_test", "2",
        "eval_max_batch_points", "2048"])
    monkeypatch.setattr(sys, "argv", argv)
    test_mod.main()


def test_s3dis_driver_eval_sharded(tmp_path, monkeypatch):
    """`sharded: true` path of test.py: spatial blocks + halo over the
    virtual device mesh (VERDICT #3: halo eval reachable from the driver)."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    import test as test_mod
    root = str(tmp_path / "s3dis")
    _make_s3dis(root)
    argv = (["test.py", "--config", os.path.join(
        REPO, "configs", "synthetic_smoke.yaml")] + TINY_OPTS + [
        "data_name", "s3dis", "data_root", root, "test_area", "5",
        "classes", "13", "batch_size_test", "2",
        "eval_max_batch_points", "2048",
        "sharded", "True", "sharded_devices", "4",
        "sharded_block_points", "1024"])
    monkeypatch.setattr(sys, "argv", argv)
    test_mod.main()


def test_mix3d_halves_offsets(tmp_path):
    """mix3d: 1.0 -> every batch mixes scene pairs; the padded batch then
    has ceil(spd/2) distinct offset entries (trailing repeats)."""
    from train import BatchLoader, build_dataset, build_model_config
    from stratified_transformer_tpu.utils.config import load_cfg

    cfg = load_cfg(os.path.join(REPO, "configs", "synthetic_smoke.yaml"))
    cfg.update({"synthetic_scenes": 8, "synthetic_points": 600,
                "voxel_max": 500, "batch_size": 4, "mix3d": 1.0,
                "max_batch_points": 4096, "tile": 32, "band": 32,
                "num_layers": 2, "depths": [1, 1], "channels": [16, 32],
                "num_heads": [2, 4], "band_per_stage": None,
                "aug": False})
    mcfg = build_model_config(cfg, 1)
    ds = build_dataset(cfg, "train", mcfg)
    loader = BatchLoader(ds, mcfg, cfg, 1, shuffle=True, seed=0)
    [batch] = loader._make_batch(list(range(4)))
    off = np.asarray(batch["offsets"])
    # 4 scenes mixed into 2: offsets [a, b, b, b]
    assert len(off) == mcfg.num_scenes
    distinct = len(np.unique(off))
    assert distinct == 2, off

    loader_off = BatchLoader(ds, mcfg, cfg, 1, shuffle=False, seed=0)
    [batch2] = loader_off._make_batch(list(range(4)))
    assert len(np.unique(np.asarray(batch2["offsets"]))) == 4


def test_sync_loader_matches_prefetch():
    """`prefetch: false` (diagnostic sync loader, train.py r3) yields the
    same batch sequence as the threaded prefetch loader."""
    from train import BatchLoader, build_dataset, build_model_config
    from stratified_transformer_tpu.utils.config import load_cfg

    cfg = load_cfg(os.path.join(REPO, "configs", "synthetic_smoke.yaml"))
    cfg.update({"synthetic_scenes": 4, "synthetic_points": 400,
                "voxel_max": 300, "batch_size": 2, "max_batch_points": 2048,
                "tile": 32, "band": 32, "num_layers": 2, "depths": [1, 1],
                "channels": [16, 32], "num_heads": [2, 4],
                "band_per_stage": None, "aug": False, "host_pyramid": False})
    mcfg = build_model_config(cfg, 1)
    ds = build_dataset(cfg, "train", mcfg)

    threaded = list(BatchLoader(ds, mcfg, cfg, 1, shuffle=True, seed=3))
    cfg["prefetch"] = False
    sync = list(BatchLoader(ds, mcfg, cfg, 1, shuffle=True, seed=3))
    assert len(threaded) == len(sync) > 0
    for bt, bs in zip(threaded, sync):
        for key in bt[0]:
            np.testing.assert_array_equal(bt[0][key], bs[0][key], err_msg=key)


def test_crash_handler_marker_and_resume(tmp_path, monkeypatch):
    """Fault-injection test of the mid-run crash handler (VERDICT r3 #8):
    a synthetic runtime fault at epoch 2 writes the crash marker, exits
    rc 17 promptly, and the run resumes cleanly from the epoch-1
    checkpoint in a fresh invocation (the documented recovery path)."""
    import json as _json

    import train as train_mod

    save = str(tmp_path / "crashrun")
    argv = (["train.py", "--config", os.path.join(
        REPO, "configs", "synthetic_smoke.yaml")]
        + TINY_OPTS
        + ["data_name", "synthetic", "synthetic_scenes", "4",
           "synthetic_points", "1200", "epochs", "2",
           "save_path", save])
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.setenv("ST_FAULT_INJECT_AT", "2:1")
    with pytest.raises(SystemExit) as ex:
        train_mod.main()
    assert ex.value.code == 17
    with open(os.path.join(save, "crash_marker.json")) as f:
        marker = _json.load(f)
    assert "INVALID_ARGUMENT" in marker["error"]
    assert marker["epoch"] == 2 and marker["iter"] == 1
    assert marker["resume"] == os.path.join(save, "ckpt")

    # recovery: fresh invocation resuming from the marker's checkpoint
    monkeypatch.delenv("ST_FAULT_INJECT_AT")
    monkeypatch.setattr(sys, "argv", argv + ["resume", marker["resume"]])
    train_mod.main()
    lines = open(os.path.join(save, "metrics.jsonl")).read().splitlines()
    assert len(lines) >= 2  # epoch 1 (pre-crash) + epoch 2 (resumed)


def test_crash_fallback_argv():
    """The re-exec command swaps in the jnp path and resumes (appended
    `key value` pairs win in merge_cfg_from_list)."""
    from train import _fallback_argv

    argv = _fallback_argv(
        "python", ["train.py", "--config", "c.yaml", "attn_impl", "fused"],
        "/runs/x/ckpt", "reference")
    assert argv[0] == "python"
    tail = argv[-8:]
    assert tail == ["resume", "/runs/x/ckpt", "preflight", "true",
                    "preflight_retries", "8", "attn_impl", "reference"]


def test_upload_overlap_smoke(tmp_path, monkeypatch):
    """The opt-in overlapped-upload loop (upload_overlap: true) trains a
    tiny epoch — covers the r4 pipelined-loop variant that overlaps
    device_put with the executing step."""
    _run_train(tmp_path, ["data_name", "synthetic", "synthetic_scenes",
                          "4", "synthetic_points", "1200",
                          "upload_overlap", "True"], monkeypatch)


def test_multiworker_prefetch_matches_sync_with_aug(tmp_path):
    """`prefetch_workers: 2` yields bit-identical batches to the sync
    loader on an AUGMENTED dataset: per-(item, visit) RNG streams
    (data/datasets._VisitRng) make augmentation draws independent of
    worker scheduling. Fresh dataset per loader — visit counters are
    run-scoped state."""
    from train import BatchLoader, build_dataset, build_model_config
    from stratified_transformer_tpu.utils.config import load_cfg

    root = str(tmp_path / "s3dis")
    _make_s3dis(root, rooms=4, n=500)
    cfg = load_cfg(os.path.join(REPO, "configs", "synthetic_smoke.yaml"))
    cfg.update({"data_name": "s3dis", "data_root": root, "test_area": 5,
                "classes": 13, "loop": 2, "aug": True,
                "voxel_max": 300, "batch_size": 2, "max_batch_points": 2048,
                "tile": 32, "band": 32, "num_layers": 2, "depths": [1, 1],
                "channels": [16, 32], "num_heads": [2, 4],
                "band_per_stage": None, "host_pyramid": True})
    mcfg = build_model_config(cfg, 1)

    cfg["prefetch_workers"] = 2
    multi = list(BatchLoader(build_dataset(cfg, "train", mcfg),
                             mcfg, cfg, 1, shuffle=True, seed=3))
    cfg["prefetch"] = False
    sync = list(BatchLoader(build_dataset(cfg, "train", mcfg),
                            mcfg, cfg, 1, shuffle=True, seed=3))
    assert len(multi) == len(sync) > 1
    for bt, bs in zip(multi, sync):
        for key in bt[0]:
            if key == "pyramid":
                a = jax.tree.leaves(bt[0][key])
                b = jax.tree.leaves(bs[0][key])
                for x, y in zip(a, b):
                    np.testing.assert_array_equal(x, y)
            else:
                np.testing.assert_array_equal(
                    bt[0][key], bs[0][key], err_msg=key)
