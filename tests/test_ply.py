"""PLY / OBJ IO roundtrip tests."""

import numpy as np

from stratified_transformer_tpu.data.ply import (
    load_obj_vertices, read_ply, save_colored_by_label, write_ply_points)


def test_binary_roundtrip(tmp_path, rng):
    xyz = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = tmp_path / "t.ply"
    write_ply_points(p, xyz, rgb)
    v = read_ply(p)["vertex"]
    np.testing.assert_allclose(
        np.stack([v["x"], v["y"], v["z"]], 1), xyz, atol=1e-6)
    assert (np.stack([v["red"], v["green"], v["blue"]], 1) == rgb).all()


def test_ascii_roundtrip(tmp_path, rng):
    xyz = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    p = tmp_path / "t.ply"
    write_ply_points(p, xyz, binary=False)
    v = read_ply(p)["vertex"]
    np.testing.assert_allclose(v["x"], xyz[:, 0], atol=1e-4)


def test_obj_color_coding(tmp_path, rng):
    xyz = rng.uniform(0, 1, (30, 3)).astype(np.float32)
    p = tmp_path / "t.obj"
    save_colored_by_label(p, xyz, np.arange(30), fmt="obj")
    v = load_obj_vertices(p)
    np.testing.assert_allclose(v, xyz, atol=1e-5)
