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


def test_obj_dumps(tmp_path, rng):
    from stratified_transformer_tpu.data import ply as P

    pts = rng.uniform(0, 1, (5, 3)).astype(np.float32)
    P.save_obj(tmp_path / "a.obj", pts)
    P.save_obj_color_coding(tmp_path / "b.obj", pts, [0, 1, 2, 3, 30])
    P.save_obj_line(tmp_path / "l.obj", pts[:2], pts[2:4])
    a = (tmp_path / "a.obj").read_text().strip().splitlines()
    assert len(a) == 5 and a[0].startswith("v ")
    b = (tmp_path / "b.obj").read_text().strip().splitlines()
    assert len(b[0].split()) == 7
    lines = (tmp_path / "l.obj").read_text().strip().splitlines()
    assert lines[-1] == "l 3 4"
    got = P.load_obj_vertices(tmp_path / "a.obj")
    np.testing.assert_allclose(got, pts, atol=1e-4)
