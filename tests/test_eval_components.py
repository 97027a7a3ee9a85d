"""Tests for eval-side components: voting, instantiation, box mAP."""

import numpy as np

from stratified_transformer_tpu.eval import box_map, instantiation, voting


def test_vote_chunks_cover_all_points(rng):
    coord = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    chunks = voting.vote_chunks(coord, 0.2)
    seen = np.concatenate(chunks)
    assert set(seen.tolist()) == set(range(500))
    # chunk 0 has one point per occupied voxel
    key = np.floor((coord - coord.min(0)) / 0.2).astype(np.int64)
    n_vox = len(np.unique(key, axis=0))
    assert len(chunks[0]) == n_vox


def test_sphere_cover_visits_everything(rng):
    coord = rng.uniform(0, 4, (1000, 3)).astype(np.float32)
    crops = voting.sphere_cover_crops(coord, 150, np.random.default_rng(0))
    seen = np.unique(np.concatenate(crops))
    assert len(seen) == 1000
    assert all(len(c) == 150 for c in crops)


def test_box_iou_and_matching():
    a = np.array([[0, 0, 0, 1, 1, 1], [2, 2, 2, 3, 3, 3]], float)
    b = np.array([[0, 0, 0, 1, 1, 1], [10, 10, 10, 11, 11, 11]], float)
    iou = box_map.box_iou(a, b)
    assert np.isclose(iou[0, 0], 1.0)
    assert iou[1, 1] == 0.0
    tp, fp, fn = box_map.match_boxes(iou, 0.5)
    assert (tp, fp, fn) == (1, 1, 1)


def test_detection_map_running():
    m = box_map.DetectionMAP(0.5)
    pred = np.array([[0, 0, 0, 1, 1, 1]])
    gt = np.array([[0.1, 0, 0, 1.1, 1, 1], [5, 5, 5, 6, 6, 6]])
    m.evaluate(pred, gt)
    s = m.summary()
    assert s["tp"] == 1 and s["fn"] == 1 and s["fp"] == 0
    assert s["mean_precision"] == 1.0 and s["mean_recall"] == 0.5


def test_instantiation_two_cubes(rng):
    """Two separated clusters of face-class points -> two objects after
    clustering + merging (edges omitted -> no pairing, still two groups via
    singleton pair lists)."""
    c1 = rng.normal(0, 0.02, (200, 3)) + np.array([0, 0, 0])
    c2 = rng.normal(0, 0.02, (200, 3)) + np.array([5, 5, 5])
    samples = np.concatenate([c1, c2]).astype(np.float64)
    offsets = np.zeros_like(samples)
    labels = np.zeros(len(samples), np.int64)  # all face class 0
    cls_list, ids = instantiation.cluster_instances(samples, offsets, labels)
    assert len(cls_list[0]) == 2

    groups = instantiation.merge_pairs([[0, 1], [1, 2], [5]])
    assert sorted(map(tuple, groups)) == [(0, 1, 2), (5,)]


def test_support_to_box():
    pts = np.array([[0, 1, 2], [3, 4, 5]], float)
    np.testing.assert_array_equal(
        instantiation.support_to_box(pts), [0, 1, 2, 3, 4, 5])
