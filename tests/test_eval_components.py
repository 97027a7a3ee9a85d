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
    tps, fps, fn = box_map.match_boxes(iou, 0.5)
    assert (len(tps), len(fps), fn) == (1, 1, 1)
    assert np.isclose(tps[0], 1.0)


def test_detection_map_running():
    m = box_map.DetectionMAP(0.5)
    pred = np.array([[0, 0, 0, 1, 1, 1]])
    gt = np.array([[0.1, 0, 0, 1.1, 1, 1], [5, 5, 5, 6, 6, 6]])
    m.evaluate(pred, gt)
    s = m.summary()
    assert s["tp"] == 1 and s["fn"] == 1 and s["fp"] == 0
    assert s["mean_precision"] == 1.0 and s["mean_recall"] == 0.5
    # ranked AP: one TP at recall 0.5 -> interpolated PR plateau
    assert 0.0 < s["AP"] <= 1.0
    p, r = m.pr_curve(pr_samples=11)
    assert len(p) == len(r) == 11


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


def test_scene_prep_outliers_and_alignment(rng):
    from stratified_transformer_tpu.eval import scene_prep
    # dense slab rotated 30 degrees + far outliers
    n = 2000
    pts = np.stack([
        rng.uniform(0, 4, n), rng.uniform(0, 1, n),
        rng.uniform(0, 0.3, n)], 1)
    ang = np.deg2rad(30)
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    pts = pts @ rot.T
    outliers = rng.uniform(50, 60, (20, 3))
    allpts = np.concatenate([pts, outliers]).astype(np.float32)

    aligned, _, keep = scene_prep.prepare_custom_scene(
        allpts, eps=0.3, min_samples=5)
    assert keep[:n].mean() > 0.99 and keep[n:].sum() == 0
    # after alignment, the dominant direction is axis-aligned: the bbox
    # area should be near the un-rotated slab's (4 x 1), not the rotated
    # slab's AABB
    ext = aligned.max(0) - aligned.min(0)
    area = ext[0] * ext[1]
    assert area < 4.0 * 1.0 * 1.25, (ext, area)


def test_mix3d_pairs(rng):
    from stratified_transformer_tpu.data.collate import mix3d_pairs
    scenes = [{"xyz": rng.uniform(0, 1, (10, 3)).astype(np.float32),
               "feats": np.ones((10, 3), np.float32),
               "labels": np.full(10, i, np.int32)} for i in range(3)]
    mixed = mix3d_pairs(scenes)
    assert len(mixed) == 2
    assert len(mixed[0]["xyz"]) == 20
    assert set(np.unique(mixed[0]["labels"])) == {0, 1}
    assert len(mixed[1]["xyz"]) == 10


def test_extra_schedulers():
    import jax.numpy as jnp
    from stratified_transformer_tpu.train import schedulers as S
    st = S.step_lr(1.0, 10, 0.5)
    assert float(st(jnp.asarray(9))) == 1.0
    assert float(st(jnp.asarray(10))) == 0.5
    oc = S.one_cycle(1.0, 100, pct_start=0.3)
    assert float(oc(jnp.asarray(0))) < 0.1
    assert abs(float(oc(jnp.asarray(30))) - 1.0) < 1e-5
    assert float(oc(jnp.asarray(100))) < 0.01


def test_compute_partial_iou_cases():
    # identical boxes: full overlap both ways
    a = np.array([0, 0, 0, 1, 1, 1], float)
    assert instantiation.compute_partial_iou(a, a) == (True, True)
    # disjoint boxes
    b = np.array([5, 5, 5, 1, 1, 1], float)
    assert instantiation.compute_partial_iou(a, b) == (False, False)
    # small box fully inside big box: >30% of small only
    small = np.array([0, 0, 0, 0.5, 0.5, 0.5], float)
    big = np.array([0, 0, 0, 2, 2, 2], float)
    ov_big, ov_small = instantiation.compute_partial_iou(big, small)
    assert (ov_big, ov_small) == (False, True)
    # touching boxes (zero-volume intersection) do not overlap
    c = np.array([1, 0, 0, 1, 1, 1], float)
    assert instantiation.compute_partial_iou(a, c) == (False, False)


def test_merge_instances_adjacent_cuboids(rng):
    """Two interpenetrating, seamlessly-adjacent supports merge into one
    object; a distant third survives. Hand-computed: grids of 400 points at
    0.05 spacing, B shifted +0.9 in x -> intersection 0.1x1x0 ... use
    overlapping slabs with >30% volume overlap and >10 contact points."""
    def slab(origin, size=(1.0, 1.0, 0.3), step=0.05):
        xs = np.arange(0, size[0] + 1e-9, step)
        ys = np.arange(0, size[1] + 1e-9, step)
        zs = np.arange(0, size[2] + 1e-9, step)
        g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
        return g.reshape(-1, 3) + np.asarray(origin)

    a = slab((0.0, 0.0, 0.0))
    b = slab((0.5, 0.0, 0.0))       # 50% x-overlap with a, touching points
    far = slab((10.0, 0.0, 0.0))
    out = instantiation.merge_instances([a, b, far])
    assert len(out) == 2
    sizes = sorted(len(o) for o in out)
    assert sizes == [len(far), len(a) + len(b)]
    # non-adjacent but overlapping boxes do NOT merge (seamlessness gate):
    # sparse far-apart points whose AABBs overlap
    sp_a = np.array([[0, 0, 0], [1, 1, 1.0]])
    sp_b = np.array([[0.1, 0.1, 0.4], [0.9, 0.9, 0.6]])
    out2 = instantiation.merge_instances([sp_a, sp_b])
    assert len(out2) == 2


def test_merge_instances_chain_reappended():
    """Reference loop re-appends the merged group at the END and runs one
    pass per original instance -> a chain a-b-c collapses fully even when
    a and c are not directly mergeable (their boxes only touch)."""
    def slab(x0, size=(1.0, 1.0, 0.3), step=0.05):
        xs = np.arange(0, size[0] + 1e-9, step)
        ys = np.arange(0, size[1] + 1e-9, step)
        zs = np.arange(0, size[2] + 1e-9, step)
        g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
        return g.reshape(-1, 3) + np.array([x0, 0.0, 0.0])

    a, b, c = slab(0.0), slab(0.5), slab(1.0)
    # a-c boxes only touch (zero-volume intersection) -> not mergeable
    # directly; b bridges them across passes
    out = instantiation.merge_instances([a, c, b])
    assert len(out) == 1
    assert len(out[0]) == 3 * len(a)
