"""Cross-framework parity: execute the reference's pure-PyTorch/numpy code
(via tests/ref_shims.py) and assert this framework reproduces it.

Covered oracles (all imported from /root/reference, not re-typed):
  * ``model/stratified_transformer.py`` ``get_indice_pairs`` + ``grid_sample``
    -> exact attention pair-set parity with ``ops.plan.build_attention_plan``
    (band + sparse-band + gather layouts) at several window sizes and both
    shift parities;
  * ``util/voxelize.py`` -> hash + mode-0/1 parity;
  * ``util/lr.py`` schedulers -> lr parity over 100k steps;
  * ``util/transform.py`` -> per-transform output parity under a shared
    RNG stream;
  * ``util/evaluation.py`` ``DetectionMAP`` -> AP / precision / recall
    parity on random boxes;
  * ``util/train_utils.py`` ``instantiation_eval`` -> object decomposition
    parity on fabricated cuboid scenes (see test_instantiation_parity).
"""

import random as _pyrandom

import numpy as np
import pytest
import torch

from ref_shims import load_ref


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _grid_coords(rng, n, lo=1, hi=40):
    """Random coordinates kept >= 0.02 away from every window boundary.

    All window partitions in these tests use ws in {0.2, 0.4} and half-ws
    shifts, so all bin boundaries are multiples of 0.1 relative to the
    per-axis min. Point 0 pins the min to an exact 0.1*lo per axis; every
    other coordinate is 0.1*k + U(0.02, 0.08), so (x - min) stays clear of
    boundaries in both fp32 stacks. (Exactly-on-boundary points trip the
    reference's own inconsistency between voxel_grid truncation and
    floor_divide in mask_mat_prev — a measure-zero fp artifact, not a
    semantic difference.)"""
    base = 0.1 * rng.integers(lo, hi, (n, 3))
    frac = rng.uniform(0.02, 0.08, (n, 3))
    pts = (base + frac).astype(np.float32)
    pts[0] = np.float32(0.1) * lo
    return pts


def _ref_windows(st, xyz_t, batch_t, ws, shifted, large):
    """Window partition exactly as the reference BasicLayer builds it
    (model/stratified_transformer.py:277-300)."""
    size = 2.0 * ws if large else ws
    wst = torch.tensor([size] * 3, dtype=xyz_t.dtype)
    if shifted:
        shift = 0.5 * wst
        return st.grid_sample(xyz_t + shift, batch_t, wst,
                              start=xyz_t.min(0)[0])
    return st.grid_sample(xyz_t, batch_t, wst, start=None)


def _ref_pair_set(st, xyz, batch, offsets, down_idx, ws, parity):
    """Reference (index_0, index_1) pair set for one block parity."""
    xyz_t = torch.from_numpy(xyz)
    batch_t = torch.from_numpy(batch.astype(np.int64))
    _, p2v, counts = _ref_windows(st, xyz_t, batch_t, ws, parity % 2 == 1,
                                  large=False)
    _, new_p2v, new_counts = _ref_windows(st, xyz_t, batch_t, ws,
                                          parity % 2 == 1, large=True)
    wst = torch.tensor([ws] * 3, dtype=xyz_t.dtype)
    i0, i1 = st.get_indice_pairs(
        p2v, counts, new_p2v, new_counts,
        torch.from_numpy(down_idx.astype(np.int64)),
        batch_t, xyz_t, wst, parity)
    return set(zip(i0.numpy().tolist(), i1.numpy().tolist()))


def _plan_pair_set(plan, with_sparse=True):
    """Enumerate (query, key) original-index pairs from an AttentionPlan."""
    order = np.asarray(plan.order)
    seg_s = np.asarray(plan.seg_start)
    seg_e = np.asarray(plan.seg_end)
    valid = np.asarray(plan.valid_sorted)
    pairs = set()
    for p in range(len(order)):
        if not valid[p]:
            continue
        q = int(order[p])
        for t in range(int(seg_s[p]), int(seg_e[p])):
            pairs.add((q, int(order[t])))
    sb = plan.sparse_band
    if with_sparse and sb is not None:
        lw_map = np.asarray(sb.lw_map)
        valid_lw = np.asarray(sb.valid_lw)
        q_skey = np.asarray(sb.q_skey_lw)
        sb_s = np.asarray(sb.sb_start)
        sb_e = np.asarray(sb.sb_end)
        sb_src = np.asarray(sb.sb_src)
        sb_skey = np.asarray(sb.sb_skey)
        sb_valid = np.asarray(sb.sb_valid)
        for p in range(len(lw_map)):
            if not valid_lw[p]:
                continue
            q = int(order[lw_map[p]])
            for s in range(int(sb_s[p]), int(sb_e[p])):
                if sb_valid[s] and sb_skey[s] != q_skey[p]:
                    pairs.add((q, int(order[sb_src[s]])))
    return pairs


def _gather_pair_set(plan):
    """Pairs from the gather (oracle) sparse layout."""
    order = np.asarray(plan.order)
    idx = np.asarray(plan.sparse_idx)
    mask = np.asarray(plan.sparse_mask)
    pairs = set()
    for p in range(len(order)):
        q = int(order[p])
        for s in range(idx.shape[1]):
            if mask[p, s]:
                pairs.add((q, int(order[idx[p, s]])))
    return pairs


# ---------------------------------------------------------------------------
# get_indice_pairs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("parity", [0, 1])
@pytest.mark.parametrize("ws", [0.2, 0.4])
def test_get_indice_pairs_parity(rng, parity, ws):
    """The plan's dense band segments + stratified sparse band reproduce the
    reference pair set exactly (model/stratified_transformer.py:10-42)."""
    import jax.numpy as jnp

    from stratified_transformer_tpu.ops import plan as plan_mod

    st = load_ref("model/stratified_transformer.py")

    counts = [350, 450]
    n = sum(counts)
    xyz = _grid_coords(rng, n)
    batch = np.repeat(np.arange(2), counts).astype(np.int32)
    offsets = np.cumsum(counts).astype(np.int32)

    # arbitrary downsample pick (reference FPS output is an input here)
    down = []
    start = 0
    for c in counts:
        down.append(start + rng.choice(c, c // 8 + 1, replace=False))
        start += c
    down_idx = np.sort(np.concatenate(down)).astype(np.int64)
    is_down = np.zeros(n, bool)
    is_down[down_idx] = True

    ref_pairs = _ref_pair_set(st, xyz, batch, offsets, down_idx, ws, parity)

    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.ones(n, bool),
        ws, shifted=bool(parity % 2), is_down=jnp.asarray(is_down),
        sparse_cap=512, aux_pad=1024, with_sparse_gather=True)

    got_band = _plan_pair_set(plan)
    assert got_band == ref_pairs

    got_gather = (_plan_pair_set(plan, with_sparse=False)
                  | _gather_pair_set(plan))
    assert got_gather == ref_pairs


def test_get_indice_pairs_parity_negative_coords(rng):
    """Same parity with negative coordinates (grid anchored at xyz.min)."""
    import jax.numpy as jnp

    from stratified_transformer_tpu.ops import plan as plan_mod

    st = load_ref("model/stratified_transformer.py")
    n = 500
    xyz = _grid_coords(rng, n, lo=-30, hi=20)
    batch = np.zeros(n, np.int32)
    down_idx = np.sort(rng.choice(n, n // 8 + 1, replace=False)).astype(
        np.int64)
    is_down = np.zeros(n, bool)
    is_down[down_idx] = True

    ref_pairs = _ref_pair_set(st, xyz, batch, np.array([n], np.int32),
                              down_idx, 0.4, 1)
    plan = plan_mod.build_attention_plan(
        jnp.asarray(xyz), jnp.asarray(batch), jnp.ones(n, bool),
        0.4, shifted=True, is_down=jnp.asarray(is_down),
        sparse_cap=512, aux_pad=640)
    assert _plan_pair_set(plan) == ref_pairs


# ---------------------------------------------------------------------------
# voxelize
# ---------------------------------------------------------------------------

def test_voxelize_parity(rng):
    ref_vox = load_ref("util/voxelize.py")
    from stratified_transformer_tpu.data import voxelize as ours

    coord = rng.uniform(-4, 4, (5000, 3)).astype(np.float32)

    # hash parity (int rows; the reference hashes floored float rows)
    disc = np.floor(coord / 0.05)
    np.testing.assert_array_equal(
        ref_vox.fnv_hash_vec(disc), ours.fnv_hash_vec(disc.astype(np.int64)))
    np.testing.assert_array_equal(
        ref_vox.ravel_hash_vec(disc.copy()),
        ours.ravel_hash_vec(disc.astype(np.int64)))

    for ht in ("fnv", "ravel"):
        # val mode: identical sort + counts
        ref_sort, ref_cnt = ref_vox.voxelize(coord, 0.05, ht, mode=1)
        got_sort, got_cnt = ours.voxelize(coord, 0.05, ht, mode=1)
        np.testing.assert_array_equal(ref_sort, got_sort)
        np.testing.assert_array_equal(ref_cnt, got_cnt)

        # train mode: identical random pick under the same global seed
        np.random.seed(7)
        ref_pick = ref_vox.voxelize(coord, 0.05, ht, mode=0)
        np.random.seed(7)
        got_pick = ours.voxelize(coord, 0.05, ht, mode=0)
        np.testing.assert_array_equal(ref_pick, got_pick)


# ---------------------------------------------------------------------------
# LR schedulers
# ---------------------------------------------------------------------------

def _ref_lambda(sched):
    return sched.lr_lambdas[0]


def test_scheduler_parity_100k():
    ref_lr = load_ref("util/lr.py")
    from stratified_transformer_tpu.train import schedulers as ours

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    steps = np.arange(0, 100_000, 37)

    cases = [
        (ref_lr.MultiStepWithWarmup(opt, [60_000, 80_000], 0.1,
                                    warmup_iters=1500, warmup_ratio=1e-6),
         ours.multi_step_with_warmup(1.0, [60_000, 80_000], 0.1, 1500, 1e-6)),
        (ref_lr.PolyLR(opt, max_iter=100_000, power=0.9),
         ours.poly(1.0, 100_000, 0.9)),
        (ref_lr.PolyLRwithWarmup(opt, max_iter=100_000, warmup_iters=1500,
                                 warmup_ratio=1e-6, power=1.0),
         ours.poly_with_warmup(1.0, 100_000, 1.0, 1500, 1e-6)),
        (ref_lr.SquaredLR(opt, max_iter=100_000),
         ours.squared(1.0, 100_000)),
        (ref_lr.ExpLR(opt, step_size=1000, gamma=0.9),
         ours.exponential(1.0, 1000, 0.9)),
    ]
    for ref_sched, our_sched in cases:
        lam = _ref_lambda(ref_sched)
        ref_vals = np.array([lam(int(s)) for s in steps])
        got_vals = np.array([float(our_sched(int(s))) for s in steps])
        np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-6,
                                   err_msg=type(ref_sched).__name__)


def test_step_lr_parity():
    from torch.optim.lr_scheduler import StepLR

    from stratified_transformer_tpu.train import schedulers as ours

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = StepLR(opt, step_size=30, gamma=0.1)
    sch = ours.step_lr(1.0, 30, 0.1)
    for s in range(100):
        np.testing.assert_allclose(float(sch(s)), opt.param_groups[0]["lr"],
                                   rtol=1e-6)
        opt.step()
        sched.step()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

class _TwinRNG:
    """Two identically-seeded Generators: the reference's global np.random /
    random functions are redirected to one, ours consumes the other. Any
    divergence in the call sequence or the math surfaces as a mismatch."""

    def __init__(self, seed):
        self.ours = np.random.default_rng(seed)
        self.ref = np.random.default_rng(seed)

    def patch(self, monkeypatch):
        g = self.ref
        monkeypatch.setattr(np.random, "uniform",
                            lambda *a, **k: g.uniform(*a, **k))
        monkeypatch.setattr(
            np.random, "randn",
            lambda *dims: g.standard_normal(dims if dims else None))
        monkeypatch.setattr(np.random, "rand",
                            lambda *dims: g.uniform(size=dims or None))
        monkeypatch.setattr(np.random, "random",
                            lambda *a, **k: g.uniform(*a, **k))
        monkeypatch.setattr(_pyrandom, "random", lambda: float(g.uniform()))


def test_transform_parity(rng, monkeypatch):
    ref_tf = load_ref("util/transform.py")
    from stratified_transformer_tpu.data import transforms as ours

    cases = [
        (ref_tf.RandomRotate(), ours.RandomRotate()),
        (ref_tf.RandomRotate(along_z=False), ours.RandomRotate(along_z=False)),
        (ref_tf.RandomScale(0.8, 1.2), ours.RandomScale(0.8, 1.2)),
        (ref_tf.RandomShift(0.1), ours.RandomShift(0.1)),
        (ref_tf.RandomShift_test(0.2), ours.FixedShift(0.2)),
        (ref_tf.RandomJitter(0.01, 0.05), ours.RandomJitter(0.01, 0.05)),
        (ref_tf.RandomDropColor(0.8, 0.0), ours.RandomDropColor(0.8, 0.0)),
        (ref_tf.RandomHorizontalFlip("z"), ours.RandomHorizontalFlip("z")),
        (ref_tf.RandomRotatePerturbation(0.06, 0.18),
         ours.RandomRotatePerturbation(0.06, 0.18)),
        (ref_tf.ElasticDistortion(((0.2, 0.4), (0.8, 1.6))),
         ours.ElasticDistortion(((0.2, 0.4), (0.8, 1.6)))),
    ]
    for seed_off, (ref_t, our_t) in enumerate(cases):
        for seed in (11 + seed_off, 12 + seed_off):
            pts = rng.uniform(0, 2, (300, 3)).astype(np.float64)
            col = rng.uniform(0, 255, (300, 3)).astype(np.float64)
            twin = _TwinRNG(seed)
            twin.patch(monkeypatch)
            ref_p, ref_c = ref_t(pts.copy(), col.copy())
            got_p, got_c = our_t(pts.copy(), col.copy(), twin.ours)
            name = type(ref_t).__name__
            np.testing.assert_allclose(got_p, ref_p, rtol=1e-10, atol=1e-12,
                                       err_msg=name + " points")
            if ref_c is not None:
                np.testing.assert_allclose(got_c, ref_c, rtol=1e-10,
                                           atol=1e-12, err_msg=name + " color")


def test_chromatic_transforms_parity(rng, monkeypatch):
    """The reference's Chromatic* / HueSaturation transforms operate on
    [-1, 1] colors with ``(feats+1)*127.5`` wrappers
    (util/transform.py:315-435); ours take 0-255 colors directly. Compare
    in the 0-255 space by unwrapping the reference output."""
    ref_tf = load_ref("util/transform.py")
    from stratified_transformer_tpu.data import transforms as ours

    cases = [
        (ref_tf.ChromaticAutoContrast(randomize_blend_factor=True),
         ours.ChromaticAutoContrast(p=0.2)),
        (ref_tf.ChromaticTranslation(0.1), ours.ChromaticTranslation(0.1)),
        (ref_tf.ChromaticJitter(0.05), ours.ChromaticJitter(0.05)),
        (ref_tf.HueSaturationTranslation(0.5, 0.2),
         ours.HueSaturationTranslation(0.5, 0.2)),
    ]
    for seed, (ref_t, our_t) in enumerate(cases, start=5):
        col255 = rng.integers(0, 256, (300, 3)).astype(np.float64)
        twin = _TwinRNG(seed)
        twin.patch(monkeypatch)
        _, ref_c = ref_t(None, col255 / 127.5 - 1.0)
        _, got_c = our_t(None, col255.copy(), twin.ours)
        ref_c255 = (np.asarray(ref_c) + 1.0) * 127.5
        np.testing.assert_allclose(got_c, ref_c255, rtol=1e-9, atol=1e-9,
                                   err_msg=type(ref_t).__name__)


# ---------------------------------------------------------------------------
# box mAP
# ---------------------------------------------------------------------------

def _random_boxes(rng, n, lo=0.0, hi=8.0):
    c = rng.uniform(lo + 1, hi - 1, (n, 3))
    half = rng.uniform(0.2, 1.0, (n, 3))
    return np.concatenate([c - half, c + half], axis=1)


def test_box_map_parity(rng):
    ref_ev = load_ref("util/evaluation.py")
    from stratified_transformer_tpu.eval import box_map as ours

    ref_map = ref_ev.DetectionMAP(1, overlap_threshold=0.25)
    our_map = ours.DetectionMAP(overlap_threshold=0.25)

    for _ in range(6):
        gt = _random_boxes(rng, int(rng.integers(3, 9)))
        # predictions: jittered copies of some GT + random spurious boxes
        take = gt[rng.choice(len(gt), int(rng.integers(1, len(gt) + 1)),
                             replace=False)]
        jit = take + rng.normal(0, 0.08, take.shape)
        spurious = _random_boxes(rng, int(rng.integers(0, 4)))
        pred = np.concatenate([jit, spurious], axis=0)
        ref_map.evaluate(pred, gt)
        our_map.evaluate(pred, gt)

    acc = ref_map.total_accumulators[0]
    np.testing.assert_allclose(our_map.precision, acc.precision, rtol=1e-9)
    np.testing.assert_allclose(our_map.recall, acc.recall, rtol=1e-9)
    assert our_map.tp == acc.TP
    assert our_map.fn == acc.FN

    ref_map.finalize()
    np.testing.assert_allclose(our_map.ap(11), ref_map.mAP(), rtol=1e-9)
    ref_map.finalize_precision()
    ref_map.finalize_recall()
    s = our_map.summary()
    np.testing.assert_allclose(s["mean_precision"], ref_map.mean_precision,
                               rtol=1e-9)
    np.testing.assert_allclose(s["mean_recall"], ref_map.mean_recall,
                               rtol=1e-9)


# ---------------------------------------------------------------------------
# instantiation (DCF cuboid decomposition)
# ---------------------------------------------------------------------------

def _cuboid_scene(origin, size=1.0, spacing=0.02, margin=0.06):
    """Dense surface samples of an axis-aligned cube with per-face (0-5)
    and per-edge (6-17) class labels matching the DCF lookup_face topology:
    opposite faces are (0,5), (1,4), (2,3)."""
    o = np.asarray(origin, np.float64)
    ts = np.arange(margin, size - margin / 2, spacing)
    face_pts, face_lbl = [], []

    # face axis/value: 0:x=0, 5:x=1, 1:y=0, 4:y=1, 2:z=0, 3:z=1
    spec = {0: (0, 0.0), 5: (0, size), 1: (1, 0.0), 4: (1, size),
            2: (2, 0.0), 3: (2, size)}
    for cls, (ax, val) in spec.items():
        u, v = np.meshgrid(ts, ts)
        pts = np.zeros((u.size, 3))
        other = [a for a in range(3) if a != ax]
        pts[:, other[0]] = u.ravel()
        pts[:, other[1]] = v.ravel()
        pts[:, ax] = val
        face_pts.append(pts + o)
        face_lbl.append(np.full(u.size, cls))

    # edges: class 6+c adjacent to faces LOOKUP_FACE[c]
    from stratified_transformer_tpu.eval.instantiation import LOOKUP_FACE
    te = np.arange(margin, size - margin / 2, spacing)
    for c, (fa, fb) in enumerate(LOOKUP_FACE):
        axa, va = spec[fa]
        axb, vb = spec[fb]
        free = [a for a in range(3) if a not in (axa, axb)][0]
        pts = np.zeros((len(te), 3))
        pts[:, axa] = va
        pts[:, axb] = vb
        pts[:, free] = te
        face_pts.append(pts + o)
        face_lbl.append(np.full(len(te), 6 + c))

    return np.concatenate(face_pts), np.concatenate(face_lbl).astype(int)


def test_instantiation_parity(rng, tmp_path):
    """Reference ``instantiation_eval`` (util/train_utils.py:547-739) vs
    ``eval.instantiation.instantiate`` on a fabricated two-cuboid scene:
    same object count and matching per-object AABBs."""
    tu = load_ref("util/train_utils.py")
    from stratified_transformer_tpu.eval import instantiation as ours

    pts_a, lbl_a = _cuboid_scene((0.0, 0.0, 0.0), size=1.0)
    pts_b, lbl_b = _cuboid_scene((2.5, 0.3, 0.1), size=0.8)
    samples = np.concatenate([pts_a, pts_b])
    labels = np.concatenate([lbl_a, lbl_b])
    # small offset noise, well under DBSCAN eps
    offsets = rng.normal(0, 0.004, samples.shape)

    ref_out = tu.instantiation_eval(str(tmp_path), "scene", samples.copy(),
                                    offsets.copy(), labels.copy())
    got_out = ours.instantiate(samples.copy(), offsets.copy(), labels.copy())

    assert len(got_out) == len(ref_out) == 2

    def boxes(objs):
        bx = [np.concatenate([o.min(0), o.max(0)]) for o in objs]
        return np.stack(sorted(bx, key=lambda b: tuple(b)))

    # voxel_down_sample averages per voxel (open3d) vs representative-point
    # downsampling on our side: AABBs agree within one 4 cm voxel.
    np.testing.assert_allclose(boxes(got_out), boxes(ref_out), atol=0.05)


def test_compute_partial_iou_parity(rng):
    """Reference ``compute_partial_iou`` (util/train_utils.py:840-862) vs
    ``eval.instantiation.compute_partial_iou`` on random box pairs."""
    tu = load_ref("util/train_utils.py")
    from stratified_transformer_tpu.eval import instantiation as ours

    for _ in range(300):
        a = np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(0.1, 2, 3)])
        b = np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(0.1, 2, 3)])
        ref = tu.compute_partial_iou(a.copy(), b.copy())
        got = ours.compute_partial_iou(a, b)
        assert tuple(map(bool, ref)) == tuple(map(bool, got)), (a, b)
    # identical boxes and contained boxes
    a = np.array([0, 0, 0, 1, 1, 1.0])
    assert tuple(map(bool, tu.compute_partial_iou(a, a))) == \
        tuple(map(bool, ours.compute_partial_iou(a, a)))


def test_merge_loop_parity(rng):
    """Execute the reference's inline bbox-merge loop (test.py:296-327,
    driven by its own ``compute_partial_iou``) on fabricated supports and
    assert ``merge_instances`` produces the identical partition."""
    from scipy.spatial import distance
    tu = load_ref("util/train_utils.py")
    from stratified_transformer_tpu.eval import instantiation as ours

    def ref_merge(instances):
        # the reference's loop verbatim in semantics (test.py:274-327),
        # with trimesh bounding_box replaced by the numpy AABB it computes
        inst_list = list(instances)
        if len(instances) < 2:
            return inst_list
        cnt, end_cnt = 0, len(instances)
        while cnt < end_cnt:
            cur_inst = inst_list.pop(0)
            merge_list, remain_list = [], [cur_inst]
            merge_list.append(cur_inst)
            remain_list = []
            while len(inst_list) != 0:
                targ_inst = inst_list.pop(0)
                cb = np.concatenate([(cur_inst.min(0) + cur_inst.max(0)) / 2,
                                     cur_inst.max(0) - cur_inst.min(0)])
                tb = np.concatenate([(targ_inst.min(0) + targ_inst.max(0))
                                     / 2,
                                     targ_inst.max(0) - targ_inst.min(0)])
                ov1, ov2 = tu.compute_partial_iou(cb, tb)
                num_neighbor = np.sum(np.min(
                    distance.cdist(cur_inst, targ_inst), axis=0) < 0.2)
                if (ov1 or ov2) and num_neighbor > 10:
                    merge_list.append(targ_inst)
                else:
                    remain_list.append(targ_inst)
            remain_list.append(np.concatenate(merge_list))
            inst_list = remain_list
            cnt += 1
        return inst_list

    for trial in range(10):
        supports = []
        for _ in range(rng.integers(2, 7)):
            o = rng.uniform(0, 3, 3)
            sz = rng.uniform(0.3, 1.2, 3)
            supports.append(o + rng.uniform(0, 1, (80, 3)) * sz)
        ref = ref_merge([s.copy() for s in supports])
        got = ours.merge_instances([s.copy() for s in supports])
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.sort(r, axis=0), np.sort(g, axis=0))


def test_instance_eval_pseudo_parity(rng):
    """Reference ``instance_eval_pseudo`` (util/train_utils.py:399-436) vs
    ``eval.instantiation.instance_eval_pseudo``: EXACT equality of the
    concatenated segments / labels / offsets / masks on a fabricated
    multi-cluster scene (same sklearn DBSCAN underneath)."""
    tu = load_ref("util/train_utils.py")
    from stratified_transformer_tpu.eval.instantiation import (
        instance_eval_pseudo)

    # 3 classes, each with 2 well-separated blobs + a few isolated noise
    # points (exercises the noise-cluster-as-segment quirk and the
    # len<10 mask zeroing)
    pts, labels = [], []
    for c in range(3):
        for b in range(2):
            center = np.array([3.0 * c, 2.0 * b, 0.0])
            pts.append(center + rng.normal(0, 0.03, (40, 3)))
            labels.append(np.full(40, c))
        pts.append(np.array([[3.0 * c + 1.2, 5.0 + c, 3.0]]))  # isolated
        labels.append(np.full(1, c))
    samples = np.concatenate(pts).astype(np.float64)
    pred_labels = np.concatenate(labels).astype(np.int64)
    pred_offset = rng.normal(0, 0.01, samples.shape)
    confidence = rng.uniform(0, 1, len(samples))

    ref = tu.instance_eval_pseudo(
        samples.copy(), pred_offset.copy(), pred_labels.copy(),
        confidence.copy())
    got = instance_eval_pseudo(samples, pred_offset, pred_labels,
                               confidence)
    for r, g, name in zip(ref, got, ("seg", "label", "offset", "mask")):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g), err_msg=name)
    # masks bite: the isolated points' singleton/noise segments are masked
    assert (np.asarray(got[3]) == 0).any()
    assert (np.asarray(got[3]) == 1).any()
