"""Cuboid instance decomposition from predicted offsets (DCF fork).

Re-derivation of ``util/train_utils.py:547-739`` (``instantiation_eval``):
  1. shift points by their predicted offset (``coord + pred_offset``);
  2. per semantic class, DBSCAN-cluster the shifted points
     (faces, class < 6: eps 0.1 / min_samples 5 / keep clusters > 50 pts;
     edges, class >= 6: eps 0.15 / min_samples 3 / keep > 20 pts) and keep
     the *original* coordinates of each cluster;
  3. pair each edge instance with its two adjacent face classes via the
     cube-topology ``lookup_face`` adjacency, by the fraction of edge points
     within 8 cm of the face instance (> 0.5);
  4. union-merge pair sets sharing instances; concatenate each merged group's
     face points into one object support;
  5. light outlier removal (voxel downsample + radius filter) per object.

All CPU/numpy + scikit-learn (the reference also runs this on CPU).
"""

from __future__ import annotations

from typing import List

import numpy as np
from scipy.spatial import distance
from sklearn.cluster import DBSCAN

# Adjacent face class ids for each of the 12 cube edges
# (reference ``lookup_face``, train_utils.py:601).
LOOKUP_FACE = [
    [0, 1], [0, 2], [1, 2], [0, 3], [1, 3], [0, 4],
    [2, 4], [3, 4], [1, 5], [2, 5], [3, 5], [4, 5],
]


def cluster_instances(samples, pred_offset, pred_labels, num_face_classes=6):
    """Steps 1-2: per-class DBSCAN on offset-shifted points.

    Returns (cls_list, indice_list): per class, the list of instances (each
    an ``[m, 3]`` array of *original* coordinates), and their global
    instance ids.
    """
    shifted = samples + pred_offset
    cls_list: List[List[np.ndarray]] = []
    indice_list: List[List[int]] = []
    inst_idx = 0
    n_classes = int(pred_labels.max()) + 1 if len(pred_labels) else 0
    for c in range(n_classes):
        sel = pred_labels == c
        pts_trans = shifted[sel]
        pts_ori = samples[sel]
        if c < num_face_classes:
            eps, min_samples, thre = 0.1, 5, 50
        else:
            eps, min_samples, thre = 0.15, 3, 20
        instances: List[np.ndarray] = []
        if len(pts_trans) >= min_samples:
            db = DBSCAN(eps=eps, min_samples=min_samples).fit(pts_trans)
            for j in range(db.labels_.max() + 1):
                inst = pts_ori[db.labels_ == j]
                if len(inst) > thre:
                    instances.append(inst)
        ids = []
        for _ in instances:
            ids.append(inst_idx)
            inst_idx += 1
        cls_list.append(instances)
        indice_list.append(ids)
    return cls_list, indice_list


def pair_edges_to_faces(cls_list, indice_list, num_face_classes=6,
                        contact_dist=0.08, contact_ratio=0.5):
    """Step 3: edge->face adjacency pairing (train_utils.py:598-648)."""
    f_cls = cls_list[:num_face_classes]
    e_cls = cls_list[num_face_classes:]
    pair_list: List[List[int]] = []
    for cls_idx, e_list in enumerate(e_cls[:12]):
        f_idx1, f_idx2 = LOOKUP_FACE[cls_idx]
        f1, f2 = f_cls[f_idx1], f_cls[f_idx2]
        id1, id2 = indice_list[f_idx1], indice_list[f_idx2]
        if not f1 or not f2:
            continue
        for e_supp in e_list:
            paired = []
            for k, fs in enumerate(f1):
                d = np.min(distance.cdist(e_supp, fs), axis=1)
                if np.sum(d < contact_dist) / len(d) > contact_ratio:
                    paired.append(id1[k])
                    break
            for k, fs in enumerate(f2):
                d = np.min(distance.cdist(e_supp, fs), axis=1)
                if np.sum(d < contact_dist) / len(d) > contact_ratio:
                    paired.append(id2[k])
                    break
            if paired:
                pair_list.append(paired)
    return pair_list


def merge_pairs(pair_list):
    """Step 4: union-find style merging of id sets sharing members
    (train_utils.py:666-689)."""
    groups = [set(p) for p in pair_list]
    merged = True
    while merged:
        merged = False
        out: List[set] = []
        for g in groups:
            hit = None
            for o in out:
                if o & g:
                    hit = o
                    break
            if hit is not None:
                hit |= g
                merged = True
            else:
                out.append(set(g))
        groups = out
    return [sorted(g) for g in groups]


def _voxel_downsample(pts, voxel=0.04):
    keys = np.floor(pts / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return pts[np.sort(idx)]


def _radius_outlier_filter(pts, nb_points=3, radius=0.1):
    if len(pts) == 0:
        return pts
    d = distance.cdist(pts, pts)
    neighbors = (d <= radius).sum(1) - 1
    return pts[neighbors >= nb_points - 1]


def instantiate(samples, pred_offset, pred_labels, num_face_classes=6):
    """Full pipeline -> list of per-object support point arrays
    (reference ``instantiation_eval`` return value)."""
    cls_list, indice_list = cluster_instances(
        samples, pred_offset, pred_labels, num_face_classes)
    pair_list = pair_edges_to_faces(cls_list, indice_list, num_face_classes)
    groups = merge_pairs(pair_list)
    flat_faces = [i for sub in cls_list[:num_face_classes] for i in sub]
    out = []
    for g in groups:
        supp = np.concatenate([flat_faces[i] for i in g
                               if i < len(flat_faces)])
        supp = _voxel_downsample(supp, 0.04)
        supp = _radius_outlier_filter(supp, 3, 0.1)
        if len(supp):
            out.append(supp)
    return out


def instance_eval_pseudo(samples, pred_offset, pred_labels, confidence):
    """Pseudo-label segment generation (reference ``util/train_utils.py:
    399-436``): per predicted class, DBSCAN (eps 0.15 / min_samples 3) the
    offset-shifted points; every cluster — including the DBSCAN noise
    group — becomes a segment with a recomputed center offset
    ``center - pts`` and a validity mask.

    Faithful reference quirks kept: the noise cluster is emitted as a
    regular segment (the reference's ``j == -1`` guard is dead code — its
    loop variable starts at 0), so only ``len(segment) < 10`` zeroes a
    mask; ``confidence`` is threaded but unused (the reference's
    ``mask[confi < 0.8] = 0`` is commented out).

    Returns ``(segments [N,3], labels [N], offsets [N,3], mask [N])``
    concatenated over classes and clusters, in class-major cluster order.
    """
    from sklearn.cluster import DBSCAN

    samples = np.asarray(samples)
    shifted = samples + np.asarray(pred_offset)
    pred_labels = np.asarray(pred_labels)
    confidence = np.asarray(confidence)
    segs, labels, offsets, masks = [], [], [], []
    eps, min_samples, thre = 0.15, 3, 10
    for i in range(int(pred_labels.max()) + 1):
        sel = pred_labels == i
        if not sel.any():
            continue                  # (reference would crash on empty fit)
        pts_trans = shifted[sel]
        pts_ori = samples[sel]
        db = DBSCAN(eps=eps, min_samples=min_samples).fit(pts_trans)
        for j in range(db.labels_.max() + 2):
            seg = pts_ori[db.labels_ == j - 1]
            # empty noise group: offsets are empty either way; avoid the
            # reference's nan-mean RuntimeWarning
            center = np.mean(seg, axis=0) if len(seg) else np.zeros(3)
            mask = np.ones(len(seg))
            if len(seg) < thre:
                mask = np.zeros(len(seg))
            segs.append(seg)
            labels.append(np.ones(len(seg)) * i)
            offsets.append(center - seg)
            masks.append(mask)
    return (np.concatenate(segs), np.concatenate(labels),
            np.concatenate(offsets), np.concatenate(masks))


def support_to_box(supp):
    """Axis-aligned box [x1,y1,z1,x2,y2,z2] of a support set."""
    return np.concatenate([supp.min(0), supp.max(0)])


def compute_partial_iou(box_a, box_b):
    """Partial-overlap test between two AABBs given as (center, lengths).

    Returns (overlap_frac_a > 0.3, overlap_frac_b > 0.3) where
    ``overlap_frac_x`` is intersection volume over box x's own volume —
    i.e. "is a large share of this box inside the other".
    Re-derivation of the reference ``compute_partial_iou``
    (``util/train_utils.py:840-862``).
    """
    box_a = np.asarray(box_a, float)
    box_b = np.asarray(box_b, float)
    hi = np.minimum(box_a[0:3] + box_a[3:6] / 2, box_b[0:3] + box_b[3:6] / 2)
    lo = np.maximum(box_a[0:3] - box_a[3:6] / 2, box_b[0:3] - box_b[3:6] / 2)
    if not (hi > lo).all():
        return False, False
    inter = (hi - lo).prod()
    thre = 0.3
    return (inter / box_a[3:6].prod()) > thre, \
        (inter / box_b[3:6].prod()) > thre


def _aabb_center_lengths(pts):
    lo, hi = pts.min(0), pts.max(0)
    return np.concatenate([(lo + hi) / 2, hi - lo])


def merge_instances(instances, pc_thre=0.2, min_neighbors=10):
    """Greedy bbox merging of instance supports (fork post-processing).

    Each pass pops the first instance and absorbs every remaining instance
    whose axis-aligned bbox overlaps it by >30% of either box's volume
    (``compute_partial_iou``) AND that is placed seamlessly against it
    (more than ``min_neighbors`` of its points within ``pc_thre`` of the
    current instance); the concatenated group is re-appended at the end.
    Runs one pass per *original* instance. Re-derivation of the reference
    merge loop (``test.py:296-327``).
    """
    inst_list = [np.asarray(x) for x in instances]
    if len(inst_list) < 2:
        return inst_list
    for _ in range(len(inst_list)):
        cur = inst_list.pop(0)
        cur_box = _aabb_center_lengths(cur)
        merged = [cur]
        remain = []
        for targ in inst_list:
            ov1, ov2 = compute_partial_iou(
                cur_box, _aabb_center_lengths(targ))
            seamless = False
            if ov1 or ov2:
                d = np.min(distance.cdist(cur, targ), axis=0)
                seamless = np.sum(d < pc_thre) > min_neighbors
            if (ov1 or ov2) and seamless:
                merged.append(targ)
            else:
                remain.append(targ)
        remain.append(np.concatenate(merged) if len(merged) > 1 else cur)
        inst_list = remain
    return inst_list
