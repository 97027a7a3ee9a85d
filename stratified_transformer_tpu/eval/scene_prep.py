"""Custom-scene preprocessing for the fork inference pipeline.

Mirrors the reference fork's ``data_load_custom`` (``test.py:117-156``):
  * load an .obj mesh's vertices (here via ``data.ply.load_obj_vertices``);
  * DBSCAN outlier removal: keep the largest cluster(s), drop noise
    (reference ``test.py:122-127``);
  * orientation normalization: align the scene's dominant horizontal axes
    to the coordinate axes (the reference uses open3d's OBB; here the OBB
    is derived from the horizontal PCA of the cleaned points — same
    effect: axis-aligned boxes become meaningful for cuboid decomposition);
  * shift to the min corner.
"""

from __future__ import annotations

import numpy as np
from sklearn.cluster import DBSCAN


def remove_outliers(points, eps=0.2, min_samples=10, keep_ratio=0.05):
    """Drop DBSCAN noise and tiny clusters (< keep_ratio of the largest)."""
    db = DBSCAN(eps=eps, min_samples=min_samples).fit(points)
    labels = db.labels_
    keep = np.zeros(len(points), bool)
    sizes = {}
    for lab in set(labels.tolist()):
        if lab == -1:
            continue
        sizes[lab] = (labels == lab).sum()
    if not sizes:
        return points, np.ones(len(points), bool)
    biggest = max(sizes.values())
    for lab, sz in sizes.items():
        if sz >= keep_ratio * biggest:
            keep |= labels == lab
    return points[keep], keep


def horizontal_obb_align(points, upright_axis=2):
    """Rotate about the upright axis so the dominant horizontal direction
    aligns with +x (PCA-based oriented-bounding-box alignment).

    Returns (aligned_points, rotation_matrix) with
    ``aligned = points @ rotation``.
    """
    pts = np.asarray(points, np.float64)
    horiz = [a for a in range(3) if a != upright_axis]
    centered = pts[:, horiz] - pts[:, horiz].mean(0)
    cov = centered.T @ centered / max(len(pts), 1)
    w, v = np.linalg.eigh(cov)
    major = v[:, np.argmax(w)]
    angle = np.arctan2(major[1], major[0])
    # row-vector convention: ``x @ rot`` rotates by -angle, taking the
    # major axis onto +x
    c, s = np.cos(angle), np.sin(angle)
    rot = np.eye(3)
    rot[np.ix_(horiz, horiz)] = np.array([[c, -s], [s, c]])
    aligned = pts @ rot
    return aligned.astype(np.float32), rot


def prepare_custom_scene(path_or_points, eps=0.2, min_samples=10):
    """Full pipeline: load -> outlier removal -> OBB align -> min-corner
    shift. Returns (points, rotation, keep_mask)."""
    if isinstance(path_or_points, str):
        from stratified_transformer_tpu.data.ply import load_obj_vertices

        points = load_obj_vertices(path_or_points)
    else:
        points = np.asarray(path_or_points, np.float32)
    cleaned, keep = remove_outliers(points, eps, min_samples)
    aligned, rot = horizontal_obb_align(cleaned)
    aligned = aligned - aligned.min(0)
    return aligned, rot, keep
