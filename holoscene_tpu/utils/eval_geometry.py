"""Geometry metrics: chamfer accuracy / completion / completion-ratio + ICP.

Reference semantics: utils/eval_geometry.py:26-210 (nice-slam style) —
  accuracy        = mean_{p in rec} min_{q in gt} ||p - q||
  completion      = mean_{q in gt}  min_{p in rec} ||q - p||
  completion_ratio= mean_{q in gt}  [min dist < tau]   (tau = 5 cm)
with an optional point-to-point ICP alignment of rec onto gt before scoring.
scipy cKDTree replaces open3d.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from holoscene_tpu.utils.mesh import Mesh


def nn_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1)
    return d


def accuracy(rec_pts: np.ndarray, gt_pts: np.ndarray) -> float:
    return float(nn_distances(rec_pts, gt_pts).mean())


def completion(rec_pts: np.ndarray, gt_pts: np.ndarray) -> float:
    return float(nn_distances(gt_pts, rec_pts).mean())


def completion_ratio(rec_pts: np.ndarray, gt_pts: np.ndarray,
                     dist_th: float = 0.05) -> float:
    return float((nn_distances(gt_pts, rec_pts) < dist_th).mean())


def icp_align(
    src: np.ndarray,
    dst: np.ndarray,
    iterations: int = 20,
    threshold: float = 0.1,
) -> np.ndarray:
    """Point-to-point ICP; returns a 4x4 transform mapping src -> dst
    (reference eval_geometry.py:54-110 uses open3d ICP)."""
    T = np.eye(4)
    cur = src.copy()
    tree = cKDTree(dst)
    for _ in range(iterations):
        d, idx = tree.query(cur, k=1)
        mask = d < threshold
        if mask.sum() < 10:
            break
        p = cur[mask]
        q = dst[idx[mask]]
        pc = p - p.mean(0)
        qc = q - q.mean(0)
        h = pc.T @ qc
        u, _, vt = np.linalg.svd(h)
        d_sign = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1, 1, d_sign]) @ u.T
        t = q.mean(0) - r @ p.mean(0)
        step = np.eye(4)
        step[:3, :3] = r
        step[:3, 3] = t
        cur = cur @ r.T + t
        T = step @ T
    return T


def calc_3d_metric(
    rec_mesh: Mesh,
    gt_mesh: Mesh,
    n_samples: int = 200000,
    dist_th: float = 0.05,
    align: bool = True,
    seed: int = 0,
) -> dict:
    """Chamfer metric dict (reference eval_geometry.py:113-210)."""
    rng = np.random.default_rng(seed)
    rec_pts = rec_mesh.sample_surface(n_samples, rng)
    gt_pts = gt_mesh.sample_surface(n_samples, rng)
    if align:
        T = icp_align(rec_pts[:20000], gt_pts[:20000])
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]
    return {
        "accuracy": accuracy(rec_pts, gt_pts),
        "completion": completion(rec_pts, gt_pts),
        "completion_ratio": completion_ratio(rec_pts, gt_pts, dist_th),
    }
