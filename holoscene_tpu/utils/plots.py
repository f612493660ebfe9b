"""Per-object mesh extraction from the compositional SDF field.

Reference semantics: utils/plots.py:317-422 (`get_surface_sliding` — sliding
-window marching cubes with point culling) and :688-860
(`get_semantic_surface_trace_colors_mask_filter` — per-object MC with bbox
partitioning), plus training/holoscene_train.py:620 (`generate_bbox`).

TPU-first shape: one coarse full-volume sweep of ALL K object SDFs (chunked,
fixed shapes, single compiled function) finds each object's occupied bbox;
each object then gets a fine grid evaluation restricted to its bbox. The
coarse sweep replaces the reference's per-window point-pyramid culling — the
device evaluates dense chunks at full utilization and the host does the
culling logic.
"""

from __future__ import annotations

import json
import os

import numpy as np

from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh


def _eval_grid_multi(sdf_raw_fn, resolution: int, bounds, chunk: int):
    """Evaluate sdf_raw_fn ([M,3] -> [M,K]) on a dense grid.

    Returns [R, R, R, K] float32 (host).
    """
    import jax.numpy as jnp

    lo, hi = bounds
    axis = np.linspace(lo, hi, resolution, dtype=np.float32)
    xs, ys, zs = np.meshgrid(axis, axis, axis, indexing="ij")
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), dtype=np.float32)])
    out = None
    for i in range(0, pts.shape[0], chunk):
        vals = np.asarray(sdf_raw_fn(jnp.asarray(pts[i : i + chunk])))
        if out is None:
            out = np.empty((pts.shape[0], vals.shape[1]), dtype=np.float32)
        out[i : i + chunk] = vals
    return out[:n].reshape(resolution, resolution, resolution, -1)


def extract_object_meshes(
    sdf_raw_fn,
    num_objects: int,
    resolution: int = 256,
    grid_boundary=(-1.0, 1.0),
    coarse_resolution: int = 64,
    chunk: int = 262144,
    bbox_pad: float = 0.05,
    min_component_faces: int = 0,
    only: "set[int] | None" = None,
) -> list[Mesh | None]:
    """Extract one mesh per object SDF (None when an object is empty).

    sdf_raw_fn: [M,3] -> [M,K] per-object SDFs (jitted closure over params).
    only: when given, run the (expensive) fine extraction for just these
    object indices; every other slot returns None.
    """
    lo, hi = grid_boundary

    # coarse sweep -> per-object bboxes
    coarse = _eval_grid_multi(sdf_raw_fn, coarse_resolution, grid_boundary, chunk)
    axis = np.linspace(lo, hi, coarse_resolution)
    meshes: list[Mesh | None] = []
    spacing_coarse = (hi - lo) / (coarse_resolution - 1)

    for k in range(num_objects):
        if only is not None and k not in only:
            meshes.append(None)
            continue
        occ = coarse[..., k] < 0
        if not occ.any():
            meshes.append(None)
            continue
        idx = np.argwhere(occ)
        lo_k = axis[idx.min(axis=0)] - bbox_pad - spacing_coarse
        hi_k = axis[idx.max(axis=0)] + bbox_pad + spacing_coarse
        lo_k = np.maximum(lo_k, lo)
        hi_k = np.minimum(hi_k, hi)

        # fine grid restricted to the object's bbox, resolution scaled to
        # preserve the requested global voxel size
        extent = float((hi_k - lo_k).max())
        res_k = int(
            np.clip(np.ceil(extent / (hi - lo) * resolution), 16, resolution)
        )
        grid, origin, spacing = _eval_bbox_grid(
            sdf_raw_fn, k, lo_k, hi_k, res_k, chunk
        )
        verts, faces = marching_tetrahedra(grid, origin=origin, spacing=spacing)
        if len(faces) == 0:
            meshes.append(None)
            continue
        mesh = Mesh(verts, faces)
        if min_component_faces > 0:
            mesh = mesh.remove_small_components(min_component_faces)
        meshes.append(mesh if len(mesh.faces) else None)
    return meshes


def _eval_bbox_grid(sdf_raw_fn, obj_idx: int, lo_k, hi_k, res: int, chunk: int):
    import jax.numpy as jnp

    axes = [np.linspace(lo_k[d], hi_k[d], res, dtype=np.float32) for d in range(3)]
    xs, ys, zs = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), dtype=np.float32)])
    vals = np.empty(pts.shape[0], dtype=np.float32)
    for i in range(0, pts.shape[0], chunk):
        vals[i : i + chunk] = np.asarray(
            sdf_raw_fn(jnp.asarray(pts[i : i + chunk]))
        )[:, obj_idx]
    grid = vals[:n].reshape(res, res, res)
    spacing = (hi_k - lo_k) / (res - 1)
    return grid, lo_k, spacing


def generate_bbox(meshes: list[Mesh | None], out_dir: str, pad: float = 0.0):
    """Write bbox/bbox_{i}.json artifacts (reference holoscene_train.py:620)."""
    bbox_dir = os.path.join(out_dir, "bbox")
    os.makedirs(bbox_dir, exist_ok=True)
    bboxes = {}
    for i, mesh in enumerate(meshes):
        if mesh is None:
            continue
        b = mesh.bounds
        data = {
            "min": (b[0] - pad).tolist(),
            "max": (b[1] + pad).tolist(),
            "center": ((b[0] + b[1]) / 2).tolist(),
            "scale": ((b[1] - b[0]) / 2 + pad).tolist(),
        }
        with open(os.path.join(bbox_dir, f"bbox_{i}.json"), "w") as f:
            json.dump(data, f)
        bboxes[i] = data
    return bboxes


def save_object_meshes(meshes: list[Mesh | None], plots_dir: str, epoch: int):
    """surface_{epoch}_{obj}.ply artifacts (reference plots layout)."""
    from holoscene_tpu.utils.mesh import write_ply

    paths = []
    for i, mesh in enumerate(meshes):
        if mesh is None:
            paths.append(None)
            continue
        p = os.path.join(plots_dir, f"surface_{epoch}_{i}.ply")
        write_ply(p, mesh)
        paths.append(p)
    return paths
