"""Gaussian-on-Mesh appearance model (Stage 4).

Reference semantics: model/gom.py —
  * one gaussian per mesh face, seeded after area-threshold midpoint
    subdivision (load_3D_points_on_mesh :567-694, concatenate_seed_mesh :696)
  * position parametrized in the face's 2D frame, clamped to the triangle by
    barycentric projection with a straight-through estimator (:907-934), plus
    a normal elevation bounded by +/- elevate_coef * circumradius (:936-952)
  * log-scales capped at upper_scale * per-face radius (z axis flattened by
    face_flat_coef), straight-through (:956-972)
  * orientation = face frame x (cone-limited tilt) x (in-plane spin)
    (:976-995)
  * SH colors (deg 3), sigmoid opacities initialized at 0.1
  * rendering via the tile splat renderer (gsplat counterpart, :1082-1142)
  * loss: (1-l)L1 + l(1-SSIM) + acm_lambda*|alpha - mesh mask| +
    mesh_depth_lambda*|depth - mesh depth| + optional PhysGaussian scale
    regularizer (:1211-1267)
  * per-instance gaussian index ranges for invisible-view opacity masking
    (`visible_gs_indices`, :1004-1011)

Functional layout: `seed_gaussians_from_meshes` produces STATIC (non-trained)
face geometry buffers; `init_gom_params` the trainable pytree;
`gom_activations` applies all constraint reparametrizations;
`render_gom`/`gom_loss` close the training step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.gaussians import (
    axis_angle_to_quat,
    num_sh_bases,
    quat_multiply,
    rgb_to_sh,
    rotmat_to_quat,
)
from holoscene_tpu.ops.splat import render_gaussians
from holoscene_tpu.ops.ssim import ssim as ssim_fn
from holoscene_tpu.utils.mesh import Mesh


@dataclasses.dataclass(frozen=True)
class GoMConfig:
    sh_degree: int = 3
    upper_scale: float = 2.0
    unconstrained_scale: bool = True
    unconstrained_elevate: bool = True
    face_flat_coef: float = 0.005
    elevate_coef: float = 2.0
    cone_coef: float = 10.0 * np.pi / 180.0
    ssim_lambda: float = 0.2
    acm_lambda: float = 20.0
    rgb_lambda: float = 1.0
    mesh_depth_lambda: float = 10.0
    use_scale_regularization: bool = False
    max_gauss_ratio: float = 10.0
    background_color: str = "random"
    tile_size: int = 16
    # compositing depth K per tile; 0 = auto-pick from the scene's p99 tile
    # overlap at trainer start (ops/splat.py auto_max_per_tile) — cost is
    # linear in K, so scenes with shallow tiles train up to ~2x faster
    max_per_tile: int = 512
    use_pallas: bool | None = None  # fused Pallas kernels; None = auto (TPU)
    # flat sorted-candidate pipeline with amortized binning (EXACT
    # compositing, no K truncation; ops/splat_flat.py). None = auto: on for
    # TPU training renders. rebin_every = per-frame-VISIT index refresh
    # cadence. The trainer default stays 8 while the bench runs 16: a
    # trainer visit spans ~n_frames optimizer steps of parameter drift
    # (random frame draws), so 8 visits ≈ the bench's 16 consecutive
    # single-frame steps; the 16-step drift tolerance itself is gated by
    # test_flat_cached_bins_track_motion_16_steps.
    use_flat: bool | None = None
    rebin_every: int = 8
    # adaptive rebinning (the VERDICT r3 #1b "incremental rebinning" ask,
    # answered by amortization instead of plan surgery): when > 0, a frame
    # rebins when its render reports more than this many PIXELS of max
    # projected drift since the plan was binned (flags['xy_drift'],
    # ops/splat_flat.py) — the periodic cadence stretches to
    # rebin_every * 8 as a long-stop. Sub-threshold drift means candidate
    # memberships and depth order are still valid, so the bitonic re-sort
    # (the dominant rebin cost) is pure waste; as training converges and
    # positions freeze, rebins approach zero instead of a fixed tax.
    rebin_drift_px: float = 0.0
    # saturation trim (ops/splat_flat.py): once every training frame has
    # reported its walked-chunk counts, the trainer swaps to a shrunken
    # static plan and each frame's rebin keeps only used+slack chunks per
    # tile — the payload gathers stop paying for candidates behind the
    # saturation depth. Exact (stale tiles self-heal: a truncating tile
    # walks to its cap, so the next rebin grows it by trim_slack).
    trim_flat: bool = True
    trim_slack: int = 2


# ---------------------------------------------------------------------------
# seeding
# ---------------------------------------------------------------------------


def _subdivide_by_area(verts: np.ndarray, faces: np.ndarray,
                       colors: np.ndarray, area_thresh: float):
    """Midpoint-subdivide faces until all areas <= area_thresh
    (reference gom.py:614-685; shared-edge midpoints welded)."""
    verts = verts.astype(np.float64)
    faces = faces.astype(np.int64)
    colors = colors.astype(np.float64)
    for _ in range(24):
        tri = verts[faces]
        areas = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
        )
        split = areas > area_thresh
        if not split.any():
            break
        fs = faces[split]
        edges = np.concatenate(
            [fs[:, [0, 1]], fs[:, [0, 2]], fs[:, [1, 2]]], axis=0
        )
        edges = np.sort(edges, axis=1)
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
        mid_ids = len(verts) + np.arange(len(uniq))
        mids = verts[uniq].mean(axis=1)
        verts = np.vstack([verts, mids])
        m = len(fs)
        m01 = mid_ids[inv[:m]]
        m02 = mid_ids[inv[m : 2 * m]]
        m12 = mid_ids[inv[2 * m :]]
        f0 = np.stack([fs[:, 0], m01, m02], axis=1)
        f1 = np.stack([fs[:, 1], m12, m01], axis=1)
        f2 = np.stack([fs[:, 2], m02, m12], axis=1)
        fc = np.stack([m01, m12, m02], axis=1)
        faces = np.vstack([faces[~split], f0, f1, f2, fc])
        colors = np.vstack(
            [colors[~split]] + [colors[split]] * 4
        )
    return verts, faces, colors


def _circumradius(tri: np.ndarray) -> np.ndarray:
    a = np.linalg.norm(tri[:, 1] - tri[:, 2], axis=1)
    b = np.linalg.norm(tri[:, 2] - tri[:, 0], axis=1)
    c = np.linalg.norm(tri[:, 0] - tri[:, 1], axis=1)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    )
    return a * b * c / np.maximum(4 * area, 1e-12)


def _triangle_2d(tri: np.ndarray):
    """Embed each triangle in its own 2D frame: A=(0,0), B=(|AB|,0),
    C from the law of cosines (reference compute_triangle_vertices,
    gom.py:181)."""
    a = np.linalg.norm(tri[:, 1] - tri[:, 2], axis=1)  # |BC|
    b = np.linalg.norm(tri[:, 2] - tri[:, 0], axis=1)  # |CA|
    c = np.linalg.norm(tri[:, 0] - tri[:, 1], axis=1)  # |AB|
    ax = np.zeros((len(tri), 2))
    bx = np.stack([c, np.zeros_like(c)], axis=1)
    cx_x = (b ** 2 + c ** 2 - a ** 2) / np.maximum(2 * c, 1e-12)
    cx_y = np.sqrt(np.maximum(b ** 2 - cx_x ** 2, 0.0))
    cx = np.stack([cx_x, cx_y], axis=1)
    return ax, bx, cx


def seed_gaussians_from_meshes(
    meshes: Sequence[Mesh],
    area_to_subdivide: float = 2e-5,
    cfg: GoMConfig = GoMConfig(),
) -> dict:
    """Build the static per-gaussian geometry buffers + instance index
    ranges. One gaussian per (subdivided) face."""
    all_static = {k: [] for k in (
        "tri", "radius", "normals", "axis_x", "axis_y", "tri2d_a", "tri2d_b",
        "tri2d_c", "features_dc",
    )}
    instance_ranges = []
    offset = 0
    for mesh in meshes:
        colors = (
            np.asarray(mesh.vertex_colors[mesh.faces].mean(axis=1)) / 255.0
            if mesh.vertex_colors is not None
            else np.full((len(mesh.faces), 3), 0.5)
        )
        v, f, colors = _subdivide_by_area(
            mesh.vertices, mesh.faces, colors, area_to_subdivide
        )
        tri = v[f]
        n = len(f)
        normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
        axis_x = tri[:, 1] - tri[:, 0]
        axis_x /= np.maximum(np.linalg.norm(axis_x, axis=1, keepdims=True), 1e-12)
        axis_y = np.cross(normals, axis_x)
        axis_y /= np.maximum(np.linalg.norm(axis_y, axis=1, keepdims=True), 1e-12)
        a2, b2, c2 = _triangle_2d(tri)

        all_static["tri"].append(tri)
        all_static["radius"].append(np.abs(_circumradius(tri)))
        all_static["normals"].append(normals)
        all_static["axis_x"].append(axis_x)
        all_static["axis_y"].append(axis_y)
        all_static["tri2d_a"].append(a2)
        all_static["tri2d_b"].append(b2)
        all_static["tri2d_c"].append(c2)
        all_static["features_dc"].append(colors)
        instance_ranges.append((offset, offset + n))
        offset += n

    static = {
        k: jnp.asarray(np.concatenate(v), dtype=jnp.float32)
        for k, v in all_static.items()
    }
    # face-frame quaternion (columns = x, y, n: local->world)
    rot = jnp.stack(
        [static["axis_x"], static["axis_y"], static["normals"]], axis=2
    )
    static["faces_quats"] = rotmat_to_quat(rot)
    xyz_radius = jnp.tile(static["radius"][:, None], (1, 3))
    static["xyz_radius"] = xyz_radius.at[:, 2].mul(cfg.face_flat_coef)
    static["instance_ranges"] = instance_ranges
    static["num_gaussians"] = offset
    return static


def init_gom_params(static: dict, cfg: GoMConfig = GoMConfig()) -> dict:
    """Trainable pytree (reference populate_modules, gom.py:772-868)."""
    n = static["num_gaussians"]
    centroid_2d = (
        static["tri2d_a"] + static["tri2d_b"] + static["tri2d_c"]
    ) / 3.0

    if cfg.unconstrained_scale:
        from scipy.spatial import cKDTree

        centers = np.asarray(static["tri"].mean(axis=1))
        tree = cKDTree(centers)
        d, _ = tree.query(centers, k=min(4, len(centers)))
        avg = d[:, 1:].mean(axis=1, keepdims=True) if d.shape[1] > 1 else d
        scales = jnp.log(jnp.asarray(np.repeat(avg, 3, axis=1) + 1e-10,
                                     dtype=jnp.float32))
    else:
        scales = jnp.zeros((n, 3), dtype=jnp.float32)

    dim_sh = num_sh_bases(cfg.sh_degree)
    features_dc = rgb_to_sh(static["features_dc"])
    return {
        "means_2d": centroid_2d,
        "normal_elevates": jnp.zeros((n,), dtype=jnp.float32),
        "scales": scales,
        "quats": jnp.zeros((n, 3), dtype=jnp.float32),
        "features_dc": features_dc,
        "features_rest": jnp.zeros((n, dim_sh - 1, 3), dtype=jnp.float32),
        "opacities": jnp.full((n, 1), float(jax.scipy.special.logit(0.1)),
                              dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# constraint reparametrizations
# ---------------------------------------------------------------------------


def _straight_through(raw, clamped):
    return raw + jax.lax.stop_gradient(clamped - raw)


def _bary_2d(p, a, b, c):
    v0 = b - a
    v1 = c - a
    v2 = p - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-12)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    return jnp.stack([1 - v - w, v, w], axis=-1)


def gom_means(params, static, cfg: GoMConfig) -> jnp.ndarray:
    """Triangle-clamped face-frame position + bounded normal elevation
    (gom.py:907-954)."""
    m2 = params["means_2d"]
    a, b, c = static["tri2d_a"], static["tri2d_b"], static["tri2d_c"]
    bary = jnp.clip(_bary_2d(m2, a, b, c), 0.0, 1.0)
    bary = bary / jnp.sum(bary, axis=-1, keepdims=True)
    clamped = (
        bary[:, 0:1] * a + bary[:, 1:2] * b + bary[:, 2:3] * c
    )
    m2 = _straight_through(m2, clamped)

    means = (
        m2[:, 0:1] * static["axis_x"]
        + m2[:, 1:2] * static["axis_y"]
        + static["tri"][:, 0]
    )

    radius = static["radius"][:, None]
    if cfg.unconstrained_elevate:
        elev = params["normal_elevates"][:, None]
        bound = radius * cfg.elevate_coef
        elev = _straight_through(elev, jnp.clip(elev, -bound, bound))
    else:
        elev = (jax.nn.sigmoid(params["normal_elevates"])[:, None] - 0.5) * radius
    return means + static["normals"] * elev


def gom_scales(params, static, cfg: GoMConfig) -> jnp.ndarray:
    """Linear scales, capped at upper_scale * per-face radius (gom.py:956-972).
    (Returns LINEAR scales, not log.)"""
    if cfg.unconstrained_scale:
        real = jnp.exp(params["scales"])
        limit = cfg.upper_scale * static["xyz_radius"]
        return _straight_through(real, jnp.minimum(real, limit)) + 1e-20
    return jax.nn.sigmoid(params["scales"]) * static["xyz_radius"] * cfg.upper_scale + 1e-20


def gom_quats(params, static, cfg: GoMConfig) -> jnp.ndarray:
    """face frame x cone-limited tilt x in-plane spin (gom.py:976-995)."""
    theta = params["quats"][:, 0:1]
    spin = axis_angle_to_quat(
        jnp.concatenate([jnp.zeros_like(theta), jnp.zeros_like(theta), theta], -1)
    )
    alpha = params["quats"][:, 1]
    phi = params["quats"][:, 2]
    phi = _straight_through(phi, jnp.clip(phi, 0.0, cfg.cone_coef))
    axis = jnp.stack([jnp.cos(alpha), jnp.sin(alpha), jnp.zeros_like(alpha)], -1)
    tilt = axis_angle_to_quat(axis * phi[:, None])
    return quat_multiply(static["faces_quats"], quat_multiply(tilt, spin))


def gom_opacities(params, visible_mask=None) -> jnp.ndarray:
    """Sigmoid opacity; invisible gaussians pinned to ~0 (gom.py:1004-1011)."""
    logits = params["opacities"][:, 0]
    if visible_mask is not None:
        off = jax.scipy.special.logit(1e-6)
        logits = jnp.where(visible_mask, logits, off)
    return jax.nn.sigmoid(logits)


def render_gom(
    params,
    static,
    cfg: GoMConfig,
    pose_c2w,
    intrinsics,
    width: int,
    height: int,
    background: jnp.ndarray,
    visible_mask=None,
    ortho: bool = False,
    flat_plan=None,
    flat_bins: dict | None = None,
    chw: bool = False,
):
    """Full GoM render (gom.py:1082-1170). Returns dict(rgb, depth,
    accumulation). chw=True renders rgb as [3,H,W] (channels-major
    training-loss layout; ops/splat._image_epilogue)."""
    means = gom_means(params, static, cfg)
    quats = gom_quats(params, static, cfg)
    scales = gom_scales(params, static, cfg)
    opac = gom_opacities(params, visible_mask)
    colors = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )

    pose = jnp.asarray(pose_c2w, dtype=jnp.float32)
    rot = pose[:3, :3].T
    viewmat = (
        jnp.eye(4, dtype=jnp.float32)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(-rot @ pose[:3, 3])
    )
    out = render_gaussians(
        means, quats, scales, opac, colors,
        viewmat, jnp.asarray(intrinsics, dtype=jnp.float32),
        width, height, tile_size=cfg.tile_size, max_per_tile=cfg.max_per_tile,
        sh_degree=cfg.sh_degree, background=background, ortho=ortho,
        use_pallas=cfg.use_pallas, flat_plan=flat_plan, flat_bins=flat_bins,
        chw=chw,
    )
    rgb = jnp.clip(out["rgb"], 0.0, 1.0)
    res = {"rgb": rgb, "depth": out["depth"], "accumulation": out["alpha"]}
    # flat-path telemetry MUST survive this layer: the trainer's saturation
    # trim feeds on used_chunks and re-plans on stale/overflow. (A dropped
    # used_chunks once defaulted to 0 downstream, capping every tile at
    # trim_slack chunks — silently truncated renders, diverging training.)
    for k in ("overflow", "stale", "used_chunks", "xy_drift"):
        if k in out:
            res[k] = out[k]
    return res


def gom_project(params, static, cfg: GoMConfig, pose_c2w, intrinsics,
                width: int, height: int):
    """Projected splat geometry (xy, depth, conic, valid) for the flat
    pipeline's binning — the same EWA projection render_gom uses."""
    means = gom_means(params, static, cfg)
    quats = gom_quats(params, static, cfg)
    scales = gom_scales(params, static, cfg)
    pose = jnp.asarray(pose_c2w, dtype=jnp.float32)
    rot = pose[:3, :3].T
    viewmat = (
        jnp.eye(4, dtype=jnp.float32)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(-rot @ pose[:3, 3])
    )
    from holoscene_tpu.ops.gaussians import project_gaussians_fused

    xy, depth, conic, _radius, valid = project_gaussians_fused(
        means, quats, scales, viewmat,
        jnp.asarray(intrinsics, dtype=jnp.float32), width, height)
    return xy, depth, conic, valid


def gom_flat_bins(params, static, cfg: GoMConfig, pose_c2w, intrinsics,
                  width: int, height: int, plan, visible_mask=None,
                  used_chunks=None):
    """build_flat_bins over the current GoM state for one camera (the
    amortized-binning refresh; see ops/splat_flat.build_flat_bins).
    used_chunks: this frame's last walked-chunk counts — enables the
    saturation trim (splat_flat.build_flat_candidates)."""
    from holoscene_tpu.ops.splat_flat import build_flat_bins

    xy, depth, conic, valid = gom_project(
        params, static, cfg, pose_c2w, intrinsics, width, height)
    opac = gom_opacities(params, visible_mask)
    tiles_x = -(-width // cfg.tile_size)
    tiles_y = -(-height // cfg.tile_size)
    return build_flat_bins(
        xy, depth, conic, opac, valid, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_size=cfg.tile_size, plan=plan,
        used_chunks=used_chunks, trim_slack=cfg.trim_slack)


def gom_loss(outputs, batch, cfg: GoMConfig, with_scale_reg: bool = False,
             scales_linear=None, chw: bool = False):
    """Stage-4 loss (gom.py:1211-1267). batch: image [H,W,3], acm [H,W],
    mesh_depth [H,W] (optional), mask [H,W] (optional).

    chw=True: outputs/batch images are channels-major [3,H,W] (the render's
    chw layout); masks/acm/depth stay [H,W]. Identical math — only the
    tensor layout changes (W-minor avoids the [*,3] lane padding)."""
    gt = batch["image"]
    pred = outputs["rgb"]

    loss_acm = (
        jnp.mean(jnp.abs(outputs["accumulation"] - batch["acm"]))
        * cfg.acm_lambda
    )

    if "mask" in batch and batch["mask"] is not None:
        m = (batch["mask"][None] if chw else batch["mask"][..., None])
        gt = gt * m
        pred = pred * m

    if "mesh_depth" in batch and batch["mesh_depth"] is not None:
        l1_depth = (
            jnp.mean(jnp.abs(batch["mesh_depth"] - outputs["depth"]))
            * cfg.mesh_depth_lambda
        )
    else:
        l1_depth = 0.0

    l1 = jnp.mean(jnp.abs(gt - pred))
    if chw:
        from holoscene_tpu.ops.ssim import ssim_chw

        simloss = 1.0 - ssim_chw(gt, pred)
    else:
        simloss = 1.0 - ssim_fn(gt, pred)

    scale_reg = jnp.asarray(0.0)
    if with_scale_reg and scales_linear is not None:
        s = scales_linear[:, :2]
        ratio = s.max(axis=-1) / jnp.maximum(s.min(axis=-1), 1e-12)
        scale_reg = 0.1 * jnp.mean(
            jnp.maximum(ratio, cfg.max_gauss_ratio) - cfg.max_gauss_ratio
        )

    main = (
        ((1 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * simloss) * cfg.rgb_lambda
        + loss_acm
        + l1_depth
    )
    return {
        "main_loss": main,
        "scale_reg": scale_reg,
        "l1": l1,
        "ssim_loss": simloss,
        "acm_loss": loss_acm,
        "depth_loss": l1_depth,
        "loss": main + scale_reg,
    }


# ---------------------------------------------------------------------------
# export (3DGS-compatible arrays)
# ---------------------------------------------------------------------------


def compose_for_export(params, static, cfg: GoMConfig, select=None) -> dict:
    """World-space gaussian dict for PLY/pt export (gom.py:325-443)."""
    means = np.asarray(gom_means(params, static, cfg))
    quats = np.asarray(gom_quats(params, static, cfg))
    scales = np.asarray(gom_scales(params, static, cfg))
    out = {
        "means": means,
        "quats": quats,
        "log_scales": np.log(np.maximum(scales, 1e-20)),
        "opacity_logits": np.asarray(params["opacities"][:, 0]),
        "features_dc": np.asarray(params["features_dc"]),
        "features_rest": np.asarray(params["features_rest"]),
    }
    if select is not None:
        out = {k: v[select] for k, v in out.items()}
    return out


def write_gaussian_ply(path: str, g: dict) -> None:
    """3DGS-convention PLY (x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,
    rot_*) — the format the reference's exporters and viewers consume
    (gom.py:325)."""
    n = len(g["means"])
    rest = g["features_rest"].transpose(0, 2, 1).reshape(n, -1)  # channel-major
    fields = [("x", g["means"][:, 0]), ("y", g["means"][:, 1]),
              ("z", g["means"][:, 2])]
    fields += [(f"n{ax}", np.zeros(n)) for ax in "xyz"]
    for i in range(3):
        fields.append((f"f_dc_{i}", g["features_dc"][:, i]))
    for i in range(rest.shape[1]):
        fields.append((f"f_rest_{i}", rest[:, i]))
    fields.append(("opacity", g["opacity_logits"]))
    for i in range(3):
        fields.append((f"scale_{i}", g["log_scales"][:, i]))
    for i in range(4):
        fields.append((f"rot_{i}", g["quats"][:, i]))

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name, _ in fields]
    header += ["end_header"]
    rec = np.empty(n, dtype=[(name, "<f4") for name, _ in fields])
    for name, val in fields:
        rec[name] = val.astype(np.float32)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(rec.tobytes())


def read_gaussian_ply(path: str) -> dict:
    """Inverse of write_gaussian_ply (reference load_gaussian_from_ply,
    training/holoscene_train_gaussian.py:120)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.find(b"end_header\n") + len(b"end_header\n")
    names = []
    n = 0
    for line in data[:end].decode().splitlines():
        parts = line.split()
        if parts[0] == "element":
            n = int(parts[2])
        elif parts[0] == "property":
            names.append(parts[2])
    rec = np.frombuffer(data[end:], dtype=[(nm, "<f4") for nm in names], count=n)
    means = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1)
    f_dc = np.stack([rec[f"f_dc_{i}"] for i in range(3)], axis=-1)
    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    rest = np.stack(
        [rec[f"f_rest_{i}"] for i in range(n_rest)], axis=-1
    ).reshape(n, 3, n_rest // 3).transpose(0, 2, 1) if n_rest else np.zeros((n, 0, 3))
    return {
        "means": means,
        "features_dc": f_dc,
        "features_rest": rest,
        "opacity_logits": np.asarray(rec["opacity"]),
        "log_scales": np.stack([rec[f"scale_{i}"] for i in range(3)], axis=-1),
        "quats": np.stack([rec[f"rot_{i}"] for i in range(4)], axis=-1),
    }
