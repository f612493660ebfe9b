"""Adaptive Gaussian-on-Mesh: mesh-constrained densification.

Reference semantics: model/gom_adaptive.py:740+ (`GoMAdaptive`) —
splatfacto-style refinement adapted to the mesh constraint: positional
grad-norm accumulation (:1126), cull (:1263), split with children sampled
INSIDE the parent's triangle (:1309), duplicate (:1406), optimizer-state
surgery (:1061-1125), with `gaussians_to_mesh_indices` mapping every
gaussian to its anchor face. (The reference defines this model but never
wires it into a runner; here it is a first-class option.)

TPU-native redesign (same approach as models/gaussians_free.py): a FIXED
capacity of gaussian slots with an alive mask and a per-slot `face_idx`
array — densification writes children into dead slots and culling clears
them, so tensor shapes never change and nothing recompiles as the
population evolves. The static per-face geometry stays per-FACE; activations
gather it per slot through face_idx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.models.gom import (
    GoMConfig,
    gom_means,
    gom_opacities,
    gom_quats,
    gom_scales,
    init_gom_params,
)

_STATIC_PER_FACE = (
    "tri", "radius", "normals", "axis_x", "axis_y",
    "tri2d_a", "tri2d_b", "tri2d_c", "faces_quats", "xyz_radius",
    "features_dc",
)


def gather_static(static: dict, face_idx: jnp.ndarray) -> dict:
    """Per-slot view of the per-face static buffers (the
    gaussians_to_mesh_indices indirection, reference gom.py:910/:962/:989)."""
    out = {k: static[k][face_idx] for k in _STATIC_PER_FACE}
    out["num_gaussians"] = face_idx.shape[0]
    return out


def init_adaptive_gom(static: dict, cfg: GoMConfig, capacity: int):
    """(params, state): first F slots alive (one per face), rest dead."""
    n_faces = static["num_gaussians"]
    assert capacity >= n_faces, "capacity must cover the seed faces"
    face_idx = jnp.concatenate(
        [jnp.arange(n_faces), jnp.zeros(capacity - n_faces, jnp.int32)]
    ).astype(jnp.int32)
    gathered = gather_static(static, face_idx)
    params = init_gom_params(gathered, cfg)
    state = {
        "face_idx": face_idx,
        "alive": jnp.arange(capacity) < n_faces,
        "grad_accum": jnp.zeros(capacity),
        "grad_count": jnp.zeros(capacity),
    }
    return params, state


def adaptive_activations(params, state, static, cfg: GoMConfig,
                         visible_mask=None):
    """(means, quats, scales, opacities) with dead slots transparent."""
    gathered = gather_static(static, state["face_idx"])
    means = gom_means(params, gathered, cfg)
    quats = gom_quats(params, gathered, cfg)
    scales = gom_scales(params, gathered, cfg)
    vis = state["alive"] if visible_mask is None else (
        state["alive"] & visible_mask
    )
    opac = gom_opacities(params, vis)
    return means, quats, scales, opac


def render_adaptive_gom(params, state, static, cfg: GoMConfig, pose_c2w,
                        intrinsics, width, height, background,
                        visible_mask=None, ortho: bool = False):
    from holoscene_tpu.ops.splat import render_gaussians

    means, quats, scales, opac = adaptive_activations(
        params, state, static, cfg, visible_mask
    )
    colors = jnp.concatenate(
        [params["features_dc"][:, None, :], params["features_rest"]], axis=1
    )
    pose = jnp.asarray(pose_c2w, jnp.float32)
    rot = pose[:3, :3].T
    viewmat = (
        jnp.eye(4, dtype=jnp.float32)
        .at[:3, :3].set(rot)
        .at[:3, 3].set(-rot @ pose[:3, 3])
    )
    out = render_gaussians(
        means, quats, scales, opac, colors, viewmat,
        jnp.asarray(intrinsics, jnp.float32), width, height,
        tile_size=cfg.tile_size, max_per_tile=cfg.max_per_tile,
        sh_degree=cfg.sh_degree, background=background, ortho=ortho,
        use_pallas=cfg.use_pallas,
    )
    return {"rgb": jnp.clip(out["rgb"], 0, 1), "depth": out["depth"],
            "accumulation": out["alpha"]}


def accumulate_grads(state: dict, means2d_grads: jnp.ndarray) -> dict:
    norms = jnp.linalg.norm(means2d_grads, axis=-1)
    return {
        **state,
        "grad_accum": state["grad_accum"] + norms,
        "grad_count": state["grad_count"] + (norms > 0),
    }


def refine_adaptive(key, params, state, static, cfg: GoMConfig,
                    cull_alpha_thresh: float = 0.1,
                    densify_grad_thresh: float = 4e-4,
                    densify_size_ratio: float = 0.5):
    """Cull + split/dup constrained to faces (gom_adaptive.py:1154-1406).

    Split children sample a fresh barycentric position inside the PARENT's
    triangle (:1309) and inherit the parent's face; scales shrink like
    splatfacto. Returns (params, state, stats) with stats['reset_mask'] for
    optimizer surgery.
    """
    alive = state["alive"]
    face_idx = state["face_idx"]
    n_cap = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacities"][:, 0])

    cull = alive & (opac < cull_alpha_thresh)
    alive = alive & ~cull

    gathered = gather_static(static, face_idx)
    scales = gom_scales(params, gathered, cfg)
    big = scales.max(axis=-1) > densify_size_ratio * gathered["radius"]
    avg_grad = state["grad_accum"] / jnp.maximum(state["grad_count"], 1.0)
    hot = alive & (avg_grad > densify_grad_thresh)
    split = hot & big
    dup = hot & ~big

    prio = jnp.where(split, 2.0, jnp.where(dup, 1.0, 0.0))
    parent = jnp.argsort(-prio)
    child = jnp.argsort(alive)  # dead slots first
    n_spawn = jnp.minimum((prio > 0).sum(), (~alive).sum())
    do_spawn = (jnp.arange(n_cap) < n_spawn) & (prio[parent] > 0)

    # fresh barycentric position inside the parent's 2D triangle
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n_cap, 1))
    v = jax.random.uniform(k2, (n_cap, 1))
    flip = (u + v) > 1
    u = jnp.where(flip, 1 - u, u)
    v = jnp.where(flip, 1 - v, v)
    pa = gathered["tri2d_a"][parent]
    pb = gathered["tri2d_b"][parent]
    pc = gathered["tri2d_c"][parent]
    child_means2d = pa + u * (pb - pa) + v * (pc - pa)
    parent_is_split = split[parent]
    child_means2d = jnp.where(
        parent_is_split[:, None], child_means2d, params["means_2d"][parent]
    )
    shrink = jnp.where(parent_is_split, np.log(1.6), 0.0)

    def spawn(arr, child_vals):
        upd = jnp.where(
            do_spawn.reshape((-1,) + (1,) * (arr.ndim - 1)), child_vals,
            arr[child],
        )
        return arr.at[child].set(upd)

    new_params = dict(params)
    new_params["means_2d"] = spawn(params["means_2d"], child_means2d)
    new_params["scales"] = spawn(
        params["scales"], params["scales"][parent] - shrink[:, None]
    )
    for name in ("normal_elevates", "quats", "features_dc", "features_rest",
                 "opacities"):
        new_params[name] = spawn(params[name], params[name][parent])
    new_params["scales"] = jnp.where(
        split[:, None], new_params["scales"] - np.log(1.6),
        new_params["scales"],
    )

    new_face_idx = face_idx.at[child].set(
        jnp.where(do_spawn, face_idx[parent], face_idx[child])
    )
    spawned = jnp.zeros(n_cap, bool).at[child].set(do_spawn)
    alive = alive | spawned

    new_state = {
        "face_idx": new_face_idx,
        "alive": alive,
        "grad_accum": jnp.zeros(n_cap),
        "grad_count": jnp.zeros(n_cap),
    }
    stats = {
        "n_culled": cull.sum(),
        "n_spawned": spawned.sum(),
        "n_alive": alive.sum(),
        "reset_mask": spawned | cull,
    }
    return new_params, new_state, stats
