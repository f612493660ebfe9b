import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.models.gom import GoMConfig, seed_gaussians_from_meshes
from holoscene_tpu.models.gom_adaptive import (
    accumulate_grads,
    adaptive_activations,
    gather_static,
    init_adaptive_gom,
    refine_adaptive,
    render_adaptive_gom,
)
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh

CFG = GoMConfig(sh_degree=1, max_per_tile=64)


def _setup(headroom=128):
    axis = np.linspace(-1, 1, 16)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x * x + y * y + z * z) - 0.4
    sp = 2.0 / 15
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3,
                               use_native=False)
    static = seed_gaussians_from_meshes([Mesh(v, f)], area_to_subdivide=1e-1,
                                        cfg=CFG)
    params, state = init_adaptive_gom(
        static, CFG, static["num_gaussians"] + headroom
    )
    return static, params, state


def test_init_and_render():
    static, params, state = _setup()
    n_faces = static["num_gaussians"]
    assert int(state["alive"].sum()) == n_faces
    pose = jnp.eye(4).at[2, 3].set(-2.0)
    intr = jnp.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1.0]])
    out = render_adaptive_gom(params, state, static, CFG, pose, intr, 32, 32,
                              jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    assert float(out["accumulation"].max()) > 0.1


def test_refine_splits_within_parent_face():
    static, params, state = _setup()
    n_faces = static["num_gaussians"]
    # give every alive gaussian hot gradients and force splits
    state = dict(state)
    state["grad_accum"] = state["alive"].astype(jnp.float32)
    state["grad_count"] = state["alive"].astype(jnp.float32)
    new_p, new_s, stats = refine_adaptive(
        jax.random.PRNGKey(0), params, state, static, CFG,
        densify_grad_thresh=0.5, densify_size_ratio=0.0,  # all hot = split
    )
    assert int(stats["n_spawned"]) > 0
    assert int(new_s["alive"].sum()) == n_faces + int(stats["n_spawned"])
    # children anchor to VALID parent faces
    spawned = np.asarray(stats["reset_mask"] & new_s["alive"])
    fi = np.asarray(new_s["face_idx"])[spawned]
    assert fi.min() >= 0 and fi.max() < n_faces
    # children's means stay on their faces: activations finite + near surface
    means, _, _, opac = adaptive_activations(new_p, new_s, static, CFG)
    r = np.linalg.norm(np.asarray(means)[np.asarray(new_s["alive"])], axis=1)
    assert abs(np.median(r) - 0.4) < 0.1


def test_cull_reduces_population():
    static, params, state = _setup()
    params = dict(params)
    params["opacities"] = params["opacities"].at[:10].set(-10.0)
    new_p, new_s, stats = refine_adaptive(
        jax.random.PRNGKey(0), params, state, static, CFG
    )
    assert int(stats["n_culled"]) == 10


def test_grad_accumulation():
    static, params, state = _setup()
    g = jnp.zeros((state["alive"].shape[0], 2)).at[0].set(jnp.array([3.0, 4.0]))
    s2 = accumulate_grads(state, g)
    assert float(s2["grad_accum"][0]) == 5.0
    assert float(s2["grad_count"][0]) == 1.0
