"""Device mesh + sharding policy.

The reference is strictly single-GPU (SURVEY.md §2.4: dead DDP code,
`single_gpu_mode = True`). The TPU-native scaling story instead shards the
*work axes* over an ICI mesh and lets GSPMD insert collectives:

  * `data` axis — ray batches, marching-cube voxel blocks, gaussian batches
    (pure data parallelism: grads all-reduce over ICI).
  * `model` axis — hash-table rows and MLP output dims (tensor parallelism
    for memory headroom at large table sizes; gathers become collective
    gathers).

Everything is expressed as `NamedSharding` trees passed to `jax.jit`; no
hand-written collectives are needed for the SDF pipeline — the design rule
is "annotate shardings, let XLA place psum/all-gather on ICI".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Ray/point batches: leading axis split over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Explicit per-leaf tensor-parallel policy for the HoloScene param pytree
# (models/holoscene.py init_holoscene): anchored patterns, first match wins.
# A LARGE leaf no rule covers raises instead of silently replicating — a
# param rename must be answered here, not discovered as a perf cliff.
_TP_RULES: tuple[tuple[str, P], ...] = (
    # hash-table rows (implicit/grid, implicit/color_grid): row-sharded —
    # gathers become collective gathers, scatters psum partials
    (r"^implicit/(color_)?grid$", P("model", None)),
    # MLP weight matrices (weight-norm v or plain w): output-dim sharded
    (r"^(implicit|rendering)/(color_map_)?mlp/lin\d+/[vw]$",
     P("model", None)),
    # weight-norm gains / biases / scalars: replicated
    (r"^(implicit|rendering)/(color_map_)?mlp/lin\d+/[bg]$", P()),
    (r"^density/beta$", P()),
    # opt-in camera refinement (models/cam_opt.py): tiny, replicated
    (r"^cam_opt(/.*)?$", P()),
)
_TP_RAISE_ELEMS = 1 << 16  # leaves this big must have an explicit rule


def param_sharding(mesh: Mesh, params) -> dict:
    """Sharding tree for a holoscene param pytree, from the explicit
    `_TP_RULES` table. Indivisible shard dims degrade to replication; on a
    1-sized model axis everything replicates. Unknown LARGE leaves raise
    (see _TP_RULES)."""
    import re

    n_model = mesh.shape["model"]

    def spec_for(path: tuple, leaf) -> NamedSharding:
        if n_model == 1:
            return NamedSharding(mesh, P())
        name = "/".join(
            str(p.key) if hasattr(p, "key") else str(p) for p in path)
        for pat, spec in _TP_RULES:
            if re.match(pat, name):
                if len(spec) and leaf.shape[0] % n_model != 0:
                    return NamedSharding(mesh, P())
                return NamedSharding(mesh, spec)
        if leaf.size >= _TP_RAISE_ELEMS:
            raise ValueError(
                f"no tensor-parallel rule for large param '{name}' "
                f"{leaf.shape}; add it to parallel/mesh.py _TP_RULES")
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Place params on the mesh according to `param_sharding`."""
    shardings = param_sharding(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
