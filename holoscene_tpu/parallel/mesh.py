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


def param_sharding(mesh: Mesh, params) -> dict:
    """Sharding tree for a holoscene param pytree.

    Hash tables (large, row-major) shard rows over `model`; weight matrices
    shard the output dim over `model` when divisible; everything else is
    replicated. On a 1-sized model axis this degrades to full replication.
    """
    n_model = mesh.shape["model"]

    def spec_for(path: tuple, leaf) -> NamedSharding:
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if n_model > 1 and leaf.ndim == 2:
            if "grid" in name and leaf.shape[0] % n_model == 0:
                return NamedSharding(mesh, P("model", None))
            if name.endswith("/v") or name.endswith("/w"):
                if leaf.shape[0] % n_model == 0:
                    return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Place params on the mesh according to `param_sharding`."""
    shardings = param_sharding(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )
