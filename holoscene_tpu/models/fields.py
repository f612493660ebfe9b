"""Neural fields: object-compositional SDF network and rendering (color) MLP.

Functional design: each network is (init fn -> param pytree, apply fn). This
keeps parameters explicit for pjit sharding and optax param-group labeling
(the reference separates grid vs MLP learning rates,
training/holoscene_train.py:156-169).

Reference semantics:
  * ObjectImplicitNetworkGrid — model/network.py:19-532. Hash-grid features +
    sin/cos embedding -> softplus MLP (weight-norm) -> K object SDFs
    (+ feature vector unless color_grid_feature). Scene SDF = min over K.
    Geometric init flips the background SDF sign vs objects
    (model/network.py:135-144).
  * Optional second hash grid for color features mapped through a 2-layer
    ReLU MLP (model/network.py:82-103, :177-179, :208-209).
  * RenderingNetwork — model/network.py:535-614: IDR-style MLP on
    (pts, view, normal, feature) with per-quantity positional encoding,
    ReLU hidden, sigmoid RGB.
  * ColorImplicitNetworkSingle — model/network.py:687-746: hash grid +
    4-layer ReLU MLP -> sigmoid RGB (Stage-3 texture field).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.ops.embedder import positional_encoding, embedder_out_dim
from holoscene_tpu.ops.hashgrid import (
    HashGridMeta,
    hash_encode,
    hash_encode_dual,
    init_hash_embeddings,
)

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# weight-normalized linear layers
# ---------------------------------------------------------------------------


def _weight_norm_apply(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    """w = g * v / ||v||_row (torch weight_norm over dim 0)."""
    v, g, b = layer["v"], layer["g"], layer["b"]
    norm = jnp.linalg.norm(v, axis=1, keepdims=True)
    w = v * (g[:, None] / (norm + 1e-12))
    return x @ w.T + b


def _plain_linear_apply(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ layer["w"].T + layer["b"]


def _make_wn_layer(w: np.ndarray, b: np.ndarray) -> Params:
    norm = np.linalg.norm(w, axis=1)
    return {
        "v": jnp.asarray(w, dtype=jnp.float32),
        "g": jnp.asarray(norm, dtype=jnp.float32),
        "b": jnp.asarray(b, dtype=jnp.float32),
    }


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 (reference model/network.py:163)."""
    return jax.nn.softplus(100.0 * x) / 100.0


# ---------------------------------------------------------------------------
# ObjectImplicitNetworkGrid
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ImplicitNetworkConfig:
    feature_vector_size: int = 256
    d_in: int = 3
    d_out: int = 32
    dims: tuple[int, ...] = (256, 256)
    geometric_init: bool = True
    bias: float = 0.9
    skip_in: tuple[int, ...] = ()
    weight_norm: bool = True
    multires: int = 6
    divide_factor: float = 1.0
    use_grid_feature: bool = True
    sigmoid: float = 10.0
    color_grid_feature: bool = True
    base_size: int = 16
    end_size: int = 2048
    logmap: int = 19
    num_levels: int = 16
    level_dim: int = 2
    # Fetch the SDF and color grids with ONE width-2 row gather per corner
    # (they share identical (level, corner, hash) indices). Measured on v5e:
    # a width-2 row gather costs 0.7x of one width-1 gather instead of 2x
    # (scripts/probe_row_ops.py). Only affects with_features=True forwards.
    fused_dual_grid: bool = False
    # "trilinear" = reference smoothstep trilerp (8 corners);
    # "tetrahedral" = Kuhn-simplex barycentric (4 corners, half the
    # gather/scatter traffic; quality-gated opt-in). Sampler probes always
    # stay trilinear (they only place samples).
    grid_interp: str = "trilinear"
    # Capacity reshaping: levels with resolution <= dense_max_res store the
    # full r^3 dense table (no hash collisions) and become one-row-gatherable
    # cell blocks on TPU (ops/hashgrid.py). 0 = reference table sizing.
    dense_max_res: int = 0
    # gather style of the fused render path: "packed" (bf16 block/quad
    # rows — half the gather rows, pays a per-step table build; the
    # measured end-to-end winner on v5e) or "raw" (exact f32 width-2
    # takes, zero build). See ops/hashgrid.py _fused_core.
    fused_fetch: str = "packed"
    # Stochastic color-grid backward: importance-sample ONE corner per
    # (hashed level, point) for table b's gradient scatter (unbiased, 8x
    # less scatter traffic on those channels). Training-only; the SDF
    # grid's gradient stays exact. See ops/hashgrid.py _hash_fused_bwd.
    # Default ON: quality-gated on hardware (2500-iter synthetic protocol:
    # 35.74 dB / chamfer 0.0869/0.0961 vs 35.65 / 0.0869/0.0961 exact),
    # end-to-end 2879 -> 3817 rays/s. Only active under fused+packed.
    color_bwd_sample: bool = True
    # Additionally sample the SDF grid's hashed-level gradient (one corner
    # drawn ~ |fused cotangent| with exact normalizer — unbiased for the
    # signed second-order terms). Default ON: quality-gated on hardware
    # (2500-iter synthetic: 35.48 dB / chamfer 0.0839/0.0954 vs 35.65 /
    # 0.0869/0.0961 exact — geometry improves, PSNR within protocol
    # noise), end-to-end 3817 -> 4575 rays/s.
    # (requires color_bwd_sample — validated in __post_init__)
    sdf_bwd_sample: bool = True

    def __post_init__(self):
        if self.sdf_bwd_sample and not self.color_bwd_sample:
            raise ValueError(
                "sdf_bwd_sample=True requires color_bwd_sample=True (the "
                "SDF-sampled backward extends the color-sampled one; there "
                "is no sdf-only mode)"
            )

    @property
    def grid_meta(self) -> HashGridMeta:
        return HashGridMeta(
            input_dim=3,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_size,
            log2_hashmap_size=self.logmap,
            desired_resolution=self.end_size,
            dense_max_res=self.dense_max_res,
        )

    @property
    def layer_dims(self) -> tuple[int, ...]:
        grid_dim = self.num_levels * self.level_dim
        if self.color_grid_feature:
            out = self.d_out
        else:
            out = self.d_out + self.feature_vector_size
        d0 = self.d_in + grid_dim
        if self.multires > 0:
            d0 += embedder_out_dim(self.multires, self.d_in) - self.d_in
        return (d0,) + tuple(self.dims) + (out,)

    @classmethod
    def from_conf(cls, conf, feature_vector_size: int) -> "ImplicitNetworkConfig":
        return cls(
            feature_vector_size=feature_vector_size,
            d_in=conf.get_int("d_in", 3),
            d_out=conf.get_int("d_out", 32),
            dims=tuple(conf.get_list("dims", [256, 256])),
            geometric_init=conf.get_bool("geometric_init", True),
            bias=conf.get_float("bias", 0.9),
            skip_in=tuple(conf.get_list("skip_in", [])),
            weight_norm=conf.get_bool("weight_norm", True),
            multires=conf.get_int("multires", 6),
            divide_factor=conf.get_float("divide_factor", 1.0),
            use_grid_feature=conf.get_bool("use_grid_feature", True),
            sigmoid=conf.get_float("sigmoid", 10.0),
            color_grid_feature=conf.get_bool("color_grid_feature", True),
            base_size=conf.get_int("base_size", 16),
            end_size=conf.get_int("end_size", 2048),
            logmap=conf.get_int("logmap", 19),
            num_levels=conf.get_int("num_levels", 16),
            level_dim=conf.get_int("level_dim", 2),
            fused_dual_grid=conf.get_bool("fused_dual_grid", False),
            grid_interp=conf.get_string("grid_interp", "trilinear"),
            dense_max_res=conf.get_int("dense_max_res", 0),
            fused_fetch=conf.get_string("fused_fetch", "packed"),
            color_bwd_sample=(_cb := conf.get_bool("color_bwd_sample", True)),
            # defaults to following color_bwd_sample so turning THAT off
            # yields the fully exact backward; an explicit sdf=true with
            # color=false still errors (__post_init__)
            sdf_bwd_sample=conf.get_bool("sdf_bwd_sample", _cb),
        )


def init_implicit_network(key: jax.Array, cfg: ImplicitNetworkConfig) -> Params:
    keys = jax.random.split(key, 8)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(keys[0])).ravel()[:1])

    dims = cfg.layer_dims
    n_layers = len(dims) - 1
    layers = []
    for layer_i in range(n_layers):
        in_dim, out_dim = dims[layer_i], dims[layer_i + 1]
        if layer_i + 1 in cfg.skip_in:
            out_dim = dims[layer_i + 1] - dims[0]
        w = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim), (out_dim, in_dim))
        b = np.zeros(out_dim)
        if cfg.geometric_init:
            if layer_i == n_layers - 1:
                # compositional geometric init (model/network.py:135-144):
                # row 0 is background (inside +, outside -), rows 1.. objects
                w = rng.normal(0.0, 1e-4, (out_dim, in_dim))
                w[0, :] += -np.sqrt(np.pi) / np.sqrt(in_dim)
                w[1:, :] += np.sqrt(np.pi) / np.sqrt(in_dim)
                b = np.zeros(out_dim)
                b[0] = cfg.bias
                b[1:] = -0.5 * cfg.bias
            elif cfg.multires > 0 and layer_i == 0:
                # zero out embedding+grid channels, keep raw xyz active
                w = np.zeros((out_dim, in_dim))
                w[:, :3] = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim), (out_dim, 3))
        layers.append(_make_wn_layer(w, b))

    params: Params = {
        "grid": init_hash_embeddings(keys[1], cfg.grid_meta),
        "mlp": {f"lin{i}": layer for i, layer in enumerate(layers)},
    }
    if cfg.color_grid_feature:
        params["color_grid"] = init_hash_embeddings(keys[2], cfg.grid_meta)
        grid_dim = cfg.num_levels * cfg.level_dim
        k3, k4 = jax.random.split(keys[3])
        params["color_map_mlp"] = {
            "lin0": _kaiming_linear(k3, grid_dim, 256),
            "lin1": _kaiming_linear(k4, 256, cfg.feature_vector_size),
        }
    return params


def _kaiming_linear(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    """torch.nn.Linear default init (kaiming-uniform + uniform bias)."""
    k1, k2 = jax.random.split(key)
    bound_w = math.sqrt(1.0 / in_dim) * math.sqrt(3.0)
    w = jax.random.uniform(k1, (out_dim, in_dim), minval=-bound_w, maxval=bound_w)
    bound_b = math.sqrt(1.0 / in_dim)
    b = jax.random.uniform(k2, (out_dim,), minval=-bound_b, maxval=bound_b)
    return {"w": w, "b": b}


def _implicit_mlp(params: Params, cfg: ImplicitNetworkConfig,
                  x: jnp.ndarray, feature: jnp.ndarray) -> jnp.ndarray:
    """Shared MLP trunk: positional-embed x, concat grid features, run the
    weight-norm softplus layers. Returns the raw head output."""
    if cfg.multires > 0:
        embed = positional_encoding(x, cfg.multires)
        h = jnp.concatenate([embed, feature], axis=-1)
    else:
        h = jnp.concatenate([x, feature], axis=-1)
    inp = h
    n_layers = len(cfg.layer_dims) - 1
    for layer_i in range(n_layers):
        if layer_i in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / np.sqrt(2)
        h = _weight_norm_apply(params["mlp"][f"lin{layer_i}"], h)
        if layer_i < n_layers - 1:
            h = softplus100(h)
    return h


def implicit_forward(
    params: Params, cfg: ImplicitNetworkConfig, x: jnp.ndarray,
    with_features: bool = True,
    packed: bool = True,
    grid_levels: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """x [N,3] -> (sdf_raw [N,K], feature_vectors [N,F] or None).

    Mirrors ObjectImplicitNetworkGrid.forward (model/network.py:169-210).
    `with_features=False` skips the color hash grid + mapping MLP — the
    sampler and SDF-only probes don't need them (the reference wastes this
    work in get_sdf_vals; skipping it halves the sampler's gather traffic).
    `grid_levels=L` evaluates only the first L (coarse) hash levels and
    zero-pads the fine-level features — an approximation used ONLY for
    sample placement (the error-bound sampler's no-grad SDF probes); the
    level offsets are shared with the full table, so the same parameters
    serve both paths.
    """
    xn = x / cfg.divide_factor
    grid_dim = cfg.num_levels * cfg.level_dim
    color_feature_pre = None
    if cfg.use_grid_feature:
        # HashEncoder maps [-1,1] -> [0,1] internally (hashgrid.py:158)
        if (
            cfg.fused_dual_grid and cfg.color_grid_feature and with_features
            and packed and grid_levels is None and cfg.level_dim == 2
        ):
            feature, color_feature_pre = hash_encode_dual(
                (xn + 1.0) * 0.5, params["grid"], params["color_grid"],
                cfg.grid_meta, interp=cfg.grid_interp,
            )
        elif grid_levels is not None and grid_levels < cfg.num_levels:
            # NOTE: keep the FULL grid's per-level scale (desired_resolution
            # would re-derive a different scale for fewer levels)
            full_meta = cfg.grid_meta
            meta_s = HashGridMeta(
                input_dim=full_meta.input_dim,
                num_levels=grid_levels,
                level_dim=full_meta.level_dim,
                base_resolution=full_meta.base_resolution,
                log2_hashmap_size=full_meta.log2_hashmap_size,
                per_level_scale=full_meta.per_level_scale,
                desired_resolution=None,
            )
            coarse = hash_encode((xn + 1.0) * 0.5, params["grid"], meta_s,
                                 packed=packed)
            feature = jnp.concatenate(
                [coarse,
                 jnp.zeros(x.shape[:-1] + (grid_dim - coarse.shape[-1],),
                           dtype=x.dtype)],
                axis=-1,
            )
        else:
            feature = hash_encode((xn + 1.0) * 0.5, params["grid"],
                                  cfg.grid_meta, packed=packed,
                                  interp=cfg.grid_interp)
    else:
        feature = jnp.zeros(x.shape[:-1] + (grid_dim,), dtype=x.dtype)

    if cfg.multires > 0:
        embed = positional_encoding(x, cfg.multires)
        h = jnp.concatenate([embed, feature], axis=-1)
    else:
        h = jnp.concatenate([x, feature], axis=-1)

    inp = h
    n_layers = len(cfg.layer_dims) - 1
    for layer_i in range(n_layers):
        if layer_i in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / np.sqrt(2)
        h = _weight_norm_apply(params["mlp"][f"lin{layer_i}"], h)
        if layer_i < n_layers - 1:
            h = softplus100(h)

    if cfg.color_grid_feature:
        sdf_raw = h
        if not with_features:
            return sdf_raw, None
        if color_feature_pre is not None:
            cf = color_feature_pre
        else:
            cf = hash_encode((xn + 1.0) * 0.5, params["color_grid"],
                             cfg.grid_meta, packed=packed,
                             interp=cfg.grid_interp)
        cf = _plain_linear_apply(params["color_map_mlp"]["lin0"], cf)
        cf = jax.nn.relu(cf)
        cf = _plain_linear_apply(params["color_map_mlp"]["lin1"], cf)
        feature_vectors = cf
    else:
        sdf_raw = h[:, : cfg.d_out]
        feature_vectors = h[:, cfg.d_out :] if with_features else None
    return sdf_raw, feature_vectors


def implicit_sdf_raw(params, cfg, x, packed: bool = True,
                     grid_levels: int | None = None):
    return implicit_forward(params, cfg, x, with_features=False, packed=packed,
                            grid_levels=grid_levels)[0]


def implicit_sdf_raw_sampler(params, cfg, x, blocks,
                             grid_levels: int | None = None):
    """SDF-only forward for the error-bound sampler using the block-table
    fast path (ops/hashgrid.py hash_encode_sampler): dense levels cost one
    row gather per point instead of 16 element gathers. No gradients flow
    here (the sampler probes under stop_gradient)."""
    from holoscene_tpu.ops.hashgrid import hash_encode_sampler

    xn = x / cfg.divide_factor
    grid_dim = cfg.num_levels * cfg.level_dim
    feats = hash_encode_sampler(
        (xn + 1.0) * 0.5, params["grid"], blocks, cfg.grid_meta,
        grid_levels=grid_levels,
    )
    if feats.shape[-1] < grid_dim:
        feats = jnp.concatenate(
            [feats, jnp.zeros(x.shape[:-1] + (grid_dim - feats.shape[-1],),
                              dtype=x.dtype)],
            axis=-1,
        )

    if cfg.multires > 0:
        embed = positional_encoding(x, cfg.multires)
        h = jnp.concatenate([embed, feats], axis=-1)
    else:
        h = jnp.concatenate([x, feats], axis=-1)

    inp = h
    n_layers = len(cfg.layer_dims) - 1
    for layer_i in range(n_layers):
        if layer_i in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / np.sqrt(2)
        h = _weight_norm_apply(params["mlp"][f"lin{layer_i}"], h)
        if layer_i < n_layers - 1:
            h = softplus100(h)
    return h if cfg.color_grid_feature else h[:, : cfg.d_out]


def implicit_shift_sdf_raw(params, cfg, x, packed: bool = True):
    """Disentangled per-object SDFs (reference get_shift_sdf_raw,
    model/network.py:460-480): at points inside the scene (min SDF < 0),
    every NON-winning object's SDF is clamped up to -min_sdf — pushed out of
    the interior — while the winning object keeps the scene SDF. Per-object
    mesh extraction through this selector cannot leak other objects'
    interiors (used by the reference's plotting/extraction paths,
    utils/plots.py:154, :240)."""
    raw = implicit_sdf_raw(params, cfg, x, packed=packed)  # [N, K]
    sdf = raw.min(axis=-1)
    idx = raw.argmin(axis=-1)
    inside = (sdf < 0.0)[:, None]
    shifted = jnp.where(inside, jnp.maximum(raw, -sdf[:, None]), raw)
    n = raw.shape[0]
    shifted = shifted.at[jnp.arange(n), idx].set(sdf)
    return shifted


def implicit_scene_sdf(params, cfg, x):
    """Scene SDF = min over object SDFs (model/network.py:287 MaxPool trick)."""
    return implicit_sdf_raw(params, cfg, x).min(axis=-1)


def implicit_object_sdf(params, cfg, x, idx: int):
    return implicit_sdf_raw(params, cfg, x)[:, idx]


def implicit_multi_object_sdf(params, cfg, x, idxs: tuple[int, ...]):
    return implicit_sdf_raw(params, cfg, x)[:, list(idxs)].min(axis=-1)


def semantic_from_sdf(sdf_raw: jnp.ndarray, k: float) -> jnp.ndarray:
    """ObjectSDF semantic field: k * sigmoid(-k * sdf) (model/network.py:282)."""
    return k * jax.nn.sigmoid(-k * sdf_raw)


def implicit_get_outputs(params, cfg, x):
    """Forward + scene-SDF gradient w.r.t. points.

    Returns (sdf [N], feature_vectors [N,F], gradients [N,3], semantic [N,K],
    sdf_raw [N,K]). Matches get_outputs (model/network.py:273-301); the
    gradient of min-SDF w.r.t. x is one reverse-mode pass through the full
    network including hash grids (JAX supplies the second-order path the
    reference needed custom CUDA for).
    """
    # ONE forward under jax.vjp: the scene-SDF gradient is the pullback of
    # the min-select cotangent through the SAME application of the forward
    # (not a second forward relying on CSE). Consequences on TPU: the hash
    # gathers appear once in the traced graph, so the OUTER training
    # backward accumulates every embedding cotangent (main path + the
    # second-order path through these gradients) before the transpose runs —
    # ONE scatter pass per table instead of one per use.
    (sdf_raw, feature_vectors), pullback = jax.vjp(
        lambda pts: implicit_forward(params, cfg, pts), x
    )
    semantic = semantic_from_sdf(sdf_raw, cfg.sigmoid)
    sdf = sdf_raw.min(axis=-1)

    # cotangent of sum(min(sdf_raw, axis=-1)) — ties share equally, matching
    # jnp.min's gradient
    eq = (sdf_raw == sdf[:, None]).astype(sdf_raw.dtype)
    ct_sdf = eq / eq.sum(axis=-1, keepdims=True)
    (gradients,) = pullback((ct_sdf, jnp.zeros_like(feature_vectors)))
    return sdf, feature_vectors, gradients, semantic, sdf_raw


def implicit_get_outputs_jvp(params, cfg, x):
    """implicit_get_outputs variant computing the scene-SDF gradient with 3
    forward-mode JVPs over the batched forward instead of an inner reverse
    pass. The outer training backward then differentiates a jvp-augmented
    graph (one reverse pass) instead of reverse-over-reverse; the hash
    gathers of primal and tangents share indices and CSE. The gather is a
    linear_call, so the packed-pair path works under jvp (the x-tangent
    flows through the interpolation weights; the table is a constant)."""

    def f(pts):
        raw, feats = implicit_forward(params, cfg, pts)
        return raw.min(axis=-1), (raw, feats)

    cols = []
    aux = None
    for dim in range(3):
        tangent = jnp.zeros_like(x).at[:, dim].set(1.0)
        sdf, jv, aux = jax.jvp(f, (x,), (tangent,), has_aux=True)
        cols.append(jv)
    sdf_raw, feature_vectors = aux
    sdf = sdf_raw.min(axis=-1)
    gradients = jnp.stack(cols, axis=-1)  # [N, 3]
    semantic = semantic_from_sdf(sdf_raw, cfg.sigmoid)
    return sdf, feature_vectors, gradients, semantic, sdf_raw


def implicit_get_outputs_fused(params, cfg, x, grad_seed=None,
                               coarse_levels: int | None = None):
    """implicit_get_outputs via the fused encode-with-jacobian custom VJP
    (ops/hashgrid.py hash_encode_fused_dual) — the TPU hot path.

    The hash-grid features AND their analytic spatial jacobian come out of
    one primitive whose backward emits ONE fused scatter per table (primal +
    second-order normal-path cotangents combined per corner — the TPU analog
    of reference hashencoder.cu:376-596 kernel_grid_second_backward). The
    scene-SDF spatial gradient is assembled by chain rule: a vjp through the
    (cheap) MLP trunk pulled back onto the grid jacobian, plus the direct
    positional-embedding term. Requires color_grid_feature, level_dim=2,
    trilinear interpolation, use_grid_feature.

    coarse_levels=L encodes only the first L (coarse) levels — fine-level
    features/jacobian are zero-padded. Used by the tiered render path
    (holoscene.py render_fine_top_f) for low-weight render points; the
    level offsets are shared with the full table (prefix_meta), so grads
    land in the same parameters.
    """
    from holoscene_tpu.ops.hashgrid import hash_encode_fused_dual, prefix_meta

    assert cfg.color_grid_feature and cfg.level_dim == 2
    assert cfg.use_grid_feature and cfg.grid_interp == "trilinear"

    xn = x / cfg.divide_factor
    x01 = (xn + 1.0) * 0.5
    sample = (cfg.color_bwd_sample and grad_seed is not None
              and cfg.fused_fetch == "packed")
    mode = "exact"
    if sample:
        mode = "sampled_all" if cfg.sdf_bwd_sample else "sampled"
    meta = cfg.grid_meta
    emb_a, emb_b = params["grid"], params["color_grid"]
    if coarse_levels is not None and coarse_levels < cfg.num_levels:
        meta = prefix_meta(meta, coarse_levels)
        emb_a = emb_a[: meta.table_rows]
        emb_b = emb_b[: meta.table_rows]
    feats, J, cf = hash_encode_fused_dual(
        x01, emb_a, emb_b, meta,
        cfg.fused_fetch, seed=grad_seed, color_bwd=mode,
    )  # feats [N,F], J [F,3,N] (d feats / d x01), cf [N,F]
    if feats.shape[-1] < cfg.num_levels * cfg.level_dim:
        miss = cfg.num_levels * cfg.level_dim - feats.shape[-1]
        feats = jnp.pad(feats, ((0, 0), (0, miss)))
        cf = jnp.pad(cf, ((0, 0), (0, miss)))
        J = jnp.pad(J, ((0, miss), (0, 0), (0, 0)))

    def head(feature, pts):
        return _implicit_mlp(params, cfg, pts, feature)

    sdf_raw, pullback = jax.vjp(head, feats, x)
    semantic = semantic_from_sdf(sdf_raw, cfg.sigmoid)
    sdf = sdf_raw.min(axis=-1)

    eq = (sdf_raw == sdf[:, None]).astype(sdf_raw.dtype)
    ct_sdf = eq / eq.sum(axis=-1, keepdims=True)
    ct_feat, ct_x_direct = pullback(ct_sdf)

    # d x01 / d x = 1 / (2 * divide_factor)
    dx01_dx = 1.0 / (2.0 * cfg.divide_factor)
    gradients = (
        jnp.einsum("nf,fdn->nd", ct_feat, J) * dx01_dx + ct_x_direct
    )

    cf = _plain_linear_apply(params["color_map_mlp"]["lin0"], cf)
    cf = jax.nn.relu(cf)
    feature_vectors = _plain_linear_apply(params["color_map_mlp"]["lin1"], cf)
    return sdf, feature_vectors, gradients, semantic, sdf_raw


def implicit_all_gradients(params, cfg, x):
    """Jacobian of all K object SDFs + scene SDF w.r.t. points: [N, K+1, 3].

    Replaces the reference's K+1 sequential autograd.grad VJP passes
    (model/network.py:212-254) with 3 forward-mode JVP passes — the input
    is 3-dimensional, so jacfwd needs exactly 3 evaluations regardless of K.
    """

    def f(pts):
        # forward-mode path: gather is a linear_call, so packed works here
        raw = implicit_sdf_raw(params, cfg, pts)
        return jnp.concatenate([raw, raw.min(axis=-1, keepdims=True)], axis=-1)

    # one JVP per input dimension over the BATCHED function (points are
    # independent, so the batched JVP with a broadcast basis tangent yields
    # exactly the per-point directional derivatives)
    cols = []
    for dim in range(3):
        tangent = jnp.zeros_like(x).at[:, dim].set(1.0)
        _, jv = jax.jvp(f, (x,), (tangent,))
        cols.append(jv)  # [N, K+1]
    return jnp.stack(cols, axis=-1)  # [N, K+1, 3]


# ---------------------------------------------------------------------------
# RenderingNetwork (IDR-style color MLP)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RenderingNetworkConfig:
    feature_vector_size: int = 256
    mode: str = "idr"
    d_in: int = 9
    d_out: int = 3
    dims: tuple[int, ...] = (256, 256)
    weight_norm: bool = True
    multires_view: int = 4
    multires_point: int = 4
    multires_normal: int = 4

    @property
    def layer_dims(self) -> tuple[int, ...]:
        d0 = self.d_in + self.feature_vector_size
        if self.multires_view > 0:
            d0 += embedder_out_dim(self.multires_view, 3) - 3
        if self.multires_point > 0 and self.mode == "idr":
            d0 += embedder_out_dim(self.multires_view, 3) - 3
        if self.multires_normal > 0 and self.mode == "idr":
            d0 += embedder_out_dim(self.multires_view, 3) - 3
        return (d0,) + tuple(self.dims) + (self.d_out,)

    @classmethod
    def from_conf(cls, conf, feature_vector_size: int) -> "RenderingNetworkConfig":
        return cls(
            feature_vector_size=feature_vector_size,
            mode=conf.get_string("mode", "idr"),
            d_in=conf.get_int("d_in", 9),
            d_out=conf.get_int("d_out", 3),
            dims=tuple(conf.get_list("dims", [256, 256])),
            weight_norm=conf.get_bool("weight_norm", True),
            multires_view=conf.get_int("multires_view", 4),
            multires_point=conf.get_int("multires_point", 4),
            multires_normal=conf.get_int("multires_normal", 4),
        )


def init_rendering_network(key: jax.Array, cfg: RenderingNetworkConfig) -> Params:
    dims = cfg.layer_dims
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel()[:1])
    mlp = {}
    for layer_i in range(len(dims) - 1):
        in_dim, out_dim = dims[layer_i], dims[layer_i + 1]
        bound = math.sqrt(1.0 / in_dim)
        w = rng.uniform(-bound * math.sqrt(3), bound * math.sqrt(3), (out_dim, in_dim))
        b = rng.uniform(-bound, bound, out_dim)
        mlp[f"lin{layer_i}"] = _make_wn_layer(w, b)
    return {"mlp": mlp}


def rendering_forward(
    params: Params,
    cfg: RenderingNetworkConfig,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
) -> jnp.ndarray:
    """[N,*] inputs -> [N,3] sigmoid RGB (model/network.py:585-614).

    Note the reference embeds points/normals with the *view* embedder
    (multires_view), not their own — we preserve that.
    """
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.multires_point > 0 and cfg.mode == "idr":
        points = positional_encoding(points, cfg.multires_view)
    if cfg.multires_normal > 0 and cfg.mode == "idr":
        normals = positional_encoding(normals, cfg.multires_view)

    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif cfg.mode == "nerf":
        h = jnp.concatenate([view_dirs, feature_vectors], axis=-1)
    else:
        raise NotImplementedError(cfg.mode)

    n_layers = len(cfg.layer_dims) - 1
    for layer_i in range(n_layers):
        h = _weight_norm_apply(params["mlp"][f"lin{layer_i}"], h)
        if layer_i < n_layers - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h[:, :3])


# ---------------------------------------------------------------------------
# ColorImplicitNetworkSingle (Stage-3 texture field)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ColorFieldConfig:
    base_size: int = 16
    end_size: int = 2048
    logmap: int = 19
    num_levels: int = 16
    level_dim: int = 2
    divide_factor: float = 1.5
    hidden: int = 256

    @property
    def grid_meta(self) -> HashGridMeta:
        return HashGridMeta(
            input_dim=3,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_size,
            log2_hashmap_size=self.logmap,
            desired_resolution=self.end_size,
        )


def init_color_field(key: jax.Array, cfg: ColorFieldConfig) -> Params:
    keys = jax.random.split(key, 5)
    grid_dim = cfg.num_levels * cfg.level_dim
    return {
        "grid": init_hash_embeddings(keys[0], cfg.grid_meta),
        "mlp": {
            "lin0": _kaiming_linear(keys[1], grid_dim, cfg.hidden),
            "lin1": _kaiming_linear(keys[2], cfg.hidden, cfg.hidden),
            "lin2": _kaiming_linear(keys[3], cfg.hidden, cfg.hidden),
            "lin3": _kaiming_linear(keys[4], cfg.hidden, 3),
        },
    }


def color_field_forward(params: Params, cfg: ColorFieldConfig, x: jnp.ndarray):
    """x [N,3] -> rgb [N,3] (model/network.py:727-732)."""
    xn = x / cfg.divide_factor
    h = hash_encode((xn + 1.0) * 0.5, params["grid"], cfg.grid_meta)
    for i in range(4):
        h = _plain_linear_apply(params["mlp"][f"lin{i}"], h)
        if i < 3:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)
