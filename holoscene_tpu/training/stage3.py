"""Stage-3 runner: per-object texture (color field) training + UV baking.

Reference semantics: training/holoscene_train_texture.py
(`HoloSceneTrainTextureRunner`) — per object: a fresh
ColorImplicitNetworkSingle (hash grid + 4-layer MLP -> sigmoid RGB,
model/network.py:687-746) trained with Adam (grid LR x factor, exponential
decay; :299-313) on MSE between the field queried at rasterized per-pixel
world positions and the GT pixels inside the object's instance mask
(:364-414); background gets max_total_iters, objects max/10 (:311);
UV-bake into a texture atlas with nearest-neighbor gutter inpainting ->
surface_{i}.obj/.mtl/.png (:717-796).

TPU-first differences:
  * rasterization + masked pixel sampling + field query + loss + update is
    ONE jitted step: a fixed-size batch of valid pixels is drawn on-device
    (categorical over the valid mask), so shapes never change;
  * UV unwrapping replaces xatlas with native normal-cone charts packed
    into the atlas (utils/uv_atlas.py) baked through the fragment-scatter
    rasterizer in UV space; gutters are KNN-inpainted like the reference's
    texture (scipy cKDTree). A per-triangle fallback atlas remains
    (atlas="triangles").
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from holoscene_tpu.models.fields import (
    ColorFieldConfig,
    color_field_forward,
    init_color_field,
)
from holoscene_tpu.ops.rasterizer import rasterize_mesh
from holoscene_tpu.utils.mesh import Mesh, write_obj


def make_color_optimizer(lr: float, lr_factor_for_grid: float, total_iters: int):
    decay = 0.1 ** (1.0 / max(total_iters, 1))

    def adam(peak):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_learning_rate(
                optax.exponential_decay(peak, 1, decay)
            ),
        )

    return optax.multi_transform(
        {"grid": adam(lr * lr_factor_for_grid), "net": adam(lr)},
        lambda p: {"grid": "grid", "mlp": "net"},
    )


def _query_color_field(params, cfg, pts: np.ndarray, chunk: int) -> np.ndarray:
    """Chunked + padded device query of the color field (static shapes keep
    jit compiles reused across meshes)."""
    rgb = np.empty((len(pts), 3), dtype=np.float32)
    for i in range(0, len(pts), chunk):
        pc = np.asarray(pts[i : i + chunk], dtype=np.float32)
        npad = (-len(pc)) % 1024
        pc_p = (np.concatenate([pc, np.zeros((npad, 3), np.float32)])
                if npad else pc)
        out = np.asarray(color_field_forward(params, cfg, jnp.asarray(pc_p)))
        rgb[i : i + chunk] = out[: len(pc)]
    return rgb


def _knn_fill_gutters(tex: np.ndarray, covered: np.ndarray) -> None:
    """Fill uncovered texels with their nearest covered texel's color
    (reference xatlas bake gutter fill, holoscene_train_texture.py:779-790).
    In-place on tex."""
    if not covered.any() or covered.all():
        return
    from scipy.spatial import cKDTree

    yx_cov = np.argwhere(covered)
    yx_miss = np.argwhere(~covered)
    tree = cKDTree(yx_cov)
    _, nn = tree.query(yx_miss, k=1)
    tex[yx_miss[:, 0], yx_miss[:, 1]] = tex[yx_cov[nn][:, 0], yx_cov[nn][:, 1]]


class Stage3Runner:
    def __init__(
        self,
        meshes: list[Mesh],
        dataset,
        cfg: ColorFieldConfig = ColorFieldConfig(),
        lr: float = 5e-4,
        lr_factor_for_grid: float = 20.0,
        max_total_iters: int = 5000,
        pixels_per_step: int = 4096,
        out_dir: str = "stage3_out",
        texture_res: int = 2048,
        seed: int = 0,
        quiet: bool = False,
    ):
        self.meshes = meshes
        self.dataset = dataset
        self.cfg = cfg
        self.lr = lr
        self.lr_grid = lr_factor_for_grid
        self.max_total_iters = max_total_iters
        self.pixels_per_step = pixels_per_step
        self.out_dir = out_dir
        self.texture_res = texture_res
        self.quiet = quiet
        os.makedirs(out_dir, exist_ok=True)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.color_params: dict[int, dict] = {}

    def _make_step(self, verts, faces, total_iters):
        cfg = self.cfg
        h, w = self.dataset.img_res
        intr = jnp.asarray(self.dataset.intrinsics[:3, :3])
        optimizer = make_color_optimizer(self.lr, self.lr_grid, total_iters)
        m = self.pixels_per_step

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, key, pose, gt_rgb, inst_mask):
            out = rasterize_mesh(verts, faces, pose, intr, (h, w))
            valid = out["mask"].reshape(-1) & inst_mask.reshape(-1)
            wp = out["world_pos"].reshape(-1, 3)
            n_valid = valid.sum()

            probs = valid.astype(jnp.float32)
            probs = probs / jnp.maximum(probs.sum(), 1.0)
            # degenerate frames (no valid pixels): sample uniformly, weight 0
            probs = jnp.where(n_valid > 0, probs, 1.0 / probs.shape[0])
            idx = jax.random.choice(key, probs.shape[0], (m,), p=probs)

            pts = wp[idx]
            gt = gt_rgb.reshape(-1, 3)[idx]

            def loss_fn(p):
                rgb = color_field_forward(p, cfg, pts)
                l = jnp.mean((rgb - gt) ** 2)
                return jnp.where(n_valid > 0, l, 0.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step, optimizer

    def _make_invis_step(self, verts, faces, optimizer, res: int):
        """Generated-view supervision for the color field
        (reference get_invis_loss/get_bg_loss,
        holoscene_train_texture.py:431-436, :487-573): rasterize the object
        mesh from the generated ORTHO view, query the field at the
        rasterized world positions, MSE against the generated rgb inside
        the generated mask."""
        cfg = self.cfg
        m = self.pixels_per_step

        @partial(jax.jit, donate_argnums=(0, 1))
        def invis_step(params, opt_state, key, pose, half_extent, gen_rgb,
                       gen_mask):
            out = rasterize_mesh(verts, faces, pose, None, (res, res),
                                 ortho_half_extent=half_extent)
            valid = out["mask"].reshape(-1) & (gen_mask.reshape(-1) > 0.5)
            wp = out["world_pos"].reshape(-1, 3)
            n_valid = valid.sum()
            probs = valid.astype(jnp.float32)
            probs = probs / jnp.maximum(probs.sum(), 1.0)
            probs = jnp.where(n_valid > 0, probs, 1.0 / probs.shape[0])
            idx = jax.random.choice(key, probs.shape[0], (m,), p=probs)
            pts = wp[idx]
            gt = gen_rgb.reshape(-1, 3)[idx]

            def loss_fn(p):
                rgb = color_field_forward(p, cfg, pts)
                return jnp.where(n_valid > 0, jnp.mean((rgb - gt) ** 2), 0.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return invis_step

    def train_object(self, obj_i: int, n_iters: int | None = None,
                     vis_info: list[dict] | None = None):
        """Train one object's color field (reference :292-414); `vis_info`
        packs add generated-view supervision."""
        mesh = self.meshes[obj_i]
        total = n_iters or (
            self.max_total_iters if obj_i == 0 else self.max_total_iters // 10
        )
        verts = jnp.asarray(mesh.vertices, jnp.float32)
        faces = jnp.asarray(mesh.faces, jnp.int32)
        step, optimizer = self._make_step(verts, faces, total)
        self.key, k_init = jax.random.split(self.key)
        params = init_color_field(k_init, self.cfg)
        opt_state = optimizer.init(params)

        invis_step = None
        if vis_info:
            res = vis_info[0]["rgb"].shape[0]
            invis_step = self._make_invis_step(verts, faces, optimizer, res)

        h, w = self.dataset.img_res
        occ = self.dataset.class_id_occurences.get(obj_i, [])
        frames = occ if occ else list(range(self.dataset.n_images))
        losses = []
        for it in range(total):
            frame = int(self.rng.choice(frames))
            self.key, k = jax.random.split(self.key)
            params, opt_state, loss = step(
                params, opt_state, k,
                jnp.asarray(self.dataset.pose_all[frame]),
                jnp.asarray(self.dataset.rgb_images[frame].reshape(h, w, 3)),
                jnp.asarray(
                    self.dataset.semantic_images[frame].reshape(h, w) == obj_i
                ),
            )
            if invis_step is not None:
                pack = vis_info[int(self.rng.integers(len(vis_info)))]
                self.key, k2 = jax.random.split(self.key)
                params, opt_state, _ = invis_step(
                    params, opt_state, k2,
                    jnp.asarray(pack["pose"], jnp.float32),
                    jnp.asarray(float(pack["half_extent"])),
                    jnp.asarray(pack["rgb"], jnp.float32),
                    jnp.asarray(pack["mask"], jnp.float32),
                )
            if it % 50 == 0 or it == total - 1:
                losses.append(float(loss))
                if not self.quiet:
                    print(f"[stage3 obj {obj_i}] it {it} mse={losses[-1]:.5f}")
        self.color_params[obj_i] = params
        return losses

    # ------------------------------------------------------------------
    # texture baking
    # ------------------------------------------------------------------

    def export_mesh_texture(self, obj_i: int, texture_res: int | None = None,
                            chunk: int = 65536, atlas: str = "charts"):
        """Bake the color field into a UV atlas and write
        surface_{obj_i}.obj/.mtl/.png (reference :717-796).

        atlas="charts" (default): normal-cone charts packed into the atlas
        (utils/uv_atlas.py — the xatlas replacement; orders of magnitude
        fewer charts than faces, seam-safe bilinear sampling inside charts).
        atlas="triangles": round-1 per-triangle fallback.
        """
        assert obj_i in self.color_params, "train the object first"
        mesh = self.meshes[obj_i]
        tex_res = texture_res or self.texture_res
        params = self.color_params[obj_i]
        cfg = self.cfg

        if atlas == "charts":
            return self._export_chart_atlas(obj_i, tex_res, chunk)

        faces = mesh.faces
        verts = mesh.vertices
        f_count = len(faces)
        cells = -(-f_count // 2)
        grid = int(np.ceil(np.sqrt(cells)))
        cell_px = tex_res // grid
        if cell_px < 4:
            # grow the atlas so every face chart gets >= 4x4 texels
            tex_res = 1 << int(np.ceil(np.log2(grid * 4)))
            cell_px = tex_res // grid
            print(f"[stage3] texture resized to {tex_res} "
                  f"({f_count} faces need >=4px charts)")
        pad = 1.0  # px gutter inside each cell

        # split vertices per face; per-face UVs into cell triangles
        tri_verts = verts[faces].reshape(-1, 3)  # [F*3, 3]
        new_faces = np.arange(f_count * 3).reshape(-1, 3)

        cell_idx = np.arange(f_count) // 2
        upper = (np.arange(f_count) % 2).astype(bool)
        cx = (cell_idx % grid) * cell_px
        cy = (cell_idx // grid) * cell_px
        s = cell_px
        lower_uv = np.array([[pad, pad], [s - 2 * pad, pad], [pad, s - 2 * pad]])
        upper_uv = np.array(
            [[s - pad, s - pad], [2 * pad, s - pad], [s - pad, 2 * pad]]
        )
        uv_px = np.where(upper[:, None, None], upper_uv[None], lower_uv[None])
        uv_px = uv_px + np.stack([cx, cy], axis=-1)[:, None, :]
        uvs = uv_px.reshape(-1, 2) / tex_res
        uvs[:, 1] = 1.0 - uvs[:, 1]  # OBJ vt convention (v up)

        # bake: every texel -> owning face -> barycentric -> world pos
        ty, tx = np.mgrid[0:cell_px, 0:cell_px]
        tx = tx.ravel() + 0.5
        ty = ty.ravel() + 0.5
        is_upper_tex = (tx + ty) > s
        texel_cnt = cell_px * cell_px

        tex = np.zeros((tex_res, tex_res, 3), dtype=np.float32)
        covered = np.zeros((tex_res, tex_res), dtype=bool)

        # barycentric coords of texels in their cell triangle
        def bary_of(tri_uv_px, px, py):
            """tri_uv_px [F,3,2]; px, py [F,P] -> bary [F,P,3]."""
            a, b, c = tri_uv_px[:, 0], tri_uv_px[:, 1], tri_uv_px[:, 2]
            v0 = b - a
            v1 = c - a
            v2 = np.stack([px, py], -1) - a[:, None]
            d00 = np.sum(v0 * v0, -1)[:, None]
            d01 = np.sum(v0 * v1, -1)[:, None]
            d11 = np.sum(v1 * v1, -1)[:, None]
            d20 = np.einsum("fpd,fd->fp", v2, v0)
            d21 = np.einsum("fpd,fd->fp", v2, v1)
            den = np.maximum(d00 * d11 - d01 * d01, 1e-12)
            v = (d11 * d20 - d01 * d21) / den
            w_ = (d00 * d21 - d01 * d20) / den
            return np.stack([1 - v - w_, v, w_], axis=-1)  # [F, P, 3]

        tri_world = verts[faces]  # [F, 3, 3]
        # process faces in chunks to bound memory
        fchunk = max(1, chunk // texel_cnt)
        for f0 in range(0, f_count, fchunk):
            f1 = min(f0 + fchunk, f_count)
            sel = slice(f0, f1)
            up = upper[sel]
            tex_mask = np.where(up[:, None], is_upper_tex[None], ~is_upper_tex[None])
            tri_uv = uv_px.reshape(-1, 3, 2)[sel]  # cell-absolute px
            px = cx[sel][:, None] + tx[None]
            py = cy[sel][:, None] + ty[None]
            # barycentrics in cell-local texel coords
            tri_uv_local = tri_uv - np.stack(
                [cx[sel], cy[sel]], -1
            )[:, None, :]
            bary = np.clip(bary_of(tri_uv_local,
                                   np.broadcast_to(tx, (f1 - f0, texel_cnt)),
                                   np.broadcast_to(ty, (f1 - f0, texel_cnt))),
                           0, 1)
            bary = bary / np.maximum(bary.sum(-1, keepdims=True), 1e-12)
            wp = np.einsum("fpk,fkd->fpd", bary, tri_world[sel])
            pts = wp[tex_mask]
            if len(pts) == 0:
                continue
            rgb = _query_color_field(params, cfg, pts, chunk)
            ix = np.clip(px[tex_mask].astype(int), 0, tex_res - 1)
            iy = np.clip(py[tex_mask].astype(int), 0, tex_res - 1)
            tex[iy, ix] = rgb
            covered[iy, ix] = True

        _knn_fill_gutters(tex, covered)

        # write artifacts
        from PIL import Image

        png_name = f"surface_{obj_i}.png"
        obj_path = os.path.join(self.out_dir, f"surface_{obj_i}.obj")
        Image.fromarray(
            np.clip(tex * 255, 0, 255).astype(np.uint8)
        ).save(os.path.join(self.out_dir, png_name))
        out_mesh = Mesh(tri_verts, new_faces, uvs=uvs)
        write_obj(obj_path, out_mesh, mtl_name=f"surface_{obj_i}.mtl",
                  texture_png=png_name)
        return obj_path

    def _export_chart_atlas(self, obj_i: int, tex_res: int, chunk: int):
        """Chart-packed bake: build the atlas, rasterize the UV geometry
        with the fragment-scatter rasterizer (an orthographic camera over
        the atlas plane — the auto-subdivide guard handles oversized UV
        triangles), query the color field at per-texel world positions, and
        KNN-fill the gutters."""
        from holoscene_tpu.utils.uv_atlas import build_chart_atlas

        mesh = self.meshes[obj_i]
        params = self.color_params[obj_i]
        cfg = self.cfg
        verts = np.asarray(mesh.vertices, dtype=np.float64)
        faces = np.asarray(mesh.faces, dtype=np.int64)

        tri_verts, new_faces, uv_px, n_charts, tex_res = build_chart_atlas(
            verts, faces, tex_res
        )
        if not self.quiet:
            print(f"[stage3 obj {obj_i}] atlas: {n_charts} charts for "
                  f"{len(faces)} faces @ {tex_res}^2")

        # rasterize the UV layout: fake ortho camera over the atlas plane
        uvV = np.concatenate(
            [uv_px - tex_res / 2.0, np.ones((len(uv_px), 1))], axis=-1
        ).astype(np.float32)
        out = rasterize_mesh(
            uvV, new_faces, np.eye(4, dtype=np.float32), None,
            (tex_res, tex_res), ortho_half_extent=tex_res / 2.0,
        )
        fid = np.asarray(out["face_id"])
        bary = np.asarray(out["bary"])
        covered = fid >= 0

        tri_world = verts[faces]                      # [F,3,3]
        wp = np.einsum(
            "pk,pkd->pd",
            bary[covered],
            tri_world[fid[covered]],
        ).astype(np.float32)

        tex = np.zeros((tex_res, tex_res, 3), dtype=np.float32)
        iy, ix = np.nonzero(covered)
        tex[iy, ix] = _query_color_field(params, cfg, wp, chunk)

        _knn_fill_gutters(tex, covered)

        from PIL import Image

        uvs = uv_px / tex_res
        uvs = uvs.copy()
        uvs[:, 1] = 1.0 - uvs[:, 1]                  # OBJ vt convention
        png_name = f"surface_{obj_i}.png"
        obj_path = os.path.join(self.out_dir, f"surface_{obj_i}.obj")
        Image.fromarray(
            np.clip(tex * 255, 0, 255).astype(np.uint8)
        ).save(os.path.join(self.out_dir, png_name))
        out_mesh = Mesh(tri_verts, new_faces, uvs=uvs)
        write_obj(obj_path, out_mesh, mtl_name=f"surface_{obj_i}.mtl",
                  texture_png=png_name)
        return obj_path

    def run(self, objects: list[int] | None = None, n_iters: int | None = None):
        objs = objects if objects is not None else range(len(self.meshes))
        paths = []
        for obj_i in objs:
            self.train_object(obj_i, n_iters)
            paths.append(self.export_mesh_texture(obj_i))
        return paths
