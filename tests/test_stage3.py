import numpy as np
import pytest

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.models.fields import ColorFieldConfig
from holoscene_tpu.training.stage3 import Stage3Runner
from holoscene_tpu.utils.mc import marching_tetrahedra
from holoscene_tpu.utils.mesh import Mesh, read_obj


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("s3")
    generate_scene(str(root / "scene_0"), n_images=6, img_res=(32, 32))
    return NSDataset(str(root), "scene_0", img_res=(32, 32))


def _sphere_mesh(center, r, res=20, scale=1.3):
    axis = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    c = np.asarray(center) / scale
    sdf = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) - r / scale
    sp = 2.0 / (res - 1)
    v, f = marching_tetrahedra(sdf, origin=(-1,) * 3, spacing=(sp,) * 3)
    return Mesh(v, f)


def test_stage3_trains_and_bakes(scene, tmp_path):
    from holoscene_tpu.datasets.synthetic import DEFAULT_SPHERES

    sp = DEFAULT_SPHERES[0]  # red sphere = instance id 1
    mesh = _sphere_mesh(sp["center"], sp["radius"])
    cfg = ColorFieldConfig(num_levels=4, logmap=12, end_size=64, hidden=32)
    runner = Stage3Runner(
        [None, mesh], scene, cfg=cfg, max_total_iters=600,
        pixels_per_step=512, out_dir=str(tmp_path), texture_res=128,
        quiet=True,
    )
    losses = runner.train_object(1, n_iters=60)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    obj_path = runner.export_mesh_texture(1, texture_res=128)
    baked = read_obj(obj_path)
    assert baked.uvs is not None and len(baked.uvs) == len(baked.vertices)
    assert (tmp_path / "surface_1.png").exists()
    assert (tmp_path / "surface_1.mtl").exists()

    from PIL import Image

    tex = np.asarray(Image.open(tmp_path / "surface_1.png"), dtype=np.float32) / 255
    # trained on a red-ish sphere: the texture should be red-dominant
    assert tex[..., 0].mean() > tex[..., 2].mean()


def test_chart_atlas_fewer_charts_and_seam_safe(tmp_path):
    """VERDICT r1 #7: charts instead of per-face islands — >=3x fewer
    charts, and HALF-RES bilinear sampling of the baked texture at face
    interiors reproduces the field (no seam bleed inside charts)."""
    from holoscene_tpu.utils.uv_atlas import build_chart_atlas

    mesh = _sphere_mesh([0.0, 0.0, 0.0], 0.5, res=16)
    verts, faces = mesh.vertices, mesh.faces
    tex_res = 256
    tri_verts, new_faces, uv_px, n_charts, tex_res = build_chart_atlas(
        verts, faces, tex_res
    )
    assert n_charts * 3 <= len(faces), (n_charts, len(faces))

    # bake a smooth analytic "field": rgb = affine(world position)
    def field(p):
        return np.clip(0.5 + 0.45 * p, 0.0, 1.0)

    from holoscene_tpu.ops.rasterizer import rasterize_mesh

    uvV = np.concatenate(
        [uv_px - tex_res / 2.0, np.ones((len(uv_px), 1))], axis=-1
    ).astype(np.float32)
    out = rasterize_mesh(uvV, new_faces, np.eye(4, dtype=np.float32), None,
                         (tex_res, tex_res), ortho_half_extent=tex_res / 2.0)
    fid = np.asarray(out["face_id"])
    bary = np.asarray(out["bary"])
    covered = fid >= 0
    assert covered.mean() > 0.25, "charts should fill a decent atlas share"
    tri_world = verts[faces]
    wp = np.einsum("pk,pkd->pd", bary[covered], tri_world[fid[covered]])
    tex = np.zeros((tex_res, tex_res, 3), np.float32)
    tex[covered] = field(wp)
    # gutter fill
    from scipy.spatial import cKDTree

    yx_cov = np.argwhere(covered)
    yx_miss = np.argwhere(~covered)
    tree = cKDTree(yx_cov)
    _, nn = tree.query(yx_miss, k=1)
    tex[yx_miss[:, 0], yx_miss[:, 1]] = tex[yx_cov[nn][:, 0], yx_cov[nn][:, 1]]

    # sample at HALF resolution (mip level 1) with bilinear filtering at
    # each face centroid's UV; compare against the field at the centroid
    half = 0.25 * (
        tex[0::2, 0::2] + tex[1::2, 0::2] + tex[0::2, 1::2] + tex[1::2, 1::2]
    )
    hres = tex_res // 2
    cen_uv = uv_px.reshape(-1, 3, 2).mean(axis=1) / 2.0  # half-res px
    cen_world = tri_verts.reshape(-1, 3, 3).mean(axis=1)
    x = np.clip(cen_uv[:, 0] - 0.5, 0, hres - 1.001)
    y = np.clip(cen_uv[:, 1] - 0.5, 0, hres - 1.001)
    x0, y0 = x.astype(int), y.astype(int)
    fx, fy = (x - x0)[:, None], (y - y0)[:, None]
    s = (
        half[y0, x0] * (1 - fx) * (1 - fy)
        + half[y0, x0 + 1] * fx * (1 - fy)
        + half[y0 + 1, x0] * (1 - fx) * fy
        + half[y0 + 1, x0 + 1] * fx * fy
    )
    err = np.abs(s - field(cen_world)).max()
    assert err < 0.12, f"half-res bilinear seam error {err}"
