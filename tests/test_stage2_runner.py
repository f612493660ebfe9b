import jax
import numpy as np
import pytest

from holoscene_tpu.datasets.ns_dataset import NSDataset
from holoscene_tpu.datasets.synthetic import generate_scene
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.fields import ImplicitNetworkConfig, RenderingNetworkConfig
from holoscene_tpu.models.holoscene import HoloSceneConfig, init_holoscene
from holoscene_tpu.ops.sampler import SamplerConfig
from holoscene_tpu.stage2.refine import FinetuneConfig
from holoscene_tpu.stage2.runner import Stage2Runner


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("s2r")
    generate_scene(str(root / "scene_0"), n_images=6, img_res=(32, 32))
    return NSDataset(str(root), "scene_0", img_res=(32, 32))


def tiny_cfg(d_out):
    return HoloSceneConfig(
        implicit=ImplicitNetworkConfig(
            feature_vector_size=16, d_out=d_out, dims=(16, 16), multires=2,
            num_levels=3, level_dim=2, base_size=4, end_size=16, logmap=8,
        ),
        rendering=RenderingNetworkConfig(
            feature_vector_size=16, dims=(16, 16), multires_view=2,
            multires_point=2, multires_normal=2,
        ),
        sampler=SamplerConfig(
            N_samples=6, N_samples_eval=8, N_samples_extra=2,
            beta_iters=3, max_total_iters=2,
        ),
        use_bg_reg=False,
    )


def test_stage2_runner_end_to_end(scene, tmp_path):
    cfg = tiny_cfg(len(scene.label_mapping))
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    runner = Stage2Runner(
        params, cfg, scene, out_dir=str(tmp_path / "s2"),
        loss_cfg=LossConfig(depth_weight=0.1, semantic_weight=0.5),
        finetune_cfg=FinetuneConfig(
            iters=2, rays_per_step=64, invis_pixels=64, collision_pts=128,
        ),
        mesh_resolution=32,
        view_render_res=24,
        candidate_levels=(0.0,),
        quiet=True,
    )
    result = runner.run(finetune_iters=2)

    assert "graph" in result and result["graph"][0]["root"]
    assert (tmp_path / "s2" / "graph_node_dict.pkl").exists()
    assert (tmp_path / "s2" / "translation_dict.pkl").exists()
    # at least the background mesh was accepted and written
    assert (tmp_path / "s2" / "coarse_recon_obj_0.ply").exists()
    assert len(result["meshes"]) == len(scene.label_mapping)
    for t in result["translations"].values():
        assert np.all(np.isfinite(t))
    # step 6: the composed scene was re-simulated after intersection
    # resolution (reference holoscene_train_post.py:2003)
    assert (tmp_path / "s2" / "scene_settle.json").exists()
    assert result["scene_settle"]["rounds"] or "note" in result["scene_settle"]


def _box(center, half):
    from holoscene_tpu.utils.mesh import Mesh

    c, h = np.asarray(center, float), np.asarray(half, float)
    sgn = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    v = c + sgn * h
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]]
    )
    return Mesh(v, f)


class _SettleStub:
    """scene_settle only touches out_dir/quiet/_view_mesh — unit-test it
    runner-free (the view-mesh decimation cap rides along unbound)."""

    quiet = True
    view_mesh_cap = 200_000
    _view_mesh = Stage2Runner._view_mesh

    def __init__(self, out_dir):
        self.out_dir = out_dir
        self._view_mesh_cache = {}


def test_scene_settle_stable_scene_is_single_round(tmp_path):
    floor = _box((0, 0.55, 0), (1.0, 0.05, 1.0))
    box = _box((0, 0.3, 0), (0.2, 0.2, 0.2))  # resting on the floor (y-down)
    stub = _SettleStub(str(tmp_path))
    tr, report = Stage2Runner.scene_settle(
        stub, [floor, box], {0: np.zeros(3), 1: np.zeros(3)}
    )
    assert report["stable"] and len(report["rounds"]) == 1
    assert np.allclose(tr[1], 0.0)
    assert (tmp_path / "scene_settle.json").exists()


def test_scene_settle_moves_floating_object(tmp_path):
    floor = _box((0, 0.9, 0), (1.0, 0.05, 1.0))  # support surface at y=0.85
    box = _box((0, 0.3, 0), (0.1, 0.1, 0.1))  # hovering far above (y-down)
    stub = _SettleStub(str(tmp_path))
    tr, report = Stage2Runner.scene_settle(
        stub, [floor, box], {0: np.zeros(3), 1: np.zeros(3)}
    )
    # the floating object's translation changed toward the support (either
    # flagged unstable by the quasi-static oracle or settled-by-translation
    # under MuJoCo dynamics — both must move it)
    assert float(np.linalg.norm(tr[1])) > 1e-3
    assert len(report["rounds"]) >= 1
    r0 = report["rounds"][0][0]
    assert (not r0["stable"]) or r0["moved"]


def test_scene_settle_uncapped_verification(tmp_path):
    """The final scene_settle configuration is re-simulated on UNCAPPED
    meshes (VERDICT r3 #8): with a stub cap that forces heavy decimation,
    the report must carry the uncapped cross-check and agree on a clearly
    stable scene."""

    from holoscene_tpu.utils.mesh import Mesh

    def _fine_box(center, half, n=6):
        """Box tessellated n x n per face (12 * n^2 triangles)."""
        import itertools

        verts, faces = [], []
        lin = np.linspace(-1.0, 1.0, n + 1)
        for axis, sign in itertools.product(range(3), (-1.0, 1.0)):
            base = len(verts)
            for a in lin:
                for b in lin:
                    p = np.array(center, np.float64).copy()
                    p[axis] += sign * half[axis]
                    p[(axis + 1) % 3] += a * half[(axis + 1) % 3]
                    p[(axis + 2) % 3] += b * half[(axis + 2) % 3]
                    verts.append(p)
            for i in range(n):
                for j in range(n):
                    v0 = base + i * (n + 1) + j
                    v1, v2, v3 = v0 + 1, v0 + n + 1, v0 + n + 2
                    faces += [[v0, v1, v2], [v1, v3, v2]]
        return Mesh(np.asarray(verts, np.float32),
                    np.asarray(faces, np.int32))

    floor = _fine_box((0, 0.55, 0), (1.0, 0.05, 1.0))
    box = _fine_box((0, 0.3, 0), (0.2, 0.2, 0.2))
    assert len(floor.faces) > 100

    stub = _SettleStub(str(tmp_path))
    stub.view_mesh_cap = 60  # force real decimation of the stand-ins
    tr, report = Stage2Runner.scene_settle(
        stub, [floor, box], {0: np.zeros(3), 1: np.zeros(3)}
    )
    assert "uncapped_check" in report
    assert report["uncapped_agrees"] is True
    assert report["uncapped_check"][0]["stable"]
    assert report["uncapped_check"][0]["drift_delta_deg"] < 8.0

    # opt-out skips the extra sim
    stub2 = _SettleStub(str(tmp_path))
    _, report2 = Stage2Runner.scene_settle(
        stub2, [floor, box], {0: np.zeros(3), 1: np.zeros(3)},
        verify_uncapped=False,
    )
    assert "uncapped_check" not in report2
