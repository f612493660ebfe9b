"""Per-scene conf families (reference confs/{replica,scannetpp,gibson,
custom}/... parity) and the invis_loss{} section -> FinetuneConfig wiring
(reference post confs carry per-term lambdas incl. LaMa-pixel variants;
holoscene_train_post.py:458-560 consumes them)."""
from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.config import ConfigFactory
from holoscene_tpu.losses.holoscene_loss import LossConfig
from holoscene_tpu.models.holoscene import HoloSceneConfig
from holoscene_tpu.stage2.refine import FinetuneConfig, invisible_view_loss

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "confs")
SCENE_CONFS = sorted(
    p for p in glob.glob(os.path.join(CONF_DIR, "*.conf"))
    if "synthetic" not in p and "tpu" not in p
)


@pytest.mark.parametrize("path", SCENE_CONFS, ids=os.path.basename)
def test_scene_conf_parses_into_configs(path):
    conf = ConfigFactory.parse_file(path)
    model_cfg = HoloSceneConfig.from_conf(conf.get_config("model"))
    assert model_cfg.implicit.num_levels == 16
    assert model_cfg.implicit.logmap == 19
    LossConfig.from_conf(conf.get_config("loss"))
    fcfg = FinetuneConfig.from_conf(conf)
    if path.endswith("_post.conf"):
        # reference invis_loss{} values (replica_room_0_post.conf:44-57)
        assert fcfg.rgb_weight == 2.0
        assert fcfg.nm_cos_weight == 25.0
        assert fcfg.nm_l1_weight == 25.0
        assert fcfg.mask_weight == 5.0
        assert fcfg.depth_weight == 20.0
        assert fcfg.lama_rgb_weight == 2.0
        assert fcfg.lama_nm_cos_weight == 20.0
        assert fcfg.lama_nm_l1_weight == 20.0
        assert fcfg.invis_pixels == 1024
        assert not conf.get_bool("model.use_bg_reg")
    elif path.endswith("_tex.conf"):
        assert "NSDatasetTex" in conf.get_string("train.dataset_class")
        assert fcfg.nm_cos_weight == 1.0
        assert fcfg.mask_weight == 0.5
        assert conf.get_int("train.max_total_iters") == 5000
    else:
        # stage-1 confs carry no invis_loss -> defaults
        assert fcfg.nm_l1_weight == 0.0
        assert fcfg.lama_rgb_weight is None
        assert conf.get_int("train.stop_iter") == 100000


def test_scene_conf_scene_specific_values():
    c = ConfigFactory.parse_file(
        os.path.join(CONF_DIR, "custom_siebelgame.conf")
    )
    assert c.get_int("model.implicit_network.d_out") == 64
    assert c.get_int("dataset.max_num_images") == 750
    assert c.get_int("train.checkpoint_freq") == 50
    assert c.get_list("dataset.img_res") == [540, 960]
    s = ConfigFactory.parse_file(
        os.path.join(CONF_DIR, "scannetpp_67d702f2e8.conf")
    )
    assert s.get_list("dataset.img_res") == [584, 876]


def _tiny_scene():
    from holoscene_tpu.models.fields import (
        ImplicitNetworkConfig,
        RenderingNetworkConfig,
    )
    from holoscene_tpu.models.holoscene import init_holoscene
    from holoscene_tpu.ops.sampler import SamplerConfig

    cfg = HoloSceneConfig(
        implicit=ImplicitNetworkConfig(
            feature_vector_size=32, d_out=3, dims=(32, 32), multires=2,
            num_levels=4, level_dim=2, base_size=4, end_size=32, logmap=6,
            color_grid_feature=True, divide_factor=1.1,
        ),
        rendering=RenderingNetworkConfig(
            feature_vector_size=32, dims=(32, 32), multires_view=2,
            multires_point=2, multires_normal=2,
        ),
        sampler=SamplerConfig(N_samples=6, N_samples_eval=8,
                              N_samples_extra=2, beta_iters=2,
                              max_total_iters=1),
        use_bg_reg=False,
    )
    params = init_holoscene(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_invisible_view_loss_lama_pixel_weighting():
    """With inp_mask set, inpainted pixels are weighted by the lama_*
    lambdas: raising only the lama rgb weight must change the loss iff
    inpainted pixels exist, and leave it unchanged when inp_mask==0."""
    params, cfg = _tiny_scene()
    M = 32
    rng = np.random.default_rng(0)
    pose = jnp.eye(4)
    kw = dict(
        gen_rgb=jnp.asarray(rng.uniform(0, 1, (M, 3)), jnp.float32),
        gen_normal=jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
        gen_mask=jnp.ones((M,)),
        uv_unit=jnp.asarray(rng.uniform(-1, 1, (M, 2)), jnp.float32),
    )
    key = jax.random.PRNGKey(1)

    def run(inp, lama_rgb):
        return float(
            invisible_view_loss(
                params, cfg, key, (0,), pose, jnp.asarray(0.5), **kw,
                inp_mask=inp, rgb_weight=2.0, normal_weight=1.0,
                mask_weight=0.5, nm_l1_weight=1.0,
                lama_rgb_weight=lama_rgb, lama_nm_weight=1.0,
                lama_nm_l1_weight=1.0,
            )
        )

    no_inp = jnp.zeros((M,))
    half_inp = jnp.asarray((np.arange(M) % 2).astype(np.float32))
    assert run(no_inp, 2.0) == pytest.approx(run(no_inp, 50.0), rel=1e-6)
    assert run(half_inp, 50.0) > run(half_inp, 2.0)
    # lama weight == base weight degenerates to the unweighted loss
    assert run(half_inp, 2.0) == pytest.approx(run(no_inp, 2.0), rel=1e-5)


def test_finetune_config_from_conf_overrides():
    conf = ConfigFactory.parse_string(
        "invis_loss{ lambda_rgb = 3.0\n num_rays = 256 }"
    )
    fcfg = FinetuneConfig.from_conf(conf, iters=7)
    assert fcfg.rgb_weight == 3.0
    assert fcfg.invis_pixels == 256
    assert fcfg.iters == 7
    # no section at all -> pure defaults
    assert FinetuneConfig.from_conf(ConfigFactory.parse_string("a = 1")) \
        == FinetuneConfig()


def test_invisible_view_loss_depth_term():
    """lambda_depth supervises the ortho-render depth on depth_mask pixels
    (reference :589/:621): the term must move the loss iff the mask is
    nonzero and react to the weight."""
    params, cfg = _tiny_scene()
    M = 24
    rng = np.random.default_rng(1)
    pose = jnp.eye(4)
    kw = dict(
        gen_rgb=jnp.asarray(rng.uniform(0, 1, (M, 3)), jnp.float32),
        gen_normal=jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
        gen_mask=jnp.ones((M,)),
        uv_unit=jnp.asarray(rng.uniform(-1, 1, (M, 2)), jnp.float32),
        gen_depth=jnp.asarray(rng.uniform(0.5, 1.5, (M,)), jnp.float32),
    )
    key = jax.random.PRNGKey(2)

    def run(dmask, w):
        return float(invisible_view_loss(
            params, cfg, key, (0,), pose, jnp.asarray(0.5), **kw,
            gen_depth_mask=dmask, depth_weight=w,
        ))

    ones, zeros = jnp.ones((M,)), jnp.zeros((M,))
    base = run(zeros, 20.0)
    assert run(ones, 20.0) > base            # depth error contributes
    assert run(ones, 40.0) - base == pytest.approx(
        2 * (run(ones, 20.0) - base), rel=1e-4
    )
    assert run(zeros, 40.0) == pytest.approx(base, rel=1e-6)


def test_bg_lambdas_from_post_conf():
    conf = ConfigFactory.parse_file(
        os.path.join(CONF_DIR, "replica_room0_post.conf")
    )
    fcfg = FinetuneConfig.from_conf(conf)
    assert fcfg.bg_nm_l1 == 25.0 and fcfg.bg_nm_cos == 25.0
    assert fcfg.bg_depth is None  # reference confs carry no bg_depth
