from holoscene_tpu.config import ConfigFactory, parse_string


CONF = """
train{
    expname = holoscene_replica_room_0
    learning_rate = 5.0e-4
    lr_factor_for_grid = 20.0
    num_pixels = 1024
}
plot{
    grid_boundary = [-1.0, 1.0]
}
loss{
    rgb_loss = torch.nn.L1Loss
    use_obj_opacity = True
    depth_type = marigold
}
model{
    feature_vector_size = 256
    implicit_network
    {
        d_in = 3
        d_out = 3                       # inline comment
        skip_in = [4]
        inside_outside = True
    }
    density
    {
        params_init{
            beta = 0.1
        }
        beta_min = 0.0001
    }
}
"""


def test_parse_scalars_and_nesting():
    conf = parse_string(CONF)
    assert conf.get_string("train.expname") == "holoscene_replica_room_0"
    assert conf.get_float("train.learning_rate") == 5.0e-4
    assert conf.get_int("train.num_pixels") == 1024
    assert conf.get_list("plot.grid_boundary") == [-1.0, 1.0]
    assert conf.get_string("loss.rgb_loss") == "torch.nn.L1Loss"
    assert conf.get_bool("loss.use_obj_opacity") is True
    assert conf.get_int("model.implicit_network.d_out") == 3
    assert conf.get_list("model.implicit_network.skip_in") == [4]
    assert conf.get_float("model.density.params_init.beta") == 0.1
    assert conf.get_float("model.density.beta_min") == 1e-4


def test_get_config_section():
    conf = parse_string(CONF)
    model = conf.get_config("model")
    assert model.get_int("feature_vector_size") == 256
    imp = model.get_config("implicit_network")
    assert imp.get_bool("inside_outside") is True
    assert conf.get("missing.key", 7) == 7


def test_parse_reference_conf_if_present():
    import os

    path = "/root/reference/confs/replica/room_0/replica_room_0.conf"
    if not os.path.exists(path):
        return
    conf = ConfigFactory.parse_file(path)
    assert conf.get_int("model.implicit_network.d_out") == 32
    assert conf.get_float("train.learning_rate") == 5.0e-4
    assert conf.get_int("model.ray_sampler.N_samples") == 64
    assert conf.get_bool("model.implicit_network.color_grid_feature") is True


def test_perf_knobs_from_conf():
    from holoscene_tpu.config import ConfigFactory
    from holoscene_tpu.models.holoscene import HoloSceneConfig

    conf = ConfigFactory.parse_string(
        """
model {
  feature_vector_size = 64
  sampler_grid_levels = 8
  render_top_m = 56
  implicit_network {
    d_out = 4
    dims = [32,32]
    num_levels = 4
    base_size = 4
    end_size = 32
    logmap = 10
    fused_dual_grid = true
    grid_interp = tetrahedral
  }
  rendering_network { dims = [32,32] }
  ray_sampler {
    N_samples = 8
    N_samples_eval = 12
    N_samples_extra = 4
  }
  density { params_init { beta = 0.1 } }
}
"""
    )
    cfg = HoloSceneConfig.from_conf(conf.get_config("model"))
    assert cfg.sampler_grid_levels == 8
    assert cfg.render_top_m == 56
    assert cfg.implicit.fused_dual_grid
    assert cfg.implicit.grid_interp == "tetrahedral"

    # defaults stay reference-exact when keys are absent
    conf2 = ConfigFactory.parse_string(
        """
model {
  implicit_network { d_out = 4 }
  rendering_network { dims = [32,32] }
  ray_sampler { N_samples = 8 }
  density { params_init { beta = 0.1 } }
}
"""
    )
    cfg2 = HoloSceneConfig.from_conf(conf2.get_config("model"))
    assert cfg2.sampler_grid_levels is None
    assert cfg2.render_top_m == 0
    assert not cfg2.implicit.fused_dual_grid
    assert cfg2.implicit.grid_interp == "trilinear"
