from holoscene_tpu.models.fields import (
    ImplicitNetworkConfig,
    RenderingNetworkConfig,
    init_implicit_network,
    init_rendering_network,
    implicit_forward,
    implicit_sdf_raw,
    implicit_scene_sdf,
    rendering_forward,
)
