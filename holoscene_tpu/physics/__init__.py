from holoscene_tpu.physics.sim import (
    StabilityResult,
    settle_drop,
    sim_validation,
    sim_scene,
    get_provider,
)
