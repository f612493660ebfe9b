from holoscene_tpu.physics.sim import (
    StabilityResult,
    sim_validation,
    sim_scene,
    get_provider,
)
