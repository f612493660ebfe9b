"""HoloScene-TPU: a TPU-native (JAX/XLA/Pallas) framework for simulation-ready
interactive 3D scene reconstruction from posed RGB video.

Re-designed from scratch for TPU hardware with the capabilities of the
HoloScene reference pipeline (object-compositional neural-SDF reconstruction,
generative per-object refinement, physics-validated scene graphs, texture
baking, Gaussian-on-Mesh appearance, GLB/USD export).

Layer map:
  ops/       pure-JAX + Pallas math kernels (hash grid, volume rendering,
             error-bound sampling, rasterization, splatting)
  models/    neural fields and renderers (functional: init/apply over pytrees)
  losses/    loss stacks (MonoSDF + HoloScene object-compositional terms)
  datasets/  on-disk dataset loaders (reference-compatible formats)
  parallel/  device mesh + sharding policies (dp over rays / points / splats)
  training/  stage runners (1: SDF recon, 2: generative refine, 3: texture,
             4: gaussian-on-mesh)
  physics/   stability validation providers (host-side)
  export/    GLB / USD / gaussian-USD exporters (host-side)
  utils/     mesh processing, marching cubes, eval metrics
"""

__version__ = "0.1.0"


def honor_platform_env() -> None:
    """Mirror the JAX_PLATFORMS env var into jax.config.

    Out-of-tree accelerator plugins can register themselves ahead of the
    env-var plumbing, so `JAX_PLATFORMS=cpu python -m holoscene_tpu...`
    may silently grab the accelerator anyway (and hang when its transport
    is down). An explicit jax.config.update always wins; calling this from
    every entry point makes the documented env contract actually hold for
    subprocesses (tests/test_gs_datasets.py::test_gs_render_cli)."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def setup_compile_cache() -> None:
    """Enable JAX's persistent compilation cache for this process.

    Stage-1 train steps take minutes to AOT-compile through the remote TPU
    relay; the persistent cache makes every re-run (and crash-resume restart
    under scripts/tpu_supervise.py) start in seconds. Called explicitly by
    the entry-point CLIs and bench.py — importing the package has no side
    effects. Honors HOLOSCENE_COMPILE_CACHE (dir) and
    HOLOSCENE_NO_COMPILE_CACHE=1 (disable); also applies
    honor_platform_env() so JAX_PLATFORMS holds for every CLI.
    """
    import os

    honor_platform_env()
    if os.environ.get("HOLOSCENE_NO_COMPILE_CACHE", "0") == "1":
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HOLOSCENE_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/jax_comp_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
