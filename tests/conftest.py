"""Test harness: force an 8-device virtual CPU mesh so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4).

The axon TPU plugin in this image overrides JAX_PLATFORMS, so we must also
pin the platform through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
