"""Test environment: force CPU backend with 8 virtual devices.

This is the TPU-native analog of the reference's single-process two-rank TP
simulation (``/root/reference/src/layers/linear.rs:273-322``): sharding tests
run on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implications).

Note: the env var ``JAX_PLATFORMS`` alone is not enough in this image — the
axon TPU plugin registers regardless — so we also set the config flag, which
wins. Both must happen before the JAX backend initializes (first device use).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, "virtual 8-device CPU mesh failed to initialize"
