"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware, and enable float64 for golden comparisons.

Note: the axon sitecustomize force-registers a TPU backend and sets
jax_platforms="axon,cpu" at interpreter start; we must override the config
value (not just the env var) after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
