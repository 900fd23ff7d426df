"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware, and enable float64 for golden comparisons.

Note: the axon sitecustomize force-registers a TPU backend and sets
jax_platforms="axon,cpu" at interpreter start; we must override the config
value (not just the env var) after importing jax.
"""

import os

import pytest

# ARTS_TPU_TEST=1 activates the compiled-kernel tier: the session keeps
# its natural (TPU) backend and f32, and only @pytest.mark.tpu tests
# run (invoke as `ARTS_TPU_TEST=1 pytest -m tpu`).  Default sessions
# force CPU + x64 and skip the tpu-marked tests.
TPU_TIER = os.environ.get("ARTS_TPU_TEST") == "1"

if not TPU_TIER:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
    except Exception:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-kernel tests needing real TPU hardware "
        "(run with ARTS_TPU_TEST=1 pytest -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    on_tpu = TPU_TIER and jax.devices()[0].platform != "cpu"
    skip = pytest.mark.skip(
        reason="compiled-kernel tier: needs ARTS_TPU_TEST=1 + TPU hardware"
    )
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip)
