"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-device tests exercise shard_map / halo-exchange / psum paths via JAX's
standard fake-multi-device mechanism (SURVEY.md §4c); the real-TPU paths are
exercised by bench.py and __graft_entry__.py outside pytest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports JAX_PLATFORMS=axon
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The shell exports JAX_PLATFORMS=axon and the environment pins the flag, so
# the env var alone is not enough — force the CPU backend via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracle comparisons
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
