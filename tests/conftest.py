"""Test config: force an 8-device virtual CPU backend so sharding tests run
anywhere (the idiomatic JAX stand-in for a multi-chip mesh)."""
import os

import jax

# The environment's sitecustomize pre-imports jax (so JAX_PLATFORMS set
# here via os.environ is too late), but the backend itself initializes
# lazily — the config API and XLA_FLAGS still take effect now. This keeps
# the suite off the single TPU chip and gives 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Parity tests compare against torch float32; use exact f32 convs/matmuls.
# (Production keeps the fast default: bf16 MXU passes on TPU.)
jax.config.update("jax_default_matmul_precision", "highest")

# XLA compilation is proxied through a remote relay in this environment
# (~1s+ blocking per compile); the persistent cache makes repeat test runs
# fast.
import pathlib  # noqa: E402

_CACHE = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
