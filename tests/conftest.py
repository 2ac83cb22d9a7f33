"""Test config: force an 8-device virtual CPU backend so sharding tests run
anywhere (the idiomatic JAX stand-in for a multi-chip mesh)."""
import os

# Hard-set CPU: the ambient environment pins JAX_PLATFORMS to the TPU
# plugin, but the suite must run on the virtual 8-device CPU mesh (and not
# contend for / depend on the single TPU chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

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
