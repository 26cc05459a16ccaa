"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can be
validated without TPU hardware.  The env vars must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env vars alone are not honored under the axon TPU plugin, so force the
# config directly (must happen before any backend initialization).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the expensive graphs (DLA-34 init, the bucketed
# association scorer, oracle-parity forwards) compile once per machine instead
# of once per pytest invocation.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# x64 stays off globally (2x compile/runtime cost); tests needing f64 oracles
# use the `x64` fixture below.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.RandomState(7)


@pytest.fixture
def x64():
    """Enable f64 inside a test (for strict numeric oracles)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
