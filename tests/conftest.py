"""Test harness config: run all tests on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices.

Note: the environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon already in the env, so the platform must be overridden via
`jax.config.update` (env vars alone are too late). XLA_FLAGS is read lazily
at backend initialization, which has not happened yet when conftest runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the CPU test suite: the 1-core CI host is
# compile-bound (cold suite ~16 min, mostly XLA), and same-machine cache
# reuse is safe (cross-MACHINE reuse of CPU AOT entries is not — this dir
# is gitignored and never shipped). Separate from the TPU .jax_cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (full-size backbone parity)"
    )
    config.addinivalue_line(
        "markers",
        "heavy: minute-plus CPU tests (pipeline e2e, legacy zoo, FSD corpus)."
        " Dev loop: pytest -m 'not slow and not heavy' (<5 min on 1 core);"
        " full tiers: pytest -m 'not slow' then pytest -m slow.",
    )


@pytest.fixture(scope="session")
def cpu_mesh():
    """An 8-device 1-D mesh with a 'data' axis."""
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return Mesh(np.array(devices), axis_names=("data",))


@pytest.fixture(scope="session")
def cpu_mesh_2d():
    """A 4x2 mesh with ('data', 'model') axes for tensor-sharding tests."""
    devices = jax.devices()
    return Mesh(np.array(devices).reshape(4, 2), axis_names=("data", "model"))
