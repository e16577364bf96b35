"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4 test-strategy note)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon site customization pins jax_platforms to "axon,cpu" regardless of
# the env var, so force CPU explicitly for the unit-test mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A 175-test suite accumulates every module's jitted programs (plus
    their LLVM JIT state and constant buffers) in one process; with the
    r5 additions that accumulation made XLA:CPU's compiler segfault
    intermittently near the end of the run (faulthandler trace inside
    backend_compile_and_load on a graph that compiles fine in
    isolation).  Dropping caches at module granularity bounds the
    accumulation; cross-module compile reuse was minimal (distinct
    configs per module), so the runtime cost is small.
    """
    yield
    import jax

    jax.clear_caches()
