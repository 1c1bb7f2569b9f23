"""Test configuration: CPU platform with 8 virtual devices, float64 enabled.

Correctness CI runs entirely on CPU-JAX (mirrors the reference's CPU-only CI,
SURVEY.md §4); multi-chip sharding is exercised on a virtual 8-device mesh via
--xla_force_host_platform_device_count. Note: this image preloads jax with an
`axon` TPU backend via sitecustomize, so we must flip the platform *after*
import but before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402 (already preloaded by sitecustomize)
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound compiler-state growth across the suite.

    The full battery compiles many hundreds of distinct (N, M, J, batch)
    solver shapes in one process; letting the XLA CPU compiler's caches grow
    unboundedly has produced a late-suite segfault inside
    backend_compile_and_load. Dropping the jit caches between modules keeps
    the process footprint flat (per-module compiles are unaffected)."""
    yield
    jax.clear_caches()
