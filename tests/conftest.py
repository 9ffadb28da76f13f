"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest before test modules).
Tests stand in for TPU per SURVEY.md §4's rebuild test strategy; the driver
separately compile-checks the TPU path via __graft_entry__.py.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
# so tests run on the virtual 8-device host mesh, not the tunneled chip.
jax.config.update("jax_platforms", "cpu")

# Tests compare against f64-ish numpy goldens; keep matmuls at full f32.
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules. One 200+-test pytest
    process accumulates hundreds of compiled XLA programs; past the ~90 min
    mark the CPU compiler has been observed to segfault under that pressure
    (full-suite run at 92%), while the same tests pass in half-suite runs.
    Recompiles of shared fixtures cost a little time per module and bound
    the process state instead."""
    yield
    import jax as _jax

    _jax.clear_caches()
