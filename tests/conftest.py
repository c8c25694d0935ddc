"""Test harness config: run everything on CPU with 8 virtual devices so the
sharded path is exercised without real multi-chip hardware, and enable x64
so the float64 golden-parity (serial-double C semantics) tests are real
double precision.

Note: something in the pytest startup path imports jax before this
conftest runs, so setting os.environ alone is not enough — use
jax.config.update, which takes effect as long as no backend has been
initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()!r} — a plugin "
    "initialized a backend before conftest could force the platform"
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from latticeboltzmann_tpu import LatticeConfig, geometry  # noqa: E402


@pytest.fixture
def small_cfg():
    """Small lattice exercising walls + barrier + wrap in a few steps."""
    return LatticeConfig(nx=24, ny=40, dtype=np.float64)


@pytest.fixture
def small_walls(small_cfg):
    w = geometry.channel(small_cfg.nx, small_cfg.ny)
    w[8:14, 10:13] = True  # small interior barrier
    return w
