"""Compiled-kernel smoke test on real TPU hardware.

Every other kernel test runs the Pallas interpreter on CPU, which
validates semantics but not Mosaic lowering — the x64-poisons-Pallas
class of bug (bench_suite.py scopes jax_enable_x64 for exactly this
reason) is invisible to the interpreter. This test runs the real
compiled kernel for a few steps in a subprocess against the ambient TPU
backend (the suite's own process is pinned to CPU by conftest.py), and
auto-skips when no TPU is reachable.

Run explicitly with `pytest -m tpu` — deselected by default (pyproject
addopts) because the tunnel admits one TPU process at a time and a
default `pytest` run would contend with any active benchmark.
"""

import os
import subprocess
import sys

import pytest

from latticeboltzmann_tpu.utils.tpulock import tpu_lock


def _run_on_chip(*args, **kwargs):
    """subprocess.run under the inter-process TPU lock: the child owns
    the single-slot chip for its lifetime, so it must not overlap any
    benchmark of this repo (utils/tpulock.py).

    A child that produces no output and exceeds its timeout is a
    tunnel-environment failure, not a kernel one: through the axon
    tunnel, remote-compile latency is bimodal (1-2 min normally, 8-15
    min per program in bad stretches — docs/ROADMAP.md), and one child
    compiles several programs. Skip rather than fail so the tpu marker
    stays meaningful on flaky-tunnel days; on a real (non-tunnel) TPU
    machine compiles are local and the 1800 s budget is never reached."""
    with tpu_lock():
        try:
            return subprocess.run(*args, **kwargs)
        except subprocess.TimeoutExpired as e:
            pytest.skip(
                "TPU child exceeded its compile budget "
                f"({e.timeout:.0f} s) — tunnel hung or in a slow stretch"
            )


def _tpu_child_env() -> dict:
    """Child env with conftest's CPU pinning undone.

    conftest.py pins the suite process to a forced-CPU mesh: it sets
    JAX_PLATFORMS=cpu, rewrites XLA_FLAGS with the virtual-device +
    AVX-ISA-cap flags, and pops PALLAS_AXON_POOL_IPS (the axon TPU
    plugin's registration gate). Children inherit that env, so an
    on-chip subprocess must restore the stashed pre-conftest values —
    otherwise every tpu test reports NO_TPU_BACKEND and skips even when
    the chip is healthy (this regressed silently in round 5 because the
    tpu marker is deselected by default)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    pre_flags = env.pop("LBM_PRE_CONFTEST_XLA_FLAGS", None)
    if pre_flags is not None:
        if pre_flags:
            env["XLA_FLAGS"] = pre_flags
        else:
            env.pop("XLA_FLAGS", None)
    pool_ips = env.pop("LBM_PRE_CONFTEST_POOL_IPS", None)
    if pool_ips is not None:
        env.setdefault("PALLAS_AXON_POOL_IPS", pool_ips)
    return env


_SMOKE = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU_BACKEND")
    raise SystemExit(3)

from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry

# 1. compiled fused kernel (spec walls, T-blocked) vs the XLA engine
cfg = LatticeConfig(nx=64, ny=256, dtype=np.float32)
walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
sim = Simulation(cfg, walls, backend="pallas")
sim.run(16)
f = sim.state()
assert np.isfinite(f).all() and (f >= 0).all(), "pallas state not finite/positive"
ref = Simulation(cfg, walls, backend="xla")
ref.run(16)
np.testing.assert_allclose(f, ref.state(), rtol=1e-4, atol=1e-6)
print("KERNEL_PARITY_OK")

# 2. x64 scoping: an f64 (XLA-engine) run must not poison a subsequent
#    fresh Mosaic compile (new shapes force recompilation)
jax.config.update("jax_enable_x64", True)
cfg64 = LatticeConfig(nx=24, ny=64, dtype=np.float64)
s64 = Simulation(cfg64, geometry.channel(cfg64.nx, cfg64.ny), backend="xla")
s64.run(4)
assert np.isfinite(s64.state()).all()
jax.config.update("jax_enable_x64", False)

cfg2 = LatticeConfig(nx=32, ny=384, dtype=np.float32)
sim2 = Simulation(cfg2, geometry.channel_with_barrier(cfg2.nx, cfg2.ny),
                  backend="pallas")
sim2.run(8)
assert np.isfinite(sim2.state()).all()
print("POST_X64_COMPILE_OK")
print("SMOKE_OK")
"""


@pytest.mark.tpu
def test_compiled_kernel_smoke_on_tpu():
    env = _tpu_child_env()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_on_chip(
        [sys.executable, "-c", _SMOKE],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode == 3 and "NO_TPU_BACKEND" in out:
        pytest.skip("no TPU backend reachable")
    if proc.returncode != 0 and (
        "Unable to initialize backend" in out or "remote_compile" in out
    ):
        pytest.skip(f"TPU tunnel unavailable/flaky: {out[-500:]}")
    assert proc.returncode == 0, out[-4000:]
    assert "SMOKE_OK" in proc.stdout, out[-4000:]


_RDMA_SMOKE = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU_BACKEND")
    raise SystemExit(3)

from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry

# in-kernel remote-DMA halo exchange on a 1-device ring (self-RDMA):
# must reproduce the ppermute halo path bitwise. On multi-chip hardware
# the same backend exercises real ICI transfers.
cfg = LatticeConfig(nx=128, ny=256, dtype=np.float32)
walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
a = Simulation(cfg, walls, backend="sharded-pallas-rdma",
               allow_experimental=True).run(16).state()
b = Simulation(cfg, walls, backend="sharded-pallas").run(16).state()
assert np.isfinite(a).all(), "rdma state not finite"
assert np.array_equal(a, b), f"rdma != ppermute, maxdiff {np.abs(a-b).max()}"
print("RDMA_RING_OK")
"""


@pytest.mark.tpu
def test_rdma_ring_on_tpu():
    """Compiled remote-DMA halo kernel vs the ppermute path, 1-device
    ring. Skips while the compile environment cannot compile collective
    Pallas kernels (the axon tunnel's AOT helper SIGABRTs on
    make_async_remote_copy for lack of TPU topology — docs/SCALING.md);
    runs as-is on a real (multi-)chip machine."""
    env = _tpu_child_env()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_on_chip(
        [sys.executable, "-c", _RDMA_SMOKE],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode == 3 and "NO_TPU_BACKEND" in out:
        pytest.skip("no TPU backend reachable")
    if proc.returncode != 0 and (
        "Unable to initialize backend" in out
        or "remote_compile" in out
        or "TPU_WORKER_HOSTNAMES" in out
    ):
        pytest.skip(
            "TPU environment cannot compile collective Pallas kernels "
            f"(docs/SCALING.md): {out[-300:]}"
        )
    assert proc.returncode == 0, out[-4000:]
    assert "RDMA_RING_OK" in proc.stdout, out[-4000:]


_DS_SMOKE = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU_BACKEND")
    raise SystemExit(3)

from latticeboltzmann_tpu.ops import df64

# 1. the error-free-transform contract on the real chip: XLA:TPU must
#    compile f32 add/sub/mul with exactly one rounding per op (no FMA
#    contraction, no constant cancellation through the barrier) — the
#    property the whole double-single engine stands on. Verified live
#    2026-08-19: TPU v5 lite passes.
assert df64.check_backend(), "TPU backend breaks one-rounding f32 semantics"
print("DS_BACKEND_OK")

# 2. the full ds engine vs the golden f64 model on chip: 200 steps on
#    the reference barrier scene must track serial double semantics to
#    pair precision (~2^-48 per op; tolerance as tests/test_ds.py).
from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry
from latticeboltzmann_tpu.models import golden

cfg = LatticeConfig(nx=32, ny=96, dtype=np.float64)
walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
sim = Simulation(cfg, walls, backend="xla-ds64")
sim.run(200)
st = sim.state()
g = golden.initial_state(cfg)
for _ in range(200):
    g = golden.step(g, walls, cfg)
err = np.abs(st - g).max()
print("ds-vs-golden max|d|:", err)
assert err < 1e-11, f"ds engine drifted from golden f64 on chip: {err}"

# 3. the compiled fused ds kernel (Mosaic, fast tier, temporal blocking,
#    odd step count for the tail pass): golden parity at the fast-tier
#    bound, plus Mosaic literal-constant pair semantics implicitly.
sim2 = Simulation(cfg, walls, backend="pallas-ds64")
sim2.run(201)
g = golden.step(g, walls, cfg)
err2 = np.abs(sim2.state() - g).max()
print("fused-ds-vs-golden max|d|:", err2)
assert err2 < 1e-11, f"fused ds kernel drifted from golden f64 on chip: {err2}"

# 4. the multi-chip pair-DP path compiled on a 1-device ring: ext-halo
#    kernel form + real ppermutes; must match the local ds kernel's
#    golden parity.
sim3 = Simulation(cfg, walls, backend="sharded-pallas-ds64")
sim3.run(201)
err3 = np.abs(sim3.state() - g).max()
print("sharded-ds-vs-golden max|d|:", err3)
assert err3 < 1e-11, f"sharded ds kernel drifted on chip: {err3}"
print("DS_OK")
"""


@pytest.mark.tpu
def test_ds_engine_on_tpu():
    """The double-single engine's two on-chip contracts: df64's
    error-free transforms survive XLA:TPU compilation (one rounding per
    f32 op), and the full xla-ds64 backend tracks the golden f64 model
    at pair precision. CPU runs validate the same under an AVX ISA cap
    (tests/conftest.py); this is the real-hardware check the conftest
    comment defers to."""
    env = _tpu_child_env()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_on_chip(
        [sys.executable, "-c", _DS_SMOKE],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode == 3 and "NO_TPU_BACKEND" in out:
        pytest.skip("no TPU backend reachable")
    if proc.returncode != 0 and (
        "Unable to initialize backend" in out or "remote_compile" in out
    ):
        pytest.skip(f"TPU tunnel unavailable/flaky: {out[-500:]}")
    assert proc.returncode == 0, out[-4000:]
    assert "DS_OK" in proc.stdout, out[-4000:]


_SKEW_SMOKE = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU_BACKEND")
    raise SystemExit(3)

from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry

# compiled wavefront (skew) kernel vs the trapezoid kernel on a scene
# whose partition contains a multi-block free run: nx=256, barrier at
# rows [96, 106) -> masked {0-1, 6-7}, free runs of 1 and 3 blocks
# (mirrors tests/test_pallas.py::_skew_scene). Equality is bitwise: the
# Mosaic-compiled arithmetic DAG per site is identical.
cfg = LatticeConfig(nx=256, ny=256, dtype=np.float32)
walls = geometry.channel(cfg.nx, cfg.ny)
walls[96:106, 10:13] = True
a = Simulation(cfg, walls, backend="pallas", skew=True, temporal=3).run(18).state()
b = Simulation(cfg, walls, backend="pallas", skew=False, temporal=3).run(18).state()
assert np.isfinite(a).all() and (a >= 0).all(), "skew state not finite/positive"
d = float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
print("skew-vs-trapezoid max|d|:", d)
assert d <= 1e-6, f"skew != trapezoid on chip, maxdiff {d}"
print("SKEW_OK")
"""


@pytest.mark.tpu
def test_skew_kernel_on_tpu():
    """Compiled wavefront (time-skewed) kernel vs the trapezoid kernel
    on the real chip: validates the Mosaic lowering of the carry
    scratch/bounce pattern that interpret mode cannot (the roll+concat
    crash class lives in the layout pass)."""
    env = _tpu_child_env()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = _run_on_chip(
        [sys.executable, "-c", _SKEW_SMOKE],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode == 3 and "NO_TPU_BACKEND" in out:
        pytest.skip("no TPU backend reachable")
    if proc.returncode != 0 and (
        "Unable to initialize backend" in out or "remote_compile" in out
    ):
        pytest.skip(f"TPU tunnel unavailable/flaky: {out[-500:]}")
    assert proc.returncode == 0, out[-4000:]
    assert "SKEW_OK" in proc.stdout, out[-4000:]
