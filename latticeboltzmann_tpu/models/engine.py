"""Simulation facade — the framework's main user-facing API.

Wraps a functional backend (XLA roll-based, fused Pallas, or sharded
multi-chip) behind the stateful run/diagnose surface that the reference's
main() exposes (src/latticeboltzmann.c:127-182): initialize, advance n
steps, report Reynolds/MLUPS, dump fields.
"""

from __future__ import annotations

import time
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..core import geometry
from ..core.spec import LatticeConfig, W, NSPEEDS
from ..ops import stream_collide as xla_ops

# backend name -> run_steps(f, walls, cfg, n_steps) -> f
_BACKENDS: dict[str, Callable] = {}


def register_backend(name: str, run_steps: Callable) -> None:
    _BACKENDS[name] = run_steps


register_backend("xla", xla_ops.run_steps)


def _register_ds():
    from ..ops import ds_engine, fused_ds_kernel

    # DP-class compensated f32-pair engines (the TPU answer to the
    # reference's double builds; see ops/ds_engine.py and
    # ops/fused_ds_kernel.py)
    register_backend("xla-ds64", lambda f, w, cfg, n, **kw: ds_engine.run_steps(f, w, cfg, n))
    register_backend(
        "pallas-ds64",
        lambda f, w, cfg, n, **kw: fused_ds_kernel.run_steps(f, w, cfg, n),
    )
    register_backend(
        "pallas-ds64-interpret",
        # temporal=2 bounds the interpreter's compile cost (each extra
        # sub-step unrolls the whole ~40-ds-op DAG into the XLA:CPU
        # program; T=4 measured tens of minutes to compile on a 1-core
        # host). Results are bitwise T-independent, so interpret mode —
        # which exists for semantics, not perf — loses nothing.
        lambda f, w, cfg, n, **kw: fused_ds_kernel.run_steps(
            f, w, cfg, n, interpret=True, temporal=2
        ),
    )
    # multi-chip pair-DP: row decomposition + ppermute pair-halo
    # exchange around the ext-halo ds kernel — the DP twin of
    # 'sharded-pallas' (the reference's DP MPI column)
    register_backend(
        "sharded-pallas-ds64",
        lambda f, w, cfg, n, **kw: fused_ds_kernel.sharded_run_steps(f, w, cfg, n),
    )
    register_backend(
        "sharded-pallas-ds64-interpret",
        lambda f, w, cfg, n, **kw: fused_ds_kernel.sharded_run_steps(
            f, w, cfg, n, interpret=True, temporal=2
        ),
    )


_register_ds()

# backends whose state is a df64.DS pair (logical precision ~2^-48;
# cfg.dtype is float64 — the *host-side* precision of state()/f0)
_DS_BACKENDS = {
    "xla-ds64",
    "pallas-ds64",
    "pallas-ds64-interpret",
    "sharded-pallas-ds64",
    "sharded-pallas-ds64-interpret",
}


# backends that accept a wall_spec kwarg (parametric in-kernel geometry,
# no walls DMA — see ops/fused_kernel.py)
_WALL_SPEC_BACKENDS = {
    "pallas",
    "pallas-interpret",
    "sharded-pallas",
    "sharded-pallas-interpret",
    "sharded-pallas-fused",
    "sharded-pallas-fused-interpret",
    "sharded-pallas-rdma",
}

# backends that accept a fast_math kwarg (hardware approximate 1/rho,
# the analog of the reference's -Ofast build; see ops/fused_kernel.py)
_FASTMATH_BACKENDS = {
    "pallas",
    "pallas-interpret",
    "sharded-pallas",
    "sharded-pallas-interpret",
    "sharded-pallas-fused",
    "sharded-pallas-fused-interpret",
    "sharded-pallas-rdma",
}

# backends that accept slip_x/slip_y kwargs (free-slip specular walls)
_SLIP_BACKENDS = {
    "xla",
    "pallas",
    "pallas-interpret",
    "sharded",
    "sharded-sync",
    "sharded-pallas",
    "sharded-pallas-interpret",
    "sharded-pallas-fused",
    "sharded-pallas-fused-interpret",
    "sharded-pallas-rdma",
}


def _register_pallas():
    from ..ops import fused_kernel

    register_backend("pallas", fused_kernel.run_steps)
    # interpreter-mode variant for CPU correctness tests
    register_backend(
        "pallas-interpret",
        lambda f, w, cfg, n, **kw: fused_kernel.run_steps(f, w, cfg, n, interpret=True, **kw),
    )


_register_pallas()


def _register_sharded():
    from ..parallel import sharded

    # overlapped halo exchange (reference's fast MPI mode) and the
    # synchronous exchange-then-compute mode (its baseline mode)
    register_backend("sharded", sharded.make_backend(overlap=True))
    register_backend("sharded-sync", sharded.make_backend(overlap=False))
    # production multi-chip path: fused Pallas kernel per device + ICI
    # ppermute halo exchange
    register_backend("sharded-pallas", sharded.make_pallas_backend())
    register_backend("sharded-pallas-interpret", sharded.make_pallas_backend(interpret=True))
    # single-launch synchronous halo schedule: on ICI the exchange is
    # ~5-7 us/pass, below the ~16 us/step per-launch-boundary tax the
    # overlap schedule pays twice — the faster production choice on a
    # single slice (docs/SCALING.md)
    register_backend("sharded-pallas-fused", sharded.make_pallas_backend(overlap=False))
    register_backend(
        "sharded-pallas-fused-interpret",
        sharded.make_pallas_backend(interpret=True, overlap=False),
    )
    # in-kernel remote-DMA halo exchange (Isend/compute/Waitall overlap
    # as one Pallas kernel); TPU-only
    register_backend("sharded-pallas-rdma", sharded.make_pallas_backend(rdma=True))


_register_sharded()


def available_backends() -> list[str]:
    return sorted(_BACKENDS)


def initial_state(cfg: LatticeConfig) -> np.ndarray:
    """Rest-equilibrium initial fill (src/latticeboltzmann.c:583-591)."""
    f = np.empty((NSPEEDS, cfg.nx, cfg.ny), dtype=np.dtype(cfg.dtype))
    rho = np.asarray(cfg.initial_density, dtype=np.dtype(cfg.dtype))
    for s in range(NSPEEDS):
        f[s] = rho * np.asarray(W[s], dtype=np.dtype(cfg.dtype))
    return f


class Simulation:
    """A running lattice. `backend` selects the compute path:

    - "xla":    portable jnp.roll-based fused step (ops/stream_collide.py)
    - "pallas": fused temporally-blocked Pallas kernel (ops/fused_kernel.py)
    - "sharded": multi-chip row-decomposed path (parallel/sharded.py),
      the TPU equivalent of the reference's MPI mode (README.md:44-57)
    """

    def __init__(
        self,
        cfg: LatticeConfig,
        walls: np.ndarray | None = None,
        *,
        backend: str = "xla",
        f0: np.ndarray | None = None,
        slip_x: np.ndarray | None = None,
        slip_y: np.ndarray | None = None,
        fast_math: bool = False,
        skew: bool | None = None,
        temporal: int | None = None,
        allow_experimental: bool = False,
    ):
        self.cfg = cfg
        self.fast_math = fast_math
        # wavefront time-skewing of the wall-free segment launches on
        # the pallas backends (fused_kernel SKEW_DEFAULT when None),
        # and the temporal-blocking depth override (planner default
        # when None) — both A/B knobs for bench.py / anatomy runs
        self.skew = skew
        self.temporal = temporal
        if walls is None:
            walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
        if walls.shape != (cfg.nx, cfg.ny):
            raise ValueError(f"walls shape {walls.shape} != lattice {(cfg.nx, cfg.ny)}")
        if backend not in _BACKENDS:
            raise ValueError(f"unknown backend {backend!r}; have {available_backends()}")
        if backend == "sharded-pallas-rdma":
            # EXPERIMENTAL quarantine: the in-kernel remote-DMA halo
            # exchange has never *executed* in this environment (the
            # tunnel's AOT compiler rejects collective Pallas kernels and
            # jax 0.9 interpret modes cannot run remote DMA under
            # shard_map; docs/SCALING.md). Its deterministic schedule IS
            # host-verified against the ppermute path
            # (tests/test_rdma_semantics.py), but until
            # test_rdma_ring_on_tpu passes on real multi-chip hardware,
            # selecting it requires an explicit opt-in — a warning alone
            # left unverified code one typo away from production use
            # (round-3 verdict).
            import os

            if not (allow_experimental or os.environ.get("LBM_TPU_EXPERIMENTAL")):
                raise RuntimeError(
                    "sharded-pallas-rdma is EXPERIMENTAL (never executed on "
                    "multi-chip hardware). Pass allow_experimental=True to "
                    "Simulation (or set LBM_TPU_EXPERIMENTAL=1) to opt in; "
                    "prefer 'sharded-pallas' otherwise."
                )
        has_slip = slip_x is not None or slip_y is not None
        if has_slip and backend not in _SLIP_BACKENDS:
            raise NotImplementedError(
                f"free-slip boundaries are not implemented on the {backend!r} "
                f"backend; supported: {sorted(_SLIP_BACKENDS)}"
            )
        self.backend = backend
        self._run_steps = _BACKENDS[backend]
        self.walls_np = np.asarray(walls, dtype=bool)
        self.walls = jnp.asarray(self.walls_np)
        # closed-form geometry spec (None for arbitrary masks): lets the
        # Pallas kernel compute the mask in-kernel instead of DMA'ing it.
        # Slip masks are arbitrary, so slip runs use the DMA'd class plane.
        self.wall_spec = (
            geometry.infer_spec(self.walls_np)
            if backend in _WALL_SPEC_BACKENDS and not has_slip
            else None
        )
        self.slip_x = None if slip_x is None else jnp.asarray(slip_x, bool)
        self.slip_y = None if slip_y is None else jnp.asarray(slip_y, bool)
        # persistent pallas session (ops/fused_kernel.Session): the
        # launch plan and padded buffers are built once, so repeat
        # run() calls are a single dispatch each — without it, each
        # call pays ~0.2-0.3 s of re-plan/re-pad overhead through a
        # tunneled chip (the round-2 slope-vs-e2e gap in bench.py).
        self._session = None
        self._f_leaked = False
        if backend in _DS_BACKENDS:
            from ..ops import df64, ds_engine

            if np.dtype(cfg.dtype) != np.dtype(np.float64):
                raise ValueError(
                    "ds backends carry DP-class state; construct the "
                    "LatticeConfig with dtype=np.float64 (the host-side "
                    "precision of state()/f0)"
                )
            self.f = (
                ds_engine.initial_state(cfg)
                if f0 is None
                else df64.from_f64(np.asarray(f0, np.float64))
            )
        else:
            f_init = initial_state(cfg) if f0 is None else np.asarray(f0, np.dtype(cfg.dtype))
            self.f = jnp.asarray(f_init)
        self._f_leaked = False  # the fresh initial buffer is ours alone
        self.steps_done = 0
        self.elapsed = 0.0

    @property
    def f(self):
        """Current state, unpadded. When the pallas session holds the
        live (padded) state, reading materializes an unpadded snapshot
        lazily; writing replaces the state and invalidates the session's
        copy (the plan and compiled runners are kept).

        A reference obtained here (or assigned via the setter) stays
        valid across run(): the pallas path donates its input buffer to
        the kernel chain, so run() defensively copies the state first
        whenever a reference may be held outside the Simulation."""
        if self._f is None and self._session is not None and self._session.loaded:
            self._f = self._session.state()
            self._f_leaked = False
        self._f_leaked = self._f is not None or self._f_leaked
        return self._f

    @f.setter
    def f(self, value):
        self._f = value
        self._f_leaked = value is not None  # caller may still hold it
        if self._session is not None and value is not None:
            self._session._f_p = self._session._chk = None

    def _pallas_session(self):
        """The persistent fused-kernel session, or None when the backend
        isn't unsharded pallas / the plan falls back to the XLA engine."""
        if self.backend not in ("pallas", "pallas-interpret"):
            return None
        if self._session is None:
            from ..ops import fused_kernel

            self._session = fused_kernel.Session(
                self.cfg,
                self.walls,
                interpret=self.backend == "pallas-interpret",
                wall_spec=self.wall_spec,
                slip_x=self.slip_x,
                slip_y=self.slip_y,
                fast_math=self.fast_math,
                skew=self.skew,
                temporal=self.temporal,
            )
        return self._session if self._session.plan is not None else None

    def _backend_kwargs(self) -> dict:
        """Optional kwargs (wall_spec / slip masks / fast_math) for the
        stateless backend callables, assembled in one place so a new
        option cannot silently miss one of the call sites."""
        kwargs = {}
        if self.wall_spec is not None:
            kwargs["wall_spec"] = self.wall_spec
        if self.slip_x is not None or self.slip_y is not None:
            kwargs["slip_x"] = self.slip_x
            kwargs["slip_y"] = self.slip_y
        if self.fast_math and self.backend in _FASTMATH_BACKENDS:
            kwargs["fast_math"] = True
        if self.skew is not None and self.backend in ("pallas", "pallas-interpret"):
            kwargs["skew"] = self.skew
        if self.temporal is not None and self.backend in ("pallas", "pallas-interpret"):
            kwargs["temporal"] = self.temporal
        if self.backend in (
            "sharded-pallas", "sharded-pallas-interpret", "sharded-pallas-rdma"
        ):
            # host-side mask for the union wall partition (the sharded
            # analog of Session's plan; never a device fetch)
            kwargs["mask"] = self.walls_np
        return kwargs

    def run(self, n_steps: int, *, block: bool = True) -> "Simulation":
        """Advance n_steps on device. The first call per configuration
        includes jit compilation in `elapsed`; benchmarks warm up first
        (bench.py) or use the CLI --warmup flag."""
        t0 = time.perf_counter()
        sess = self._pallas_session()
        if sess is not None:
            if not sess.loaded:
                src = self._f
                if self._f_leaked:
                    # Session.load donates the buffer; never invalidate
                    # an array a caller may still hold (see the f docs)
                    src = jnp.array(src, copy=True)
                sess.load(src)
            self._f = None  # live state now resides padded in the session
            self._f_leaked = False
            sess.advance(n_steps)
            if block:
                sess.block()  # fetch the runner's fused checksum
        else:
            self.f = self._run_steps(
                self.f, self.walls, self.cfg, n_steps, **self._backend_kwargs()
            )
            if block:
                # NOTE: under tunneled TPU runtimes block_until_ready() can
                # return before execution finishes; fetching a scalar reduce
                # of the result is the reliable completion barrier.
                if self.backend in _DS_BACKENDS:
                    float(jnp.sum(self.f.hi[0, 0, :8]))
                else:
                    float(jnp.sum(self.f[0, 0, :8]))
        self.elapsed += time.perf_counter() - t0
        self.steps_done += n_steps
        return self

    def run_probed(
        self, n_steps: int, probes: np.ndarray, *, every: int = 1, block: bool = True
    ) -> np.ndarray:
        """Advance n_steps while recording (rho, u_x, u_y) at probe sites
        every `every` steps. probes: (P, 2) int (i, j) sites. Returns the
        series as (n_steps // every, P, 3). All sampling happens on device;
        the series is fetched once at the end.

        On the 'xla' backend with every == 1 the whole run is a single
        jit(scan) with the probe gather fused into each step. On the
        'pallas' backends the gather is fused into the kernel-pass loop
        (temporal-blocked pairs when every % 8 == 0, single-step passes
        otherwise) — still one jit, one host sync. The sharded backends
        run in `every`-step chunks with a device-side probe gather
        between chunks.
        """
        if n_steps % every:
            raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
        probes = jnp.asarray(np.asarray(probes), jnp.int32)
        if probes.ndim != 2 or probes.shape[1] != 2:
            raise ValueError(f"probes must be (P, 2) (i, j) sites, got {probes.shape}")
        if every == 1 and self.backend == "xla":
            t0 = time.perf_counter()
            self.f, series = xla_ops.run_steps_probed(
                self.f, self.walls, self.cfg, n_steps, probes, self.slip_x, self.slip_y
            )
            if block:
                float(jnp.sum(series[-1]))
            self.elapsed += time.perf_counter() - t0
            self.steps_done += n_steps
        elif self.backend in ("pallas", "pallas-interpret"):
            from ..ops import fused_kernel

            t0 = time.perf_counter()
            # same donation discipline as run(): run_steps_probed donates
            # its input, so never hand it an array a caller may still
            # hold (the f-property's "stays valid" contract)
            src = self._f
            if src is None and self._session is not None and self._session.loaded:
                src = self._session.state()  # fresh unpadded copy
            elif self._f_leaked:
                src = jnp.array(src, copy=True)
            self.f, series = fused_kernel.run_steps_probed(
                src, self.walls, self.cfg, n_steps, probes,
                every=every,
                interpret=self.backend == "pallas-interpret",
                **self._backend_kwargs(),
            )
            if block:
                float(jnp.sum(series[-1]))
            self.elapsed += time.perf_counter() - t0
            self.steps_done += n_steps
        elif hasattr(self._run_steps, "run_probed"):
            # sharded-pallas backends: probe gather fused into the
            # shard_map loop — one jit, one host sync (parity-tested
            # against the xla series in tests/test_probes.py)
            t0 = time.perf_counter()
            self.f, series = self._run_steps.run_probed(
                self.f, self.walls, self.cfg, n_steps, probes, every,
                **self._backend_kwargs(),
            )
            if block:
                float(jnp.sum(series[-1]))
            self.elapsed += time.perf_counter() - t0
            self.steps_done += n_steps
        elif self.backend in _DS_BACKENDS:
            # host-side f64 probe gather between chunks (diagnostic-rate
            # path; the ds state recombines on host at full precision)
            chunks = []
            for _ in range(n_steps // every):
                self.run(every, block=False)
                chunks.append(self.probe_values(probes))
            return np.stack(chunks)
        else:
            chunks = []
            for _ in range(n_steps // every):
                self.run(every, block=False)
                chunks.append(xla_ops.probe_values(self.f, probes))
            series = jnp.stack(chunks)
            if block:
                float(jnp.sum(series[-1]))
        return np.asarray(series)

    def probe_values(self, probes) -> np.ndarray:
        """(rho, u_x, u_y) at (P, 2) probe sites from the CURRENT state —
        the one-shot sampler behind the CLI's --probe on every backend
        (the reference's PrintLattice-style site diagnostics work in
        every precision build, src/latticeboltzmann.c:610-639). ds
        backends recombine the f32 pair to f64 on host first; the others
        gather on device."""
        probes_np = np.asarray(probes)
        if probes_np.ndim != 2 or probes_np.shape[1] != 2:
            raise ValueError(f"probes must be (P, 2) (i, j) sites, got {probes_np.shape}")
        if self.backend in _DS_BACKENDS:
            st = self.state()
            cols = st[:, probes_np[:, 0], probes_np[:, 1]]
            return np.asarray(xla_ops.probe_moments(jnp.asarray(cols)))
        return np.asarray(xla_ops.probe_values(self.f, jnp.asarray(probes_np, jnp.int32)))

    def state(self) -> np.ndarray:
        """Current state as a host array — float64 for ds backends (the
        pair recombined), the storage dtype otherwise."""
        if self.backend in _DS_BACKENDS:
            from ..ops import ds_engine

            return ds_engine.state_f64(self.f)
        return np.asarray(self.f)

    def macroscopic(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.backend in _DS_BACKENDS:
            from ..ops import ds_engine

            return ds_engine.macroscopic(self.f)
        rho, ux, uy = xla_ops.macroscopic(self.f)
        return np.asarray(rho), np.asarray(ux), np.asarray(uy)

    def speed_squared(self) -> np.ndarray:
        """|u|^2 field, the quantity PrintLattice dumps
        (src/latticeboltzmann.c:631-633)."""
        _, ux, uy = self.macroscopic()
        return np.asarray(ux * ux + uy * uy)

    def reynolds(self, col: int | None = None) -> float:
        """Reynolds number at a column (default ny/2, the reference's
        regression scalar, src/latticeboltzmann.c:522-547)."""
        if self.backend in _DS_BACKENDS:
            from ..models import golden

            st = self.state()
            if col is None:
                return golden.reynolds(st, self.walls_np, self.cfg)
            # column override: golden probes ny/2; reuse the xla reducer
            # on the recombined f64 state for other columns
            return float(
                xla_ops.reynolds(jnp.asarray(st), self.walls, self.cfg, col)
            )
        return float(xla_ops.reynolds(self.f, self.walls, self.cfg, col))

    @property
    def mlups(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.cfg.sites * self.steps_done / self.elapsed / 1e6
