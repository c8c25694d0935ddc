"""Fused Pallas kernel vs the XLA engine and the golden oracle, run in
Pallas interpreter mode on CPU (the compiled kernel itself is exercised
on real TPU by bench.py). Covers: padded-lane layout (NY not a lane
multiple), periodic wrap in both axes, walls/bounce-back, forcing, and
the scalar-cleanup-free remainder handling.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry
from latticeboltzmann_tpu.models import golden
from latticeboltzmann_tpu.models.engine import initial_state
from latticeboltzmann_tpu.ops import fused_kernel as fk


def _run_pallas(cfg, walls, n):
    f0 = jnp.asarray(initial_state(cfg))
    out = fk.run_steps(f0, jnp.asarray(walls), cfg, n, interpret=True)
    return np.asarray(out)


def _run_golden64(cfg, walls, n):
    cfg64 = LatticeConfig(
        nx=cfg.nx, ny=cfg.ny, tau=cfg.tau, accel=cfg.accel,
        initial_density=cfg.initial_density, dtype=np.float64,
    )
    return golden.run(golden.initial_state(cfg64), walls, cfg64, n)


def test_pallas_matches_golden_padded_ny():
    """NY=40 pads to 128 lanes: wrap fixes at the true boundary."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[5:9, 10:13] = True
    out = _run_pallas(cfg, walls, 3)
    ref = _run_golden64(cfg, walls, 3)
    assert out.shape == (9, 16, 40)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_pallas_matches_golden_lane_multiple():
    """NY=128 exactly: no padding path."""
    cfg = LatticeConfig(nx=16, ny=128, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 3)
    ref = _run_golden64(cfg, walls, 3)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_pallas_periodic_wrap_empty_box():
    """Empty periodic box: x and y wraps both exercised; equilibrium
    stays a fixed point."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32, accel=0.0)
    walls = geometry.empty(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 4)
    ref = np.asarray(initial_state(cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-8)


def test_pallas_packet_wraps_both_axes():
    """Advect a pure packet across both periodic boundaries (tau huge =
    no collision): checks x halo DMAs and the y lane-roll edge fix."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32, tau=1e9, accel=0.0)
    walls = geometry.empty(cfg.nx, cfg.ny)
    f0 = initial_state(cfg)
    f0[5, cfg.nx - 1, cfg.ny - 1] += 1.0  # +x+y packet at the far corner
    out = fk.run_steps(jnp.asarray(f0), jnp.asarray(walls), cfg, 1, interpret=True)
    out = np.asarray(out)
    assert out[5, 0, 0] > 1.0  # wrapped in both axes


def test_pallas_multi_step_vs_xla():
    """20 steps: pallas f32 vs XLA f32 track each other closely."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[5:9, 10:13] = True
    out = _run_pallas(cfg, walls, 20)
    ref = Simulation(cfg, walls, backend="xla").run(20).state()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-7)


def test_pallas_backend_registered():
    from latticeboltzmann_tpu import available_backends

    assert "pallas" in available_backends()
    assert "pallas-interpret" in available_backends()


def test_pallas_fallback_odd_nx():
    """NX not divisible by any block size falls back to the XLA path."""
    cfg = LatticeConfig(nx=13, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    sim = Simulation(cfg, walls, backend="pallas-interpret")
    sim.run(2)
    ref = Simulation(cfg, walls, backend="xla").run(2).state()
    np.testing.assert_allclose(sim.state(), ref, rtol=1e-6, atol=1e-9)


def test_pallas_invariants():
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 30)
    assert np.isfinite(out).all()
    assert (out >= 0).all()
    # mass conservation (forcing conserves mass)
    ref = np.asarray(initial_state(cfg))
    np.testing.assert_allclose(out.sum(), ref.sum(), rtol=1e-4)


@pytest.mark.parametrize("temporal", [2, 3])
def test_temporal_blocking_equals_single_step(temporal):
    """T-step temporal blocking performs the identical per-site math —
    agreement with T=1 up to compiler FMA-contraction noise (window
    shapes differ, so XLA fuses differently)."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[5:9, 10:13] = True
    f0 = jnp.asarray(initial_state(cfg))
    w = jnp.asarray(walls)
    ref = np.asarray(fk.run_steps(f0, w, cfg, 12, interpret=True, temporal=1))
    out = np.asarray(
        fk.run_steps(jnp.asarray(initial_state(cfg)), w, cfg, 12, interpret=True, temporal=temporal)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)


def test_temporal_blocking_odd_remainder():
    """Step counts not divisible by 2T exercise the single-step tail."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    f0 = jnp.asarray(initial_state(cfg))
    w = jnp.asarray(walls)
    ref = np.asarray(fk.run_steps(f0, w, cfg, 7, interpret=True, temporal=1))
    out = np.asarray(
        fk.run_steps(jnp.asarray(initial_state(cfg)), w, cfg, 7, interpret=True, temporal=2)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)


def test_bf16_mixed_precision_tracks_f32():
    """bf16 storage + f32 collision arithmetic: tracks the f32 run to
    bf16 resolution (the experimental precision of BASELINE config 5)."""
    import jax.numpy as jnp2

    cfg16 = LatticeConfig(nx=16, ny=40, dtype=jnp2.bfloat16)
    cfg32 = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg16.nx, cfg16.ny)
    f16 = jnp.asarray(initial_state(cfg16))
    out16 = np.asarray(
        fk.run_steps(f16, jnp.asarray(walls), cfg16, 10, interpret=True)
    ).astype(np.float32)
    out32 = np.asarray(
        fk.run_steps(jnp.asarray(initial_state(cfg32)), jnp.asarray(walls), cfg32, 10, interpret=True)
    )
    assert np.isfinite(out16).all() and (out16 >= 0).all()
    np.testing.assert_allclose(out16, out32, rtol=0.05, atol=2e-3)


def test_f64_routes_to_xla_engine():
    """float64 through the pallas backend transparently uses the XLA
    engine (f64 is a correctness config; TPU emulates it)."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float64)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = np.asarray(
        fk.run_steps(jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, 5)
    )
    ref = _run_golden64(cfg, walls, 5)
    np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-18)


def test_single_block_grid():
    """NX=8 -> one grid block: the periodic staging degenerates to three
    copies of the same block (G=1 edge case of the slot rotation)."""
    cfg = LatticeConfig(nx=8, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 6)
    ref = _run_golden64(cfg, walls, 6)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_two_block_grid():
    """G=2: every block is its own neighbor's neighbor."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    walls = geometry.empty(cfg.nx, cfg.ny)
    f0 = initial_state(cfg)
    f0[2, 15, 7] += 0.5  # +x mover crossing the G-1 -> 0 wrap
    out = np.asarray(fk.run_steps(jnp.asarray(f0), jnp.asarray(walls), cfg, 1, interpret=True))
    cfg64 = LatticeConfig(nx=16, ny=40, dtype=np.float64)
    ref = golden.run(f0.astype(np.float64), walls, cfg64, 1)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_near_instability_tau():
    """tau close to 1/2 (viscosity -> 0): must stay finite over a short
    run (the reference would hard-fault on NaN; we assert)."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32, tau=0.52)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 20)
    assert np.isfinite(out).all()


def test_zero_accel_is_stationary():
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32, accel=0.0)
    walls = geometry.channel(cfg.nx, cfg.ny)
    out = _run_pallas(cfg, walls, 10)
    ref = np.asarray(initial_state(cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-8)


# --- parametric wall-spec kernel path (no walls DMA) -----------------------


@pytest.mark.parametrize("geom", ["barrier", "cylinder", "channel", "empty"])
def test_wall_spec_bitwise_equals_dma_path(geom):
    """The jit-specialized geometry path (in-kernel iota mask, walls
    plane never DMA'd) must be bitwise identical to the mask-DMA path
    on every closed-form scene."""
    cfg = LatticeConfig(nx=32, ny=200, dtype=np.float32)
    walls = geometry.build(geom, cfg.nx, cfg.ny)
    spec = geometry.infer_spec(walls)
    assert spec is not None
    # run_steps donates its input (freeing the unpadded buffer during
    # the run), so each call gets a fresh device array
    a = np.asarray(fk.run_steps(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, 5, interpret=True))
    b = np.asarray(fk.run_steps(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, 5, interpret=True,
        wall_spec=spec))
    np.testing.assert_array_equal(a, b)


def test_wall_spec_temporal_blocking_bitwise():
    # ny=72 keeps the interpret cost down (this was the suite's slowest
    # test at ny=200); the padded-lane path is identical
    cfg = LatticeConfig(nx=64, ny=72, dtype=np.float32)
    walls = geometry.build("barrier", cfg.nx, cfg.ny)
    spec = geometry.infer_spec(walls)
    a = np.asarray(fk.run_steps(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, 8, interpret=True,
        temporal=4))
    b = np.asarray(fk.run_steps(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, 8, interpret=True,
        temporal=4, wall_spec=spec))
    np.testing.assert_array_equal(a, b)


def test_simulation_auto_infers_wall_spec():
    """The facade engages the spec path automatically for parametric
    scenes on pallas backends, and falls back to mask DMA for arbitrary
    masks — with identical physics either way."""
    cfg = LatticeConfig(nx=24, ny=40, dtype=np.float32)
    walls = geometry.channel_with_barrier(
        cfg.nx, cfg.ny, barrier_rows=(8, 14), barrier_cols=(10, 13)
    )
    sim = Simulation(cfg, walls, backend="pallas-interpret")
    assert sim.wall_spec == (("channel",), ("rect", 8, 14, 10, 13))

    arbitrary = walls.copy()
    arbitrary[20, 30] = True  # second blob: not closed-form
    sim2 = Simulation(cfg, arbitrary, backend="pallas-interpret")
    assert sim2.wall_spec is None

    # spec path == DMA path through the facade
    sim.run(4)
    ref = Simulation(cfg, walls, backend="pallas-interpret")
    ref.wall_spec = None
    ref.run(4)
    np.testing.assert_array_equal(sim.state(), ref.state())


def test_session_persists_across_run_calls():
    """bench.py's hot path: repeated Simulation.run() on a pallas
    backend reuses ONE Session (load once, then one advance() dispatch
    per call, including step counts off the 2*temporal multiple that
    exercise the dynamic remainder runner) and must match a single XLA
    run of the total step count. A state read between advances must
    leave the session intact."""
    cfg = LatticeConfig(nx=16, ny=40, dtype=np.float32)
    # explicit barrier extents: the proportional defaults round to an
    # empty column range at 16x40, which would silently degrade this to
    # a plain-channel test (advisor finding, round 3)
    walls = geometry.channel_with_barrier(
        cfg.nx, cfg.ny, barrier_rows=(5, 9), barrier_cols=(10, 13)
    )
    assert walls.sum() > 2 * cfg.ny  # interior obstacle present
    sim = Simulation(cfg, walls, backend="pallas-interpret")
    sim.run(5)
    mid = sim.state()  # non-destructive snapshot mid-sequence
    sim.run(7)
    sim.run(4)
    assert sim._session is not None and sim._session.loaded
    assert sim.steps_done == 16
    ref = Simulation(cfg, walls, backend="xla")
    # rtol 2e-6: the kernel's pair-shared feq factoring and the XLA
    # path agree bitwise only at f64 (test_xla_parity); with the real
    # barrier in the scene the f32 association-order noise peaks just
    # above 1e-6 after 16 steps
    np.testing.assert_allclose(
        mid, ref.run(5).state(), rtol=2e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        sim.state(), ref.run(11).state(), rtol=2e-6, atol=1e-9
    )


def test_wall_segments_and_partition():
    """The launch-specialization partition: circular runs of
    solid-containing vs solid-free temporal windows, rebased by a row
    rotation so every run is affine, masked runs first."""
    from latticeboltzmann_tpu.ops.fused_kernel import wall_partition, wall_segments

    nx, ny, br, T = 800, 64, 32, 4
    walls = geometry.reference_barrier(nx, ny)

    segs = wall_segments(walls, br, T)
    covered = []
    nb = nx // br
    for s, ln, _ in segs:
        covered += [(s + k) % nb for k in range(ln)]
    assert sorted(covered) == list(range(nb))  # exact cover, no overlap

    rs, rot = wall_partition(walls, br, T)
    assert rs % br == 0
    assert rot[0][2] is True  # masked runs first
    for s, ln, _ in rot:
        assert s + ln <= nb  # every rebased run is affine (no wrap)
    # block b in rotated storage holds physical rows starting rs + b*br;
    # masked runs must cover exactly the windows containing solid rows
    phys_masked = {b for s, ln, w in rot if w for b in range(s, s + ln)}
    row = walls.any(axis=1)
    import numpy as np  # noqa: F811
    ext = np.r_[row[nx - T:], row, row[:T]]
    for b in range(nb):
        p0 = (rs + b * br) % nx
        has = ext[p0: p0 + br + 2 * T].any() if p0 + br + 2 * T <= nx + T else \
            np.r_[ext[p0:], ext[T: T + (p0 + br + 2 * T) - (nx + T)]].any()
        assert (b in phys_masked) == bool(has), b

    # uniform masks collapse to a single segment
    assert wall_partition(geometry.empty(nx, ny), br, T) == (0, ((0, nb, False),))


import contextlib


@contextlib.contextmanager
def _forced_regions():
    """Zero the region cost model so the recompute-region kernel engages
    on CPU-sized lattices (at real scale the economics pick it on their
    own; on toy widths a kernel launch costs more than any region
    saves). Clears the runner caches on entry and exit."""
    orig_part = fk.wall_partition_regions
    orig_fixed = fk.REGION_FIXED_COST

    def zero_cost(mask, br, temporal, ny, nyp, lpad, launch_cost=None, rebase=None):
        return orig_part(mask, br, temporal, ny, nyp, lpad, 0.0, rebase)

    fk.wall_partition_regions = zero_cost
    fk.REGION_FIXED_COST = 0.0
    fk._make_runner.cache_clear()
    fk._make_probed_runner.cache_clear()
    fk.make_step.cache_clear()
    try:
        yield
    finally:
        fk.wall_partition_regions = orig_part
        fk.REGION_FIXED_COST = orig_fixed
        fk._make_runner.cache_clear()
        fk._make_probed_runner.cache_clear()
        fk.make_step.cache_clear()


def test_multi_segment_regions_match_xla():
    """A lattice whose partition yields masked runs (with recompute
    regions) AND free runs under a nonzero row rotation: channel walls
    are rows-narrow (2 rows, all lanes), the interior barrier is
    lanes-narrow (1 lane block), and one block is solid-free. Exercises
    the chained segment launches, the region recomputes, and — via the
    odd step count with temporal=2 — the remainder runner's
    re-partition at T=1 (regions anchor to the window height)."""
    cfg = LatticeConfig(nx=96, ny=1152, dtype=np.float32)
    walls = np.zeros((cfg.nx, cfg.ny), bool)
    walls[0, :] = walls[-1, :] = True   # row-type walls (channel)
    walls[8:24, 600:605] = True        # lane-type wall (thin barrier)

    with _forced_regions():
        nyp, lpad = fk.pick_layout(cfg.ny, 2)
        row_shift, segs = fk.wall_partition_regions(walls, 32, 2, cfg.ny, nyp, lpad)
        assert row_shift % 32 == 0 and row_shift != 0
        assert any(not s[2] for s in segs)            # a free run exists
        regions = [s[3] for s in segs if s[2] and s[3] is not None]
        assert regions, "zero-cost model must produce recompute regions"
        assert any(r[0] for r in regions)  # a row band (channel walls)
        assert any(r[1] for r in regions)  # a lane band (thin barrier)

        f0 = jnp.asarray(initial_state(cfg))
        w = jnp.asarray(walls)
        out = np.asarray(fk.run_steps(f0, w, cfg, 7, interpret=True, temporal=2))
        from latticeboltzmann_tpu.ops import stream_collide

        ref = np.asarray(
            stream_collide.run_steps(jnp.asarray(initial_state(cfg)), w, cfg, 7)
        )
        np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)

        # probed path (T=1 passes under the same rotation)
        probes = jnp.asarray(np.array([[5, 70], [47, 61], [100, 10]]), jnp.int32)
        fout, series = fk.run_steps_probed(
            jnp.asarray(initial_state(cfg)), w, cfg, 6, probes, every=3,
            interpret=True,
        )
        fref, sref = stream_collide.run_steps_probed(
            jnp.asarray(initial_state(cfg)), w, cfg, 6, probes
        )
        np.testing.assert_allclose(np.asarray(fout), np.asarray(fref), rtol=0, atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(series), np.asarray(sref)[2::3], rtol=0, atol=5e-6
        )


def test_region_equals_coarse_on_rough_state():
    """The recompute-region path must match the coarse full-mask
    partition — from a spatially rough state, so any sub-window
    coordinate slip (e.g. the ey=-1 lane roll taken modulo nyp instead
    of the window width, a real regression caught on hardware) produces
    O(1e-2) errors instead of hiding in near-uniform startup flow. The
    tolerance is tight (1e-6 absolute after 12 steps) but not zero: XLA
    fuses the select-free and masked interpret graphs differently, so
    legitimate FMA-contraction noise of ~2e-8 appears on ~30% of
    sites. T=3 (the production f32 default) and a multiple-of-2T step
    count keep this — the suite's most expensive compile — to two
    programs on the 1-core CI container."""
    cfg = LatticeConfig(nx=96, ny=1152, dtype=np.float32)
    walls = np.zeros((cfg.nx, cfg.ny), bool)
    walls[0, :] = walls[-1, :] = True
    walls[8:24, 600:605] = True

    rng = np.random.default_rng(7)
    f0 = initial_state(cfg) * (1.0 + 0.1 * rng.random((9, cfg.nx, cfg.ny))).astype(
        np.float32
    )
    w = jnp.asarray(walls)
    with _forced_regions():
        nyp, lpad = fk.pick_layout(cfg.ny, 3)
        _, segs = fk.wall_partition_regions(walls, 32, 3, cfg.ny, nyp, lpad)
        assert any(s[3] is not None for s in segs)
        out_region = np.asarray(
            fk.run_steps(jnp.asarray(f0), w, cfg, 12, interpret=True, temporal=3)
        )

    orig = fk.wall_partition_regions

    def coarse(mask, br, temporal, ny, nyp, lpad, launch_cost=2400.0, rebase=None):
        rs, segs = fk.wall_partition(np.asarray(mask), br, temporal)
        return rs, tuple((s, ln, wm, None) for (s, ln, wm) in segs)

    fk.wall_partition_regions = coarse
    fk._make_runner.cache_clear()
    fk.make_step.cache_clear()
    try:
        out_coarse = np.asarray(
            fk.run_steps(jnp.asarray(f0), w, cfg, 12, interpret=True, temporal=3)
        )
    finally:
        fk.wall_partition_regions = orig
        fk._make_runner.cache_clear()
        fk.make_step.cache_clear()
    np.testing.assert_allclose(out_region, out_coarse, rtol=0, atol=1e-6)


def test_refresh_interval_bounds():
    from latticeboltzmann_tpu.ops.fused_kernel import refresh_interval

    assert refresh_interval(48, 48, 4000, 4) == 11
    assert refresh_interval(4, 4, 4000, 4) == 1     # never below 1
    assert refresh_interval(54, 54, 40, 1) == 39    # capped by ny


@pytest.mark.parametrize("n_steps", [6, 7])
def test_lane_panel_grid_matches_xla(n_steps):
    """The 2-D lane-panel grid (capability fallback for lattices whose
    full-width row blocks exceed VMEM) forced onto a small lattice:
    ny=640 pads to nyp=768, panels=3 gives 256-lane panels staged as
    512-lane windows at clipped offsets 0/128/256 — first, middle, and
    last panel variants all exercised, with the barrier crossing the
    panel-0/1 lane boundary and forcing in panel 0. n_steps=7 also runs
    the panel remainder pass."""
    from latticeboltzmann_tpu.ops import stream_collide

    cfg = LatticeConfig(nx=24, ny=640, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[8:14, 180:260] = True  # spans real cols mapping across lane 256
    f0 = initial_state(cfg)
    nyp, lpad = fk.pick_layout(cfg.ny, 1)
    assert (nyp, lpad) == (768, 64)
    out = np.asarray(
        fk.run_steps(
            jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps,
            interpret=True, panels=3,
        )
    )
    ref = np.asarray(
        stream_collide.run_steps(jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps)
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


def test_panels_auto_select_is_fallback_only():
    """Panels engage only when no full-width row block fits VMEM: the
    4000x16000 plan (BR=16 single-launch fits) must stay at panels=1."""
    itemsize = 4
    nyp, _ = fk.pick_layout(16000, 2)
    assert fk.pick_block_config(4000, nyp, itemsize, walls_dma=False)[0] > 0
    cfg = LatticeConfig(nx=4000, ny=16000, dtype=np.float32)
    plan = fk._plan(cfg, 4000, None, None, False, False)
    assert plan is not None and plan[6] == 1


def test_lane_band_wall_at_band_edge_matches_xla():
    """Regression: a thin barrier whose wall lanes sit exactly at a
    128-aligned lane-band edge. The stored lane patch is exactly
    [l0, l1), so wall cells must be >= T lanes INSIDE the band or the
    free evolution's contamination (one lane per step) leaks past the
    band edge unpatched — silent 5e-4-scale wrong physics within a few
    steps, growing every pass. wall_partition_regions now expands the
    wall lanes by T before snapping to lane blocks. ny=1152 pads to
    nyp=1280 with lpad=64, so real cols 192-196 are lanes 256-260: the
    first wall lane IS the band edge of block 2."""
    from latticeboltzmann_tpu.ops import stream_collide

    cfg = LatticeConfig(nx=96, ny=1152, dtype=np.float32)
    walls = np.zeros((cfg.nx, cfg.ny), bool)
    walls[8:24, 192:197] = True
    with _forced_regions():
        nyp, lpad = fk.pick_layout(cfg.ny, 3)
        assert (nyp, lpad) == (1280, 64)
        _, segs = fk.wall_partition_regions(walls, 32, 3, cfg.ny, nyp, lpad)
        bands = [s[3][1] for s in segs if s[2] and s[3] is not None]
        assert bands and bands[0], "the lane-band region path must engage"
        (l0, l1), = bands[0]
        # the expanded band must give the wall lanes a >= T margin
        assert l0 <= 256 - 3 and l1 >= 260 + 3

        f0 = jnp.asarray(initial_state(cfg))
        w = jnp.asarray(walls)
        out = np.asarray(fk.run_steps(f0, w, cfg, 12, interpret=True, temporal=3))
        ref = np.asarray(
            stream_collide.run_steps(jnp.asarray(initial_state(cfg)), w, cfg, 12)
        )
        np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


def test_lane_band_near_lattice_edge_falls_back_to_full_mask():
    """A barrier within T lanes of the padded lane edge cannot carry the
    recompute margin: the expanded band reaches lane 0 and region_of
    must return None (full-mask selects), never a margin-less band.
    Real cols 64-68 are lanes 128-132 (lpad=64); the T-expanded band
    [0, 256) has no input margin at lane 0."""
    from latticeboltzmann_tpu.ops import stream_collide

    cfg = LatticeConfig(nx=96, ny=1152, dtype=np.float32)
    walls = np.zeros((cfg.nx, cfg.ny), bool)
    walls[8:24, 64:69] = True
    with _forced_regions():
        nyp, lpad = fk.pick_layout(cfg.ny, 3)
        _, segs = fk.wall_partition_regions(walls, 32, 3, cfg.ny, nyp, lpad)
        assert all(s[3] is None for s in segs)  # no region: full-mask path
        f0 = jnp.asarray(initial_state(cfg))
        w = jnp.asarray(walls)
        out = np.asarray(fk.run_steps(f0, w, cfg, 6, interpret=True, temporal=3))
        ref = np.asarray(
            stream_collide.run_steps(jnp.asarray(initial_state(cfg)), w, cfg, 6)
        )
        np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


@pytest.mark.parametrize("n_steps", [6, 5])
def test_panel_tight_pads_match_xla(n_steps):
    """Regression: lane panels with tight mirror pads (ny=762 pads to
    nyp=768 with lpad=rpad=3 = temporal), where min(lpad,rpad)//T == 1:
    the between-pass XLA remirror must run EVERY pass (the old
    K//2-pair cadence let pads decay T lanes deep on the second pass of
    each pair), and the remainder path (n_steps=5: two T=1 pairs + one
    single) must remirror per pass, not once up front."""
    from latticeboltzmann_tpu.ops import stream_collide

    cfg = LatticeConfig(nx=64, ny=762, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    nyp, lpad = fk.pick_layout(cfg.ny, 3)
    assert (nyp, lpad) == (768, 3)
    f0 = initial_state(cfg)
    out = np.asarray(
        fk.run_steps(
            jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps,
            interpret=True, panels=2, temporal=3,
        )
    )
    ref = np.asarray(
        stream_collide.run_steps(jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps)
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


def test_auto_panel_plan_partitions_with_segments():
    """Round 4: the auto-panel fallback composes with the launch
    partition — panel plans carry affine wall-partitioned runs (masked
    AND select-free) with recompute regions stripped (the one thing the
    panel kernel still rejects)."""
    cfg = LatticeConfig(nx=256, ny=40960, dtype=np.float32)
    walls = np.zeros((cfg.nx, cfg.ny), bool)
    walls[0, :] = walls[-1, :] = True
    walls[40:48, 20000:20004] = True
    plan = fk._plan(cfg, cfg.nx, walls, None, False, True)
    assert plan is not None and plan[6] > 1            # panels engaged
    segs, br = plan[5], plan[2]
    nb = cfg.nx // br
    assert len(segs) >= 2                              # partitioned
    assert all(r is None for (_s, _l, _w, r) in segs)  # regions stripped
    assert all(s + (ln or nb) <= nb for (s, ln, _w, _r) in segs)  # affine
    assert any(w for (_s, _l, w, _r) in segs)
    assert any(not w for (_s, _l, w, _r) in segs)
    sess = fk.Session(cfg, jnp.asarray(walls))         # must not raise
    assert sess.plan is not None and sess.panels > 1

    # walls-free ultra-wide lattices take one select-free launch
    nowalls = np.zeros((cfg.nx, cfg.ny), bool)
    plan2 = fk._plan(cfg, cfg.nx, nowalls, None, False, True)
    assert plan2 is not None and len(plan2[5]) == 1
    assert not plan2[5][0][2]  # wall_mode False


@pytest.mark.parametrize("n_steps", [6, 7])
def test_panels_with_segments_match_xla(n_steps):
    """Panels x launch partition (round 4): a walled scene whose
    partition splits into masked + select-free runs, forced onto a
    2-panel grid — both panel variants of both run kinds execute, plus
    the remainder pass at n_steps=7. Must match the XLA engine."""
    from latticeboltzmann_tpu.ops import stream_collide

    cfg = LatticeConfig(nx=64, ny=640, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[24:30, 180:260] = True  # mid-lattice barrier, crosses lane 256
    f0 = initial_state(cfg)
    nyp, lpad = fk.pick_layout(cfg.ny, 3)
    _shift, segs = fk.wall_partition_regions(walls, 8, 3, cfg.ny, nyp, lpad)
    assert len(segs) >= 2  # the scene genuinely partitions at br=8
    out = np.asarray(
        fk.run_steps(
            jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps,
            interpret=True, panels=2, temporal=3,
        )
    )
    ref = np.asarray(
        stream_collide.run_steps(jnp.asarray(f0), jnp.asarray(walls), cfg, n_steps)
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


def test_panels_reject_slip_and_slip_avoids_auto_panels():
    """The panel kernel has no slip path: an explicit panels= override
    with slip masks must raise (the old guard compared has_slip to None
    and could never fire), and the auto-panel planner must never engage
    for slip runs — Session falls back to the XLA engine instead."""
    cfg = LatticeConfig(nx=64, ny=762, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    slip = np.zeros_like(walls)
    slip[1, :] = True
    f0 = initial_state(cfg)
    with pytest.raises(ValueError, match="panels"):
        fk.run_steps(
            jnp.asarray(f0), jnp.asarray(walls), cfg, 2,
            interpret=True, panels=2, temporal=3, slip_x=jnp.asarray(slip),
        )
    cfg_wide = LatticeConfig(nx=96, ny=40960, dtype=np.float32)
    walls_w = np.zeros((cfg_wide.nx, cfg_wide.ny), bool)
    walls_w[0, :] = True
    sess = fk.Session(
        cfg_wide, jnp.asarray(walls_w),
        slip_x=jnp.asarray(np.roll(walls_w, 1, axis=0)),
    )
    assert sess.plan is None  # XLA fallback, not an unvalidated panel run


# ------------------------------------------------------------------ skew
# Wavefront time-skewing of the wall-free segments (fused_kernel's
# emit_carry / skew launches): fixed parallelogram windows with a
# 2-row-per-time-level carry passed block-to-block through the
# sequential grid. Mathematically identical to the classic trapezoid
# windows; interpret-mode results differ only by XLA fusion (fma) noise
# (~1 ulp), so the equalities here are tight allclose, and the impulse
# test pins the carry indexing exactly (any row/level misindex would be
# an O(impulse) error, not noise).


def _rough_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    f0 = np.asarray(initial_state(cfg), np.float64)
    f0 *= 1.0 + 0.05 * rng.standard_normal(f0.shape)
    return np.abs(f0).astype(cfg.dtype)


def _run_skewpair(cfg, walls, n, temporal, **kw):
    a = fk.run_steps(jnp.asarray(_rough_state(cfg)), jnp.asarray(walls),
                     cfg, n, interpret=True, temporal=temporal, skew=False,
                     **kw)
    b = fk.run_steps(jnp.asarray(_rough_state(cfg)), jnp.asarray(walls),
                     cfg, n, interpret=True, temporal=temporal, skew=True,
                     **kw)
    return np.asarray(a), np.asarray(b)


def test_skew_matches_classic_periodic_box():
    """Pure periodic box: one full-grid free run -> emit_carry trapezoid
    for block 0 + a 3-block wavefront launch (nx=128, br=32)."""
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    walls = geometry.empty(cfg.nx, cfg.ny)
    a, b = _run_skewpair(cfg, walls, 24, 3)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def _skew_scene():
    """channel + barrier at nx=256 whose partition contains BOTH a
    >= 2-block free run (the skew rewrite engages: emit_carry + skew
    launches) and a 1-block free run (stays a plain trapezoid) —
    asserted, so plan drift can't silently turn these tests vacuous."""
    walls = geometry.channel(256, 40)
    walls[96:106, 10:13] = True
    return walls


@pytest.mark.parametrize("temporal", [2, 3])
def test_skew_matches_classic_masked_scene(temporal):
    """Masked + free runs: the skew rewrite applies only to the free
    runs; masked trapezoids are untouched."""
    cfg = LatticeConfig(nx=256, ny=40, dtype=np.float32)
    walls = _skew_scene()
    nyp, lpad = fk.pick_layout(cfg.ny, temporal)
    _, segs = fk.wall_partition_regions(
        np.asarray(walls), 32, temporal, cfg.ny, nyp, lpad
    )
    free_lens = sorted(ln for _, ln, wm, _ in segs if not wm)
    assert free_lens == [1, 3]  # one skewable run, one single-block run
    a, b = _run_skewpair(cfg, walls, 4 * temporal, temporal)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_skew_remainder_steps():
    """A step count off the 2T multiple exercises the T=1 remainder
    passes, which never skew."""
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    walls = geometry.channel(cfg.nx, cfg.ny)
    a, b = _run_skewpair(cfg, walls, 14, 3)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_skew_bf16_storage():
    """bf16 storage: the carry and bounce scratch stay f32 (the compute
    precision), so skew tracks the classic kernel at the same noise
    scale as any bf16 graph change."""
    cfg = LatticeConfig(nx=128, ny=40, dtype="bfloat16")
    walls = geometry.channel(cfg.nx, cfg.ny)
    a, b = _run_skewpair(cfg, walls, 8, 2)
    np.testing.assert_allclose(
        a.astype(np.float32), b.astype(np.float32), rtol=0, atol=2e-3
    )


def test_skew_matches_golden():
    """Anchor skew to the float64 golden oracle directly (not just to
    the classic kernel), on a scene whose partition has a real
    >= 2-block free run (see _skew_scene)."""
    cfg = LatticeConfig(nx=256, ny=40, dtype=np.float32)
    walls = _skew_scene()
    f0 = jnp.asarray(initial_state(cfg))
    out = np.asarray(fk.run_steps(f0, jnp.asarray(walls), cfg, 4,
                                  interpret=True, temporal=2, skew=True))
    ref = _run_golden64(cfg, walls, 4)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_skew_probed_runner():
    """run_steps_probed with skew: same final state and probe series.
    Interpret mode plans T=1 (under which skew never engages), so the
    explicit temporal=2 with every=4 is what makes the probed runner
    actually build emit_carry + skew launches."""
    cfg = LatticeConfig(nx=256, ny=40, dtype=np.float32)
    walls = _skew_scene()
    probes = np.array([[5, 7], [130, 20]])
    f0 = _rough_state(cfg)
    fa, sa = fk.run_steps_probed(jnp.asarray(f0), jnp.asarray(walls), cfg,
                                 8, probes, every=4, interpret=True,
                                 temporal=2, skew=False)
    fb, sb = fk.run_steps_probed(jnp.asarray(f0), jnp.asarray(walls), cfg,
                                 8, probes, every=4, interpret=True,
                                 temporal=2, skew=True)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("row", [33, 34, 63, 64, 127, 0])
def test_skew_impulse_carry_boundaries(row):
    """A delta impulse at carry-critical rows (block edges, the wrap)
    must propagate identically: a carry row/time-level misindex would
    surface as an O(impulse) difference, not fma noise."""
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    walls = geometry.empty(cfg.nx, cfg.ny)
    f0 = initial_state(cfg)
    f0[1, row, 17] += 0.05
    a = fk.run_steps(jnp.asarray(f0.copy()), jnp.asarray(walls), cfg, 12,
                     interpret=True, temporal=3, skew=False)
    b = fk.run_steps(jnp.asarray(f0.copy()), jnp.asarray(walls), cfg, 12,
                     interpret=True, temporal=3, skew=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-6)


# ---- flat (multipass) kernel: P whole passes in one launch ----

def _flat_pair(cfg, temporal, P, slots=4):
    """(classic, flat): P free passes chained launch-per-pass vs one
    flat launch, same refresh cadence, from a rough positive state."""
    nx, ny = cfg.nx, cfg.ny
    walls = geometry.empty(nx, ny)
    nyp, lpad = fk.pick_layout(ny, temporal)
    br = 32
    rng = np.random.default_rng(7)
    f = np.asarray(initial_state(cfg))
    f = (f * (1.0 + 0.05 * rng.random(f.shape))).astype(cfg.dtype)
    f_p, walls_p = fk.pad_state(
        jnp.asarray(f), jnp.asarray(walls), cfg, nyp, lpad
    )
    # stack BEFORE the classic loop: its second iteration donates f_p's
    # buffer (as the ping-pong donor), invalidating it for later reads
    f2 = jnp.stack([f_p, f_p])
    step = fk.make_step(cfg, nx, nyp, br, True, temporal, lpad=lpad,
                        wall_mode=False, wall_spec=(), slots=slots)
    K = fk.refresh_interval(lpad, nyp - lpad - ny, ny, temporal)
    a, b = f_p, jnp.zeros_like(f_p)
    for p in range(P):
        a, b = step(a, b, walls_p, jnp.asarray([int(p % K == 0)], jnp.int32)), a
    flat = fk.make_flat_step(cfg, nx, nyp, br, True, temporal, lpad, P,
                             slots=slots)
    out2 = flat(f2, jnp.asarray([0], jnp.int32))
    return np.asarray(a), np.asarray(out2[0])


def test_flat_matches_classic_free():
    """One flat launch == P chained per-pass launches. The carry path
    stores in the storage dtype (exactly an HBM round trip), so the
    arithmetic DAG is identical; the residual tolerance is XLA:CPU
    fma-contraction noise between two differently-compiled programs
    (measured 2.6e-8 over 8 steps)."""
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    classic, flat = _flat_pair(cfg, temporal=2, P=4)
    np.testing.assert_allclose(classic, flat, rtol=0, atol=5e-7)


def test_flat_refresh_and_carry_interaction():
    """A tight-pad lattice (K=4) run long enough that refresh passes
    land on carry-consuming pass starts: the carry remirror fix must
    match the staged-block remirror bitwise."""
    cfg = LatticeConfig(nx=128, ny=10, dtype=np.float32)
    K = fk.refresh_interval(59, 128 - 59 - 10, 10, 2)
    assert K == 4  # the test's premise: refreshes inside the chunk
    classic, flat = _flat_pair(cfg, temporal=2, P=12)
    np.testing.assert_allclose(classic, flat, rtol=0, atol=5e-7)


def test_flat_matches_golden():
    """Physics: P*T flat steps against the float64 oracle."""
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    walls = geometry.empty(cfg.nx, cfg.ny)
    nyp, lpad = fk.pick_layout(cfg.ny, 2)
    f_p, _ = fk.pad_state(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, nyp, lpad
    )
    flat = fk.make_flat_step(cfg, cfg.nx, nyp, 32, True, 2, lpad, 4, slots=4)
    out2 = flat(jnp.stack([f_p, f_p]), jnp.asarray([0], jnp.int32))
    out = np.asarray(fk.unpad_state(out2[0], cfg, lpad))
    ref = _run_golden64(cfg, walls, 8)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-7)


def test_flat_guards():
    cfg = LatticeConfig(nx=128, ny=40, dtype=np.float32)
    nyp, lpad = fk.pick_layout(cfg.ny, 2)
    with pytest.raises(ValueError, match="even"):
        fk.make_flat_step(cfg, 128, nyp, 32, True, 2, lpad, 3, slots=4)
    with pytest.raises(ValueError, match="n_blocks"):
        fk.make_flat_step(cfg, 128, nyp, 32, True, 2, lpad, 4, slots=6)


def test_flat_bf16_storage():
    """bf16 storage through the flat kernel: the carry and staging all
    round-trip through bf16 exactly like the per-pass HBM path."""
    import jax.numpy as jnp2

    cfg = LatticeConfig(nx=128, ny=40, dtype=jnp2.bfloat16)
    classic, flat = _flat_pair(cfg, temporal=2, P=4)
    np.testing.assert_allclose(
        classic.astype(np.float32), flat.astype(np.float32),
        rtol=0, atol=2e-3,
    )


def test_slim_halo_staging_bitwise_equals_full():
    """Slim halo-role staging: the first/last issues of every launch
    stage only the sublane-tile sliver the window assembly can read
    (T <= 8 rows), and the sharded edge launches' fully-ppermute-patched
    issues skip their DMA outright. The elided rows were never read, so
    results must be BITWISE equal to full staging ('noslim' ablate) for
    every launch shape: affine/wrapping/full-grid local segments and
    top/bottom/both-ends sharded launches."""
    import functools

    cfg = LatticeConfig(nx=64, ny=48, dtype=np.float32)
    walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
    T = 3
    nyp, lpad = fk.pick_layout(cfg.ny, T)
    br = 16
    nb = cfg.nx // br
    f_p, walls_p = fk.pad_state(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, nyp, lpad
    )
    rfl = fk._flag(True)
    noslim = frozenset({"noslim"})

    for start, length in ((1, 2), (nb - 1, 2), (0, nb)):
        mk = functools.partial(
            fk.make_step, cfg, cfg.nx, nyp, br, True, T,
            start=start, length=length, lpad=lpad,
        )
        a = mk()(f_p, jnp.zeros_like(f_p), walls_p, rfl)
        b = mk(ablate=noslim)(f_p, jnp.zeros_like(f_p), walls_p, rfl)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sharded (external-halo) launches; distinct halo values so a
    # mis-staged row cannot alias the local wrap
    htop = f_p[:, -T:, :] * np.float32(1.5)
    hbot = f_p[:, :T, :] * np.float32(0.5)
    wht, whb = walls_p[-T:, :], walls_p[:T, :]
    for start, length, extra in (
        (0, 1, (htop, wht)),
        (nb - 1, 1, (hbot, whb)),
        (0, nb, (htop, hbot, wht, whb)),
    ):
        mk = functools.partial(
            fk.make_step, cfg, cfg.nx, nyp, br, True, T,
            external_halo=True, start=start, length=length, lpad=lpad,
        )
        a = mk()(f_p, jnp.zeros_like(f_p), walls_p, *extra, rfl)
        b = mk(ablate=noslim)(f_p, jnp.zeros_like(f_p), walls_p, *extra, rfl)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
