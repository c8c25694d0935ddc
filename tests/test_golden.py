"""Physics sanity tests for the golden NumPy oracle itself — the
formalization of the reference's implicit correctness mechanisms
(SURVEY.md section 4): f >= 0, mass conservation, wall behavior,
equilibrium fixed point, and streaming direction."""

import numpy as np
import pytest

from latticeboltzmann_tpu import LatticeConfig, geometry
from latticeboltzmann_tpu.core.spec import E, NSPEEDS, OPPOSITE, W
from latticeboltzmann_tpu.models import golden


def test_weights_sum_to_one():
    assert np.isclose(W.sum(), 1.0, rtol=0, atol=1e-15)


def test_opposite_table_is_involution():
    assert (OPPOSITE[OPPOSITE] == np.arange(NSPEEDS)).all()
    # opposite speeds point exactly backwards
    assert (E[OPPOSITE] == -E).all()


def test_equilibrium_is_fixed_point_without_forcing():
    """A rest-equilibrium fluid with no walls and no forcing must be a
    fixed point of stream+collide (feq(rho, u=0) = rho*w)."""
    cfg = LatticeConfig(nx=8, ny=16, dtype=np.float64, accel=0.0)
    walls = geometry.empty(cfg.nx, cfg.ny)
    f = golden.initial_state(cfg)
    f2 = golden.stream_collide(f, walls, cfg)
    np.testing.assert_allclose(f2, f, rtol=0, atol=1e-15)


def test_streaming_direction():
    """A pulse on speed s at site (i,j) must arrive at (i+e_x, j+e_y)."""
    cfg = LatticeConfig(nx=6, ny=7, dtype=np.float64)
    for s in range(1, NSPEEDS):
        f = np.zeros((NSPEEDS, cfg.nx, cfg.ny))
        f[s, 2, 3] = 1.0
        pulled = golden.pull(f)
        ex, ey = int(E[s, 0]), int(E[s, 1])
        assert pulled[s, 2 + ex, 3 + ey] == 1.0
        assert pulled[s].sum() == 1.0


def test_streaming_periodic_wrap():
    cfg = LatticeConfig(nx=4, ny=5, dtype=np.float64)
    f = np.zeros((NSPEEDS, cfg.nx, cfg.ny))
    f[2, cfg.nx - 1, 0] = 1.0  # +x speed at last row wraps to row 0
    pulled = golden.pull(f)
    assert pulled[2, 0, 0] == 1.0


def test_mass_conserved_without_forcing(small_cfg, small_walls):
    cfg = LatticeConfig(nx=small_cfg.nx, ny=small_cfg.ny, dtype=np.float64, accel=0.0)
    f = golden.initial_state(cfg)
    total0 = f.sum()
    f = golden.run(f, small_walls, cfg, 20)
    assert np.isclose(f.sum(), total0, rtol=1e-13)


def test_forcing_conserves_mass(small_cfg, small_walls):
    f = golden.initial_state(small_cfg)
    total0 = f.sum()
    f2 = golden.apply_source(f, small_walls, small_cfg)
    assert np.isclose(f2.sum(), total0, rtol=1e-13)
    # forcing added +y momentum on column 0
    assert (f2[1, :, 0] >= f[1, :, 0]).all()


def test_f_stays_positive(small_cfg, small_walls):
    f = golden.initial_state(small_cfg)
    f = golden.run(f, small_walls, small_cfg, 50)
    assert (f >= 0).all()
    assert np.isfinite(f).all()


def test_wall_f0_passthrough(small_cfg, small_walls):
    """Wall-site f0 keeps its initial value forever — matching the C
    code's fA buffer at even steps (src/latticeboltzmann.c:246-255
    never writes f0 on walls)."""
    f = golden.initial_state(small_cfg)
    init_f0 = f[0].copy()
    f = golden.run(f, small_walls, small_cfg, 10)
    np.testing.assert_array_equal(f[0][small_walls], init_f0[small_walls])


def test_bounce_back_reverses_at_wall():
    """A packet streamed into an isolated wall site comes back out along
    the opposite link two steps later. tau -> huge makes collision a
    no-op so pure streaming + bounce-back is observable."""
    cfg = LatticeConfig(nx=9, ny=9, dtype=np.float64, accel=0.0, tau=1e12)
    walls = geometry.empty(cfg.nx, cfg.ny)
    walls[4, 4] = True
    f = golden.initial_state(cfg)
    # an f2 (+x) packet just below the wall: at (3,4) moving +x
    f[2, 3, 4] += 1.0
    f1 = golden.stream_collide(f, walls, cfg)
    # after step 1 the packet sits on the wall, stored reversed as f4
    assert f1[4, 4, 4] > 1.0
    f2_ = golden.stream_collide(f1, walls, cfg)
    # after step 2 it has streamed back to (3,4) moving -x
    assert f2_[4, 3, 4] > 1.0


def test_flow_develops_and_reynolds_positive():
    cfg = LatticeConfig(nx=32, ny=64, dtype=np.float64)
    walls = geometry.channel(cfg.nx, cfg.ny)
    f = golden.initial_state(cfg)
    f = golden.run(f, walls, cfg, 200)
    re = golden.reynolds(f, walls, cfg)
    assert re > 0  # forcing drives +y flow
    rho, ux, uy = golden.macroscopic(f)
    # mean flow is along +y in the channel interior
    assert uy[1:-1].mean() > 0


def test_reynolds_regression():
    """Pinned physics regression: the golden model's Reynolds number on a
    fixed small scene. Guards any numerics change in the oracle itself."""
    cfg = LatticeConfig(nx=24, ny=40, dtype=np.float64)
    walls = geometry.channel(cfg.nx, cfg.ny)
    walls[8:14, 10:13] = True
    f = golden.initial_state(cfg)
    f = golden.run(f, walls, cfg, 100)
    re = golden.reynolds(f, walls, cfg)
    # value computed once from this exact configuration (float64)
    ref = 3.5871413867169735  # pinned 2026-08-16, golden@float64
    assert abs(re - ref) < 1e-12


def test_savelattice_field_shape(small_cfg, small_walls):
    f = golden.initial_state(small_cfg)
    rho, ux, uy = golden.macroscopic(f)
    assert rho.shape == (small_cfg.nx, small_cfg.ny)
    np.testing.assert_allclose(rho, small_cfg.initial_density, rtol=1e-14)
    np.testing.assert_allclose(ux, 0.0, atol=1e-16)
