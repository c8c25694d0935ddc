"""Fused Pallas double-single (f32-pair) kernel — backend 'pallas-ds64'.

The perf half of the DP story: ops/ds_engine.py defines the pair
arithmetic and the XLA time loop (~540 MLUPS on v5e, already 4x the
emulated-f64 'xla' backend); this kernel runs the same compensated
arithmetic inside a Pallas grid so the whole step stays in VMEM and the
VPU runs the ~2.5k-flop/site pair DAG at its native f32 rate. Targets
the reference's double-precision columns (src/prec_double_avx.h,
README.md:66-90: best DP rows 1,166-1,206 MLUPS on R9 280X / the
26-node MPI cluster).

Design notes (vs the f32 kernel, ops/fused_kernel.py):

- ds collision is ~10-20x the f32 flops, so the pass is COMPUTE-heavy:
  a simple schedule — grid over row blocks, halos via neighbor
  sub-blocks, Pallas's automatic grid pipelining — plus trapezoidal
  temporal blocking (DS_TEMPORAL steps fused per pass). The ablation
  that sized this: at T=1 the collision was 453 us/step and everything
  else (DMA + full-window forcing + rolls/selects) 441 us/step; block
  forcing + T=4 took 800x4000 from ~920 to 2,256 MLUPS.
- the mirror-pad lane layout IS reused (pick_layout/pad_state): real
  columns at lanes [lpad, lpad+ny), pads carrying the periodic
  continuation, so in-kernel y pulls are pure lane rolls. One pass
  consumes T pad lanes per side; pads are re-mirrored every
  `refresh_interval` passes by a cheap XLA lane-concat between
  pallas_calls, inside the same jit(scan).
- x halos: each grid step reads its row block plus the 8-row tail of
  the previous block and 8-row head of the next ((i +/- 1) mod
  n_blocks index maps — the periodic x wrap). Only T of each 8 halo
  rows are used; the over-fetch is ~(16/br) extra DMA, irrelevant
  under the compute ceiling.
- arithmetic is SHARED with the XLA ds engine: ds_engine.collide_planes
  (exact=True, bitwise the xla-ds64 math) or collide_planes_fast (the
  default tier) run unchanged on VMEM window tiles. Constants are
  literal pairs under Mosaic (no constant cancellation there — probed;
  and optimization_barrier has no Mosaic lowering) and barriered pairs
  in interpret mode (XLA's sub(add(x,c),c)->x rewrite — see
  df64.const/const_literal).
- forcing (ApplySource, src/latticeboltzmann.c:489-518) runs in-kernel
  before each sub-step's pull, at pair precision, with the
  all-or-nothing f>0 guard, restricted to the static 128-lane
  sub-blocks containing the forced column and its pad-mirror images
  (full-window ds forcing measured ~200 flops/site — a fifth of the
  whole step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.spec import E, NSPEEDS, OPPOSITE, LatticeConfig
from . import df64
from .df64 import DS
from .ds_engine import _consts, _consts_fast, collide_planes, collide_planes_fast
from .fused_kernel import (
    VMEM_BUDGET,
    pad_state,
    pick_layout,
    refresh_interval,
    unpad_state,
)

HALO_ROWS = 8  # x-halo fetch granularity (f32 sublane tile)


def _vmem_need_ds(br: int, nyp: int, temporal: int = 1,
                  ext_halo: bool = False) -> int:
    """Per-grid-step VMEM for the ds pass: hi+lo current blocks in and
    out, the neighbor halo blocks per pair component (8-row sub-blocks
    in the local wrap form; FULL br-row blocks in the sharded ext-halo
    form, whose affine specs tile the extended array in whole blocks),
    the walls blocks — all double-buffered by the pipeline — plus a
    generous allowance for the collision DAG's live (br+2T, nyp) f32
    temporaries (~24 pairs live at the widest point of collide_planes,
    by inspection)."""
    hrows = br if ext_halo else HALO_ROWS
    io = 2 * 9 * br * nyp * 4 * 2  # hi+lo, in+out
    halo = 2 * 2 * 9 * hrows * nyp * 4
    walls = (br + 2 * hrows) * nyp * 4
    temps = 48 * (br + 2 * temporal) * nyp * 4
    return 2 * (io + halo + walls) + temps


# temporal-blocking depth: HBM traffic per timestep divides by T, the
# per-pass roll/select/launch overheads amortize over T steps, at the
# cost of T(T+1)/br recompute rows. Measured on v5e, 800x4000 fast tier
# (MLUPS): T=1 ~920, T=2 1,890, T=3 2,088, T=4 2,256; T=5 compiles
# pathologically through the remote-compile tunnel (>9 min, timed out
# twice) — revisit on a locally-attached chip before raising this.
DS_TEMPORAL = 4


def pick_ds_block_rows(nx: int, nyp: int, temporal: int = DS_TEMPORAL,
                       ext_halo: bool = False) -> int:
    """Largest 8-aligned row block dividing NX that fits the budget.
    Blocks amortize per-block control and the T(T+1) recompute rows,
    so the first (largest) fit is taken."""
    for br in (64, 48, 40, 32, 24, 16, 8):
        if nx % br == 0 and _vmem_need_ds(br, nyp, temporal, ext_halo) <= VMEM_BUDGET:
            return br
    return 0


def _force_blocks(nyp: int, lpad: int, ny: int) -> tuple[list[int], list[int]]:
    """The 128-lane-aligned block starts covering the forced column j=0
    and its pad-mirror images (lanes where (lane - lpad) mod ny == 0).
    Static, so the in-kernel forcing touches only these sub-blocks —
    the f32 kernel's trick (ops/fused_kernel.py `forced`); full-window
    ds forcing measured ~200 flops/site, a fifth of the whole step."""
    lanes = [j for j in range(nyp) if (j - lpad) % ny == 0]
    return sorted({(j // 128) * 128 for j in lanes}), lanes


def _make_ds_pass(cfg: LatticeConfig, nx: int, nyp: int, lpad: int,
                  br: int, temporal: int, interpret: bool, exact: bool,
                  ext_halo: bool = False):
    """One kernel pass = `temporal` fused timesteps over the padded pair
    state: (hi, lo, walls_p) -> (hi', lo'), grid over NX/br row blocks.
    Each grid step assembles a (br + 2T)-row window and advances it T
    times, trimming one row per side per sub-step (trapezoidal temporal
    blocking — HBM traffic per timestep divides by T; the overlap rows
    recomputed by neighbors are T(T+1)/br of the block). exact=True runs
    ds_engine.collide_planes (bitwise the xla-ds64 arithmetic); the
    default runs collide_planes_fast (~2.4x fewer flops, ~2^-44 per-op
    tier — see its docstring). Sub-step arithmetic is per-site identical
    across T, so results are bitwise independent of T."""
    ny = cfg.ny
    T = temporal
    if not (1 <= T <= HALO_ROWS):
        raise ValueError(f"temporal={T} must be in [1, {HALO_ROWS}]")
    n_blocks = nx // br
    hb = br // HALO_ROWS  # halo sub-blocks per row block
    R = br + 2 * T  # extended window rows
    fblocks, flanes = _force_blocks(nyp, lpad, ny)

    def kernel(hc, hp, hn, lc, lp, ln, wc, wp, wn, oh, ol):
        # constants built IN the kernel body: the interpret path's
        # barriered pairs are traced values (Pallas forbids capturing
        # those from the enclosing trace), the compiled path's literals
        # are free either way
        mk = _consts if exact else _consts_fast
        C = mk(cfg, literal=not interpret)
        # extended (br+2T)-row window per plane: prev tail rows, block,
        # next head rows (pure VMEM concats of already-resident blocks)
        def ext(c, p, n, s):
            return jnp.concatenate([p[s, -T:, :], c[s], n[s, :T, :]], axis=0)

        planes = [
            DS(ext(hc, hp, hn, s), ext(lc, lp, ln, s)) for s in range(NSPEEDS)
        ]
        wall_ext = (
            jnp.concatenate([wp[-T:, :], wc[...], wn[:T, :]], axis=0)
            > np.float32(0.5)
        )

        def forced(planes, wall):
            """ApplySource (src/latticeboltzmann.c:489-518) at pair
            precision on the static 128-lane sub-blocks containing the
            forced column and its pad mirrors; all-or-nothing guard."""
            r = planes[0].hi.shape[0]
            oks = {}
            for b in fblocks:
                lane = b + jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
                on = None
                for j in flanes:
                    if b <= j < b + 128:
                        on = (lane == j) if on is None else on | (lane == j)

                def sub(s):
                    return DS(planes[s].hi[:, b : b + 128],
                              planes[s].lo[:, b : b + 128])

                oks[b] = (
                    on
                    & jnp.logical_not(wall[:, b : b + 128])
                    & df64.gt_zero(df64.sub(sub(6), C["a58"]))
                    & df64.gt_zero(df64.sub(sub(3), C["a14"]))
                    & df64.gt_zero(df64.sub(sub(7), C["a58"]))
                )
            out = list(planes)
            for s, delta in ((6, df64.neg(C["a58"])), (3, df64.neg(C["a14"])),
                             (7, df64.neg(C["a58"])), (5, C["a58"]),
                             (1, C["a14"]), (8, C["a58"])):
                hsegs, lsegs, pos = [], [], 0
                for b in fblocks:
                    if b > pos:
                        hsegs.append(planes[s].hi[:, pos:b])
                        lsegs.append(planes[s].lo[:, pos:b])
                    blk = DS(planes[s].hi[:, b : b + 128],
                             planes[s].lo[:, b : b + 128])
                    upd = df64.where(oks[b], df64.add(blk, delta), blk)
                    hsegs.append(upd.hi)
                    lsegs.append(upd.lo)
                    pos = b + 128
                if pos < nyp:
                    hsegs.append(planes[s].hi[:, pos:])
                    lsegs.append(planes[s].lo[:, pos:])
                out[s] = DS(jnp.concatenate(hsegs, axis=1),
                            jnp.concatenate(lsegs, axis=1))
            return out

        def pull_collide(planes, wall):
            """One fused step on an r-row window -> the r-2 interior
            rows (pull per src/latticeboltzmann.c:230-243, BGK
            collision, masked bounce-back)."""
            r = planes[0].hi.shape[0]
            pulled = []
            for s in range(NSPEEDS):
                ex, ey = int(E[s, 0]), int(E[s, 1])
                phi = planes[s].hi[1 - ex : r - 1 - ex]
                plo = planes[s].lo[1 - ex : r - 1 - ex]
                if ey:
                    shift = ey % nyp
                    phi = pltpu.roll(phi, shift, axis=1)
                    plo = pltpu.roll(plo, shift, axis=1)
                pulled.append(DS(phi, plo))
            relaxed = (collide_planes if exact else collide_planes_fast)(
                pulled, C
            )
            out = []
            for s in range(NSPEEDS):
                out.append(
                    df64.where(wall, pulled[int(OPPOSITE[s])], relaxed[s])
                )
            return out

        for t in range(T):
            # window rows [t, R-t) hold physical rows [r0-T+t, r0+br+T-t)
            planes = forced(planes, wall_ext[t : R - t])
            planes = pull_collide(planes, wall_ext[t + 1 : R - t - 1])

        for s in range(NSPEEDS):
            oh[s] = planes[s].hi
            ol[s] = planes[s].lo

    if ext_halo:
        # sharded form: inputs are (9, nx + 2*br, nyp) extended arrays
        # (local rows at row-offset br; the T neighbor halo rows sit at
        # [br-T, br) and [br+nx, br+nx+T), the rest of the end blocks is
        # padding) — NO index wrap; the x periodicity lives in the
        # device ring outside
        cur = pl.BlockSpec((NSPEEDS, br, nyp), lambda i: (0, i + 1, 0))
        prev = pl.BlockSpec((NSPEEDS, br, nyp), lambda i: (0, i, 0))
        nxt = pl.BlockSpec((NSPEEDS, br, nyp), lambda i: (0, i + 2, 0))
        wcur = pl.BlockSpec((br, nyp), lambda i: (i + 1, 0))
        wprev = pl.BlockSpec((br, nyp), lambda i: (i, 0))
        wnxt = pl.BlockSpec((br, nyp), lambda i: (i + 2, 0))
        in_rows = nx + 2 * br
    else:
        cur = pl.BlockSpec((NSPEEDS, br, nyp), lambda i: (0, i, 0))
        prev = pl.BlockSpec(
            (NSPEEDS, HALO_ROWS, nyp),
            lambda i: (0, ((i - 1) % n_blocks) * hb + hb - 1, 0),
        )
        nxt = pl.BlockSpec(
            (NSPEEDS, HALO_ROWS, nyp), lambda i: (0, ((i + 1) % n_blocks) * hb, 0)
        )
        wcur = pl.BlockSpec((br, nyp), lambda i: (i, 0))
        wprev = pl.BlockSpec(
            (HALO_ROWS, nyp), lambda i: (((i - 1) % n_blocks) * hb + hb - 1, 0)
        )
        wnxt = pl.BlockSpec((HALO_ROWS, nyp), lambda i: (((i + 1) % n_blocks) * hb, 0))
        in_rows = nx
    out = pl.BlockSpec((NSPEEDS, br, nyp), lambda i: (0, i, 0))

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[cur, prev, nxt, cur, prev, nxt, wcur, wprev, wnxt],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((NSPEEDS, nx, nyp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    del in_rows  # shape is implied by the operands

    def one_pass(hi, lo, walls_p):
        oh, ol = call(hi, hi, hi, lo, lo, lo, walls_p, walls_p, walls_p)
        return oh, ol

    return one_pass


def _remirror(x: jax.Array, ny: int, lpad: int, nyp: int) -> jax.Array:
    """Restore the mirror invariant on the pad lanes (XLA level, between
    pallas_calls): left pad = image of the last lpad real columns (their
    copies live at real lanes [ny, ny+lpad)), right pad = image of the
    first rpad real columns (real lanes [lpad, lpad+rpad))."""
    rpad = nyp - lpad - ny
    return jnp.concatenate(
        [x[..., ny : ny + lpad], x[..., lpad : lpad + ny], x[..., lpad : lpad + rpad]],
        axis=-1,
    )


_RUNNERS: dict = {}


def _get_runner(cfg: LatticeConfig, nx: int, nyp: int, interpret: bool,
                exact: bool, T: int, tail: int):
    """One jitted runner per (config, temporal, tail-steps) class, with
    DYNAMIC chunk/pass counts — every step count whose n_steps % T
    matches reuses the same compiled program (a remote-compile through
    the tunnel costs minutes; the benchmark methodology alone uses four
    different step counts per scene)."""
    key = (cfg, nx, nyp, interpret, exact, T, tail)
    if key in _RUNNERS:
        return _RUNNERS[key]
    ny = cfg.ny
    lpad = (nyp - ny) // 2
    br = pick_ds_block_rows(nx, nyp, T)
    if br == 0:
        raise ValueError(f"no 8-aligned row block divides nx={nx} within VMEM")
    one_pass = _make_ds_pass(cfg, nx, nyp, lpad, br, T, interpret, exact)
    tail_pass = (
        _make_ds_pass(cfg, nx, nyp, lpad, br, tail, interpret, exact)
        if tail else None
    )
    # passes between pad re-mirrors (each pass consumes T lanes/side)
    K = refresh_interval(lpad, nyp - lpad - ny, ny, T)

    @partial(jax.jit, donate_argnums=(0, 1))
    def runner(hi, lo, walls_p, n_chunks, rem_passes):
        def remirror2(c):
            return (_remirror(c[0], ny, lpad, nyp),
                    _remirror(c[1], ny, lpad, nyp))

        def pass_body(_, c):
            return one_pass(c[0], c[1], walls_p)

        def chunk_body(_, c):
            return jax.lax.fori_loop(0, K, pass_body, remirror2(c))

        c = jax.lax.fori_loop(0, n_chunks, chunk_body, (hi, lo))
        c = jax.lax.fori_loop(0, rem_passes, pass_body, remirror2(c))
        if tail_pass is not None:
            c = remirror2(c)
            c = tail_pass(c[0], c[1], walls_p)
        return c

    _RUNNERS[key] = (runner, K)
    return _RUNNERS[key]


def run_steps(f: DS, walls, cfg: LatticeConfig, n_steps: int,
              interpret: bool = False, exact: bool = False,
              temporal: int = DS_TEMPORAL) -> DS:
    """n_steps of the fused ds kernel under one jit — pads the pair
    state into the mirror lane layout, runs the pass/refresh schedule,
    unpads. The same one-rounding backend contract as the XLA ds engine
    (df64.check_backend) is enforced for interpret mode, which executes
    through XLA; compiled Mosaic semantics are probed by the tpu-marked
    smoke suite. exact=True selects the full-precision collision
    (bitwise the xla-ds64 arithmetic); the default is the fast tier.
    Results are bitwise independent of `temporal` (same per-site
    arithmetic, different fusion)."""
    if interpret:
        df64.check_backend(raise_on_fail=True)
    T = max(1, min(temporal, n_steps))
    nyp, lpad = pick_layout(cfg.ny, T)
    hi_p, walls_p = pad_state(f.hi, walls, cfg, nyp, lpad)
    lo_p, _ = pad_state(f.lo, walls, cfg, nyp, lpad)
    n_passes, tail = divmod(n_steps, T)
    runner, K = _get_runner(cfg, f.hi.shape[1], nyp, interpret, exact, T, tail)
    n_chunks, rem = divmod(n_passes, K)
    hi, lo = runner(hi_p, lo_p, walls_p, jnp.int32(n_chunks), jnp.int32(rem))
    return DS(unpad_state(hi, cfg, lpad), unpad_state(lo, cfg, lpad))


# --- sharded (multi-chip) form ------------------------------------------------


_SHARDED_RUNNERS: dict = {}


def _get_sharded_runner(mesh, cfg: LatticeConfig, interpret: bool,
                        exact: bool, T: int, tail: int):
    """Row-decomposed multi-chip ds runner: shard_map over a 1-D mesh,
    ppermute halo exchange of T pair-rows per pass, the ext_halo form
    of the ds kernel per device. The pair-DP answer to the reference's
    DP MPI column (mpi-runtimes.dat DP rows; README.md:88).

    Per pass each device sends its first/last T rows of BOTH pair
    components to its ring neighbors (4 ppermutes of (9, T, nyp) f32 =
    ~0.5-1 MB/direction at reference widths — trivial on ICI against a
    ~ms compute pass) and embeds them in a zero-padded (9, L+2br, nyp)
    extended array consumed by the kernel's affine prev/cur/next block
    specs. Halo rows arrive with the sender's pad-decay state, which
    equals the receiver's (same program, same refresh cadence) — the
    same invariant the f32 sharded path relies on (docs/SCALING.md)."""
    from jax.sharding import PartitionSpec as P

    key = (mesh, cfg, interpret, exact, T, tail)
    if key in _SHARDED_RUNNERS:
        return _SHARDED_RUNNERS[key]
    AXIS = "x"
    n_dev = mesh.devices.size
    if cfg.nx % n_dev:
        raise ValueError(f"NX={cfg.nx} not divisible by {n_dev} devices")
    L = cfg.nx // n_dev
    ny = cfg.ny
    nyp, lpad = pick_layout(ny, T)
    br = pick_ds_block_rows(L, nyp, T, ext_halo=True)
    if br == 0:
        raise ValueError(f"no 8-aligned row block divides local rows {L}")
    one_pass = _make_ds_pass(cfg, L, nyp, lpad, br, T, interpret, exact,
                             ext_halo=True)
    tail_pass = (
        _make_ds_pass(cfg, L, nyp, lpad, br, tail, interpret, exact,
                      ext_halo=True)
        if tail else None
    )
    K = refresh_interval(lpad, nyp - lpad - ny, ny, T)

    def loop(hi_l, lo_l, walls_l, n_chunks, rem_passes):
        n = jax.lax.axis_size(AXIS)
        down = [(i, (i + 1) % n) for i in range(n)]
        up = [(i, (i - 1) % n) for i in range(n)]
        # static walls: extend once per run (full br halo blocks so the
        # kernel's affine specs see real wall values on the halo rows)
        wtop = jax.lax.ppermute(walls_l[L - br :], AXIS, down)
        wbot = jax.lax.ppermute(walls_l[:br], AXIS, up)
        walls_ext = jnp.concatenate([wtop, walls_l, wbot], axis=0)
        zpad = jnp.zeros((NSPEEDS, br - T, nyp), jnp.float32)

        def extend(x):
            htop = jax.lax.ppermute(x[:, L - T :, :], AXIS, down)
            hbot = jax.lax.ppermute(x[:, :T, :], AXIS, up)
            return jnp.concatenate([zpad, htop, x, hbot, zpad], axis=1)

        def pass_fn(fn):
            def run(_, c):
                return fn(extend(c[0]), extend(c[1]), walls_ext)
            return run

        def remirror2(c):
            return (_remirror(c[0], ny, lpad, nyp),
                    _remirror(c[1], ny, lpad, nyp))

        def chunk_body(_, c):
            return jax.lax.fori_loop(0, K, pass_fn(one_pass), remirror2(c))

        c = jax.lax.fori_loop(0, n_chunks, chunk_body, (hi_l, lo_l))
        c = jax.lax.fori_loop(0, rem_passes, pass_fn(one_pass), remirror2(c))
        if tail_pass is not None:
            c = remirror2(c)
            c = pass_fn(tail_pass)(0, c)
        return c

    fspec = P(None, AXIS, None)
    sharded_loop = jax.shard_map(
        loop, mesh=mesh,
        in_specs=(fspec, fspec, P(AXIS, None), P(), P()),
        out_specs=(fspec, fspec),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def runner(hi, lo, walls_p, n_chunks, rem_passes):
        return sharded_loop(hi, lo, walls_p, n_chunks, rem_passes)

    _SHARDED_RUNNERS[key] = (runner, K, mesh)
    return _SHARDED_RUNNERS[key]


def sharded_run_steps(f: DS, walls, cfg: LatticeConfig, n_steps: int,
                      mesh=None, interpret: bool = False,
                      exact: bool = False,
                      temporal: int = DS_TEMPORAL) -> DS:
    """Multi-chip n_steps: pad into the mirror lane layout, shard rows
    over the mesh, run the ppermute/ext-halo pass schedule, unpad."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharded import make_mesh

    if interpret:
        df64.check_backend(raise_on_fail=True)
    if mesh is None:
        mesh = make_mesh()
    T = max(1, min(temporal, n_steps))
    nyp, lpad = pick_layout(cfg.ny, T)
    hi_p, walls_p = pad_state(f.hi, walls, cfg, nyp, lpad)
    lo_p, _ = pad_state(f.lo, walls, cfg, nyp, lpad)
    hi_p = jax.device_put(hi_p, NamedSharding(mesh, P(None, "x", None)))
    lo_p = jax.device_put(lo_p, NamedSharding(mesh, P(None, "x", None)))
    walls_p = jax.device_put(walls_p, NamedSharding(mesh, P("x", None)))
    n_passes, tail = divmod(n_steps, T)
    runner, K, _ = _get_sharded_runner(mesh, cfg, interpret, exact, T, tail)
    n_chunks, rem = divmod(n_passes, K)
    hi, lo = runner(hi_p, lo_p, walls_p, jnp.int32(n_chunks), jnp.int32(rem))
    return DS(unpad_state(hi, cfg, lpad), unpad_state(lo, cfg, lpad))
