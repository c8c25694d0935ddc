"""Fused Pallas collide-stream kernel — the performance path.

One kernel pass per timestep does everything the reference's
ApplySource + StreamCollide(+Vec) pair does (src/latticeboltzmann.c:
186-518): channel forcing, pull-scheme streaming with periodic wrap,
BGK collision, and masked bounce-back — reading each distribution plane
from HBM exactly once and writing it exactly once. This is the TPU
answer to the reference's fused single-pass AVX kernel: where the C
code tiles the y axis into VECWIDTH-wide SIMD registers with a padded
row stride (NYPADDED, src/latticeboltzmann.c:69-76), we tile rows onto
the 8x128 VPU with the y axis padded to the 128-lane boundary, and
where it splits rows across OpenMP threads, we run a sequential Pallas
grid over row blocks with manually double-buffered HBM->VMEM DMA so the
next block's loads overlap the current block's compute (the TPU version
of its software prefetch, src/latticeboltzmann.c:350-358).

Layout: f is (9, NX, NYP) float32/bfloat16 in the mirror-pad lane
layout (pick_layout): real columns at lanes [lpad, lpad+NY), pad lanes
holding the periodic continuation, so the y wrap is a pure in-VMEM lane
roll (pads are re-mirrored in-kernel every refresh_interval() passes).
The x wrap falls out of the rotating-slot staging: whole neighbor
row-blocks (with wrapped block indices) are resident, so stencil halos
are just their edge rows. Rows may additionally be stored rotated
(wall_partition) so that the solid-containing and solid-free block runs
are affine segments, each launched as its own kernel variant — the
wall-free variant skips the bounce-back selects entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.spec import E, NSPEEDS, OPPOSITE, REFLECT_X, REFLECT_Y, W, LatticeConfig

LANE = 128


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_need(
    br: int, slots: int, nyp: int, itemsize: int, temporal: int,
    walls_dma: bool = True, skew: bool = False,
) -> int:
    # staging slots + double-buffered output in the storage dtype, plus
    # ~2 live compute windows — ALWAYS float32 (bf16 storage computes in
    # f32, so the window term must not shrink with itemsize; a bf16
    # BR=32 at 16000 lanes compiled to 117MB scoped vmem and OOM'd when
    # this term was counted at 2 bytes). The walls slots exist only on
    # the mask-DMA path — parametric wall specs build the mask from
    # iotas instead.
    need = (slots * 9 * br + 2 * 9 * br) * nyp * itemsize
    need += 2 * 9 * (br + 2 * temporal) * nyp * max(itemsize, 4)
    if walls_dma:
        need += slots * br * nyp * 4
    if skew:
        # the wavefront launch's f32 bounce + carry scratch (always f32:
        # the compute precision, independent of the storage dtype; the
        # carry keeps each 2-row level in an 8-row aligned slot)
        need += 9 * (br + 8 * temporal) * nyp * 4
    return need


# Sized against the 112MB vmem_limit_bytes with pipeline slack. 97MB
# admits BR=80/slots=4 on 4096-lane spec-wall configs (96.7MB), the
# fastest measured block shape: fewer blocks amortize per-block control
# and shrink the temporal-window overlap from 15.6% to 6.25% of rows.
VMEM_BUDGET = 97 * 1024 * 1024


def pick_block_config(
    nx: int, nyp: int, itemsize: int = 4, temporal: int = 4,
    walls_dma: bool = True, skew: bool = False,
) -> tuple[int, int]:
    """(block_rows, staging_slots): the best block of (32, 40, 24, 16,
    8) dividing NX that fits the VMEM budget, with 6 staging slots when
    affordable (deeper DMA prefetch lead) else 4. BR=32/6 measured
    fastest on v5e at 4096 lanes (larger blocks measured slower — BR=80
    T=4: 14,957 vs BR=32: 17,096 MLUPS); wide lattices step down.
    Returns (0, 0) when nothing divides NX (caller falls back to XLA)."""
    for br in (32, 40, 24, 16, 8):
        if nx % br:
            continue
        for slots in (6, 4):
            if (
                _vmem_need(br, slots, nyp, itemsize, temporal, walls_dma, skew)
                <= VMEM_BUDGET
            ):
                return br, slots
    return 0, 0


def pick_block_rows(nx: int, nyp: int | None = None, itemsize: int = 4, temporal: int = 4) -> int:
    """Back-compat shim: block rows only."""
    return pick_block_config(nx, nyp if nyp is not None else LANE, itemsize, temporal)[0]


def pick_layout(ny: int, temporal: int) -> tuple[int, int]:
    """(nyp, lpad) for the mirror-padded lane layout.

    Real columns live at lanes [lpad, lpad+ny); the pad lanes on each
    side hold the periodic continuation of the lattice (the mirror
    invariant: P[j] = P[j+ny] for j < lpad, P[j] = P[j-ny] for
    j >= lpad+ny). The in-kernel y pulls are then pure lane rolls — the
    wrap at the true column count needs no per-step edge fix, which was
    ~12% of the kernel's VPU time (scripts/anatomy.py). The pad width is
    at least `temporal` lanes per side because one timestep invalidates
    one pad lane per side (the nyp-periodic roll feeds each outermost pad
    lane from the wrong edge); staged blocks are re-mirrored in-kernel
    every K passes (see _make_kernel's refresh)."""
    nyp = round_up(ny, LANE)
    if nyp - ny < 2 * temporal:
        nyp += LANE
    return nyp, (nyp - ny) // 2


def refresh_interval(lpad: int, rpad: int, ny: int, temporal: int) -> int:
    """Passes between pad re-mirrors. The decay front (1 lane per side
    per step, starting at the outermost pad lane) must not reach the
    innermost pad lanes real sites pull: (passes+1)*T <= valid depth.
    The refresh restores mirrors to depth min(lpad, rpad, ny) — beyond
    ny the single-roll sources are pad lanes, not real columns (only
    relevant for lattices narrower than their own padding)."""
    return max(1, min(lpad, rpad, ny) // temporal - 1)


RDMA_HR = 8  # rdma edge-slab rows (8-row DMA tile alignment)


def rdma_schedule(n_blocks: int, br: int, temporal: int, hr: int = RDMA_HR) -> dict:
    """The deterministic schedule of the in-kernel remote-DMA halo
    exchange (the rdma=True kernel variant) as plain Python constants.

    This is the single source of truth for WHEN the sends/waits happen
    and WHICH rows move where — consumed by both `_make_kernel`'s rdma
    path and the NumPy semantics harness
    (tests/test_rdma_semantics.py), which replays the schedule host-side
    and asserts the assembled stencil windows equal the ppermute path's
    for 2/4/8 devices. The schedule mirrors the reference's
    MPI_Isend / compute-interior / MPI_Waitall / compute-boundary
    overlap (README.md:45-51, img/comms-overlap.png):

    - grid step `send_step`: stage my edge slabs (`send_down_row0` /
      `send_up_row0`, `hr` rows each) into VMEM send buffers, barrier
      with both x-neighbors (Waitall-before-reuse of their comm
      buffers), then start the two remote copies — my LAST hr rows to
      the right neighbor's ct_ref, my FIRST hr rows to the left
      neighbor's cb_ref.
    - the body block computed at grid step i is
      (i + body_offset) mod n_blocks, so the two edge blocks (0 and
      n_blocks-1, the only consumers of the remote rows) land on the
      LAST two grid steps; the receives are awaited right before them
      (`wait_up_step` for cb_ref, consumed by block n_blocks-1 at that
      same step; `wait_down_step` for ct_ref, consumed by block 0).
    - block 0's top halo is ct_ref rows [top_halo_rows), i.e. the
      upper neighbor's last `temporal` rows; block n_blocks-1's bottom
      halo is cb_ref rows [bot_halo_rows), the lower neighbor's first
      `temporal` rows. Both are re-mirrored on arrival (raw stored
      rows carry decayed pad lanes), exactly like the ppermute path's
      _remirror (parallel/sharded.py).
    """
    return dict(
        hr=hr,
        send_step=0,
        body_offset=1,
        wait_up_step=max(n_blocks - 2, 0),
        wait_down_step=n_blocks - 1,
        send_down_row0=(n_blocks - 1) * br + br - hr,
        send_up_row0=0,
        top_halo_rows=(hr - temporal, hr),
        bot_halo_rows=(0, temporal),
    )


def _make_kernel(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    dtype,
    temporal: int = 1,
    external_halo: bool = False,
    slots: int = 6,
    wall_spec=None,
    has_slip: bool = False,
    ablate: frozenset = frozenset(),
    lpad: int = 0,
    start: int = 0,
    length: int | None = None,
    wall_mode: bool = True,
    row_shift: int = 0,
    fast_math: bool = False,
    rdma: bool = False,
    axis: str = "x",
    region=None,
    panels: int = 1,
    emit_carry: bool = False,
    skew: bool = False,
    multipass: int = 0,
):
    """Build the kernel body. All shape/physics parameters are baked in
    as Python constants (the jit-specialization equivalent of the
    reference's #define block, src/latticeboltzmann.c:36-56).

    multipass=P > 0 builds the FLAT (persistent) kernel: ONE launch
    advances P whole passes (P*T timesteps) over a grid of (P, nb)
    steps, eliminating the per-pass launch boundary — measured at
    ~36-48 us of DMA pipeline drain + refill per pass (docs/TUNING.md
    launch-boundary tax), which even the single-launch-per-pass floor
    pays once per pass. Both ping-pong buffers live in ONE stacked
    (2, 9, nx, nyp) array passed as the aliased in/out operand; pass p
    reads parity p%2 and writes parity (p+1)%2 via parity-indexed
    manual DMA. Outputs go through a double-buffered VMEM write-behind
    (the slot's previous DMA is awaited before reuse, which also
    transitively orders every cross-pass HBM read after the write it
    depends on — the read's issue begins >= nb-3 grid steps after the
    write's semaphore-verified completion, requiring nb >= SLOTS - 1).
    The one cross-pass hazard that cannot go through HBM — block 0 of
    pass p+1 needs block nb-1 of pass p, written one step earlier — is
    carried through persistent VMEM instead (the skew-carry pattern),
    stored in the storage dtype so results stay bitwise-identical to
    the staged path. P must be even (the chunk's final state returns to
    parity 0). Currently wall-free segments only (the production wall
    path keeps per-pass launches; see the pl.when static-tax note in
    docs/TUNING.md).

    emit_carry / skew implement wavefront time-skewing of the wall-free
    segments (docs/TUNING.md round-3+): the classic temporal window is a
    trapezoid — block b stages rows [b*br - T, b*br + br + T) and
    re-computes the shrinking overlap rows every pass (T^2 - T redundant
    row-steps per block, and the whole window grows with T, which is
    what made T=5 SLOWER than T=3 despite 40% less HBM traffic). The
    skew variant instead gives every block a FIXED (br + 2)-row
    parallelogram window sliding one row per step: the two rows below
    the window at each intermediate time level come from the previous
    grid step's block through persistent VMEM scratch (the Pallas TPU
    grid is sequential on a core, so block b-1's intermediate rows are
    already computed when block b runs) — zero redundant compute at ANY
    temporal depth. The first block of a run has no predecessor, so the
    runner launches it as a classic trapezoid with emit_carry=True: it
    additionally writes its window's top two rows at each time level
    t = 0..T-1 (pre-forcing, i.e. the values as of time t) to a small
    f32 carry output, which seeds the skew launch's carry scratch. This
    is the TPU form of skewed/wavefront tiling for stencils; the
    reference has no analog (its OpenMP rows are spatial-only).

    panels > 1 adds a SECOND (outer) grid dimension over lane panels of
    P = nyp/panels lanes each — the 2-D (x, y) block grid for lattices
    whose full-width row blocks exceed VMEM (docs/ROADMAP.md). Each
    block stages a P+256-lane window from the 128-aligned clipped
    offset s = clip(p*P - 128, 0, nyp - (P+256)); the window's 128-lane
    side halos supply the pull stencil's neighbor lanes, and only the
    panel's own P lanes are stored back (three pl.when-selected static
    slices, since the clip makes the panel sit at window offset 0 / 128
    / 256 for the first / middle / last panels). The periodic y wrap is
    still carried by the mirror pad lanes at the lattice edges, but the
    in-kernel pad re-mirror is impossible per panel (it needs the
    opposite lattice edge) — the runner re-mirrors between passes with
    two narrow XLA updates instead, and the refresh-flag input is
    ignored. Forcing switches to a dynamic-lane-offset form (the static
    lane-concat patch assumes panel-invariant lane identity).

    temporal=T fuses T timesteps into one HBM pass (temporal blocking):
    the block stages rows [r0-T, r0+br+T) and advances them T steps
    entirely in VMEM, shrinking the valid window by one row per side per
    step — HBM traffic per site-step drops by ~T. The math per site is
    identical to T applications of the single-step kernel, so results
    are bitwise equal to temporal=1.

    bfloat16 is the experimental mixed-precision mode (the successor of
    the reference's float/double header parameterization,
    src/prec_*.h): distributions are *stored* bf16 (halving HBM
    traffic) while all collision arithmetic runs in float32 in VMEM.

    external_halo=True builds the *sharded local* variant: instead of
    wrapping the x axis periodically, the kernel takes four extra
    inputs — T rows of f and walls from each x-neighbor device
    (delivered by ppermute, the reference's MPI boundary-row exchange,
    README.md:45) — and patches them into the resident edge slots.

    wall_spec (a geometry.infer_spec tuple) jit-specializes the kernel
    on a closed-form geometry: the wall mask is computed from iotas in
    VMEM and the walls plane is never DMA'd from HBM — removing ~5% of
    the pass traffic and the walls VMEM slots. This is the runtime
    equivalent of the reference baking its geometry into the binary at
    compile time (src/latticeboltzmann.c:567-578). In the external_halo
    (sharded) variant the kernel takes the shard's global row offset as
    an SMEM scalar and builds the mask in global-row coordinates, which
    also removes the wall-halo exchanges and patches.

    ablate is a perf-lab knob (scripts/anatomy.py): a set of kernel
    pieces {"pull", "collide", "walls", "force"} to skip, isolating each
    piece's cost on real hardware. Physics is wrong under any non-empty
    value; never set it outside measurement scripts.

    lpad is the mirror-pad layout offset (see pick_layout): real columns
    occupy lanes [lpad, lpad+ny) and the pad lanes hold the periodic
    continuation, so y pulls are pure lane rolls. The kernel re-mirrors
    each staged block's pad lanes when the (1,) int32 refresh-flag input
    is nonzero — the caller raises it every refresh_interval() passes.

    rdma=True (with external_halo) performs the neighbor halo exchange
    INSIDE the kernel with `pltpu.make_async_remote_copy` + a neighbor
    barrier semaphore, instead of taking ppermute-delivered halo inputs:
    at grid start each device barriers with its x-neighbors, then sends
    its edge rows over ICI directly into the neighbors' comm output
    buffers; the receive is only awaited right before the one edge block
    that consumes it, and the block order is rotated so the edge blocks
    come LAST — the literal TPU form of the reference's
    MPI_Isend / compute-interior / MPI_Waitall / compute-boundary
    overlap schedule (README.md:45-51, img/comms-overlap.png).

    start/length select a circularly-contiguous run of row blocks: grid
    step i computes block (start+i) mod n_blocks, writing only those
    output rows. With wall_mode=False the kernel is the wall-free fast
    variant (no mask, no bounce-back selects). The runner partitions the
    lattice into solid-containing and solid-free block runs
    (wall_segments) and chains one kernel launch per run — the TPU
    answer to the reference's per-vector-block "any wall?" fast path
    (src/latticeboltzmann.c:437-478), hoisted to launch granularity
    because in-kernel vector branches predicate (execute) both sides.

    region ((row_bands, lane_bands) or None) turns the masked variant
    into free-evolution + masked sub-window recomputation of the wall
    neighborhoods (see advance_region): row_bands are tight wall-row
    extents in window coords (the window spans lattice rows
    [b*br - T, b*br + br + T)), lane_bands tight 128-aligned wall-lane
    extents, both produced by wall_partition_regions and guaranteed to
    cover every solid site of every window in this launch. region=None
    keeps classic full-window selects.
    """
    ny = cfg.ny
    n_blocks = nx // br
    if length is None:
        length = n_blocks
    if external_halo and start + length > n_blocks:
        # without x periodicity a circularly wrapping segment is
        # meaningless; the sharded path only uses affine segments
        raise ValueError("sharded segments must be affine (no wrap)")
    if rdma and (start, length) != (0, n_blocks):
        raise ValueError("the rdma kernel runs the full block grid")
    # which neighbor-device halos this segment consumes: the interior
    # segment (start >= 1, end <= n_blocks-1) consumes none — its
    # launch has no data dependency on the ppermute, which is what
    # lets XLA overlap the collective with interior compute (the
    # reference's Isend/compute-interior/Waitall split, README.md:45-51)
    need_top = external_halo and start == 0
    need_bot = external_halo and start + length == n_blocks
    if rdma and not external_halo:
        raise ValueError("rdma halo exchange only applies to the sharded kernel")
    T = temporal
    if not (1 <= T <= br):
        raise ValueError(f"temporal={T} must be in [1, {br}]")
    # rdma staged-halo width: edge-row sends are 8-row aligned slabs
    sched = rdma_schedule(n_blocks, br, T) if rdma else None
    HR = sched["hr"] if rdma else 0
    if rdma and not (T <= HR <= br):
        raise ValueError(f"rdma needs temporal<={HR}<=br, got T={T} br={br}")
    rpad = nyp - lpad - ny
    if min(lpad, rpad, ny) < T:
        raise ValueError(
            f"mirror pads (lpad={lpad}, rpad={rpad}, ny={ny}) must be >= temporal={T}"
        )
    if region is not None and not wall_mode:
        raise ValueError("region only applies to the masked variant")
    if region is not None and external_halo and (
        start == 0 or (length is not None and start + length == nx // br)
    ):
        # interior sharded segments assemble the same window as local
        # ones (no halo patching), so regions compose; the edge blocks
        # keep classic full-window selects
        raise ValueError("region sharded segments must be interior")
    if emit_carry or skew:
        if wall_mode or external_halo or rdma or region is not None or panels > 1:
            raise ValueError(
                "skew/emit_carry apply to wall-free local single-panel segments"
            )
        if emit_carry and skew:
            raise ValueError("emit_carry and skew are different launches")
    if multipass:
        if (
            wall_mode or external_halo or rdma or skew or emit_carry
            or region is not None or panels > 1
        ):
            raise ValueError(
                "multipass (flat) kernel: wall-free local single-panel "
                "full-grid only"
            )
        if (start, length) != (0, n_blocks):
            raise ValueError("multipass: full block grid only")
        if multipass % 2:
            raise ValueError("multipass pass count must be even")
        if n_blocks < slots - 1:
            raise ValueError(
                f"multipass needs n_blocks >= slots-1 (cross-pass RAW "
                f"ordering), got nb={n_blocks} slots={slots}"
            )
    if panels > 1:
        if external_halo or rdma or region is not None or has_slip:
            raise ValueError("panels: local path only")
        if length is not None and start + length > n_blocks:
            # the 2-D grid's out index map is affine in the block dim;
            # wall_partition's row rotation makes every run affine, so
            # the wrapping case never arises from the planner
            raise ValueError("panels: block runs must be affine (no wrap)")
        if nyp % panels or (nyp // panels) % LANE:
            raise ValueError(f"panels={panels} must cut nyp={nyp} at 128-lane bounds")
        if nyp // panels + 2 * LANE > nyp:
            raise ValueError("panels: need at least ~2 panels' worth of lanes")
    # panel window width: the staged lane extent per block
    PW = nyp if panels == 1 else nyp // panels + 2 * LANE
    PP = nyp // panels  # lanes stored per panel
    storage = dtype
    if np.dtype(storage) == np.dtype("bfloat16"):
        dtype = np.float32  # compute precision

    one = dtype(1.0)
    three = dtype(3.0)
    half = dtype(0.5)
    sixth = dtype(1.0 / 6.0)
    csq = dtype(cfg.csq)
    icsq = dtype(1.0 / cfg.csq)
    itau = dtype(1.0 / cfg.tau)
    w = [dtype(W[s]) for s in range(NSPEEDS)]
    a14 = dtype(cfg.accel) * dtype(W[1])
    a58 = dtype(cfg.accel) * dtype(W[5])
    zero = dtype(0.0)

    # staging slots: 3 resident blocks + in-flight prefetches
    SLOTS = slots
    # the free variant of the DMA-mask path never reads the mask
    stage_walls = wall_mode and wall_spec is None

    # --- slim halo-role staging -------------------------------------
    # Issue roles are static: issue 0 is only ever consumed as the
    # s_top halo (its last T rows) and issue `length+1` only as the
    # s_bot halo (its first T rows); issues 1..length are bodies,
    # consumed in full. Staging whole br-row blocks for the two
    # halo-role issues is (br - SLIVER)/br dead DMA per launch end —
    # and on the sharded edge launches the ppermute patch overwrites
    # even the read rows, making the whole copy dead. Slim staging
    # replaces the halo-role copies with one sublane-tile-aligned
    # sliver (8 rows f32 / 16 rows bf16) and skips the fully-patched
    # ones outright. This is what makes segment/edge launches cheap:
    # a wall-partition run of length l stages l + 2*SLIVER/br blocks
    # instead of l + 2. Results are bitwise identical (the elided rows
    # were never read). "noslim" in ablate restores full staging (the
    # perf-lab A/B for this optimization).
    SLIVER = 16 if np.dtype(storage).itemsize == 2 else 8
    _slim = (
        "noslim" not in ablate
        and not (multipass or skew or emit_carry or rdma)
        and panels == 1
        and br > SLIVER
        and T <= SLIVER
    )

    def _issue_role(k: int) -> str:
        """Static staging role of issue k (k is a Python int)."""
        if not _slim:
            return "full"
        if k == 0:
            # the htop patch fully covers the read rows of issue 0
            return "skip" if need_top else "top"
        if k == length + 1:
            return "skip" if need_bot else "bot"
        return "full"

    def _rem(a, n: int):
        # int32-stable modulo (tests run under jax_enable_x64)
        return jax.lax.rem(jnp.asarray(a, jnp.int32), jnp.int32(n))

    # Halo strategy: the top halo row of block b is the LAST row of body
    # block b-1 and the bottom halo row is the FIRST row of body block
    # b+1 — so staging *whole neighbor body blocks* gives every halo for
    # free, all DMAs stay 8-row tile-aligned (Mosaic requirement), and
    # halo traffic is ~zero instead of 2T extra rows per block. SLOTS
    # rotating VMEM slots hold blocks [i-1, i, i+1] plus in-flight
    # prefetches. Issue index k stages block (k-1) mod G into slot
    # k mod SLOTS; compute at grid step i consumes issues i, i+1, i+2.

    def kernel(f_hbm, donor_hbm, walls_hbm, *rest):
        # donor_hbm is never read: it only donates its HBM buffer to the
        # output (input_output_aliases), so the scan carry ping-pongs two
        # buffers with zero copies — the XLA-buffer-level equivalent of
        # the reference's fA/fB pointer swap (src/latticeboltzmann.c:186-210)
        del donor_hbm
        htop = hbot = whtop = whbot = wbody = None
        ct_ref = cb_ref = ssem = rsem = None
        carr_in = carry_out = c_ref = w_ref = None
        out2 = obody = osem = c2_ref = phase_ref = None
        if multipass:
            # flat: f_hbm is only the aliased in-operand; all reads AND
            # writes go through out2 (the same HBM buffer)
            phase_ref, out2, fbody, sems, obody, osem, c2_ref = rest
            rfl_ref = out_ref = None
        elif skew:
            carr_in, rfl_ref, out_ref, fbody, sems, c_ref, w_ref = rest
        elif emit_carry:
            rfl_ref, out_ref, carry_out, fbody, sems = rest
        elif rdma and wall_spec is not None:
            (off_ref, rfl_ref, out_ref, ct_ref, cb_ref,
             fbody, sems, sbuf, ssem, rsem) = rest
        elif rdma:
            (whtop, whbot, rfl_ref, out_ref, ct_ref, cb_ref,
             fbody, wbody, sems, sbuf, ssem, rsem) = rest
        elif external_halo:
            rest = list(rest)
            htop = rest.pop(0) if need_top else None
            hbot = rest.pop(0) if need_bot else None
            if wall_spec is not None:
                off_ref, rfl_ref, out_ref, fbody, sems = rest
            elif stage_walls:
                whtop = rest.pop(0) if need_top else None
                whbot = rest.pop(0) if need_bot else None
                rfl_ref, out_ref, fbody, wbody, sems = rest
            else:  # wall-free sharded launch: no mask staging at all
                rfl_ref, out_ref, fbody, sems = rest
        elif stage_walls:
            rfl_ref, out_ref, fbody, wbody, sems = rest
        else:
            rfl_ref, out_ref, fbody, sems = rest
        if multipass:
            p_pass = pl.program_id(0)
            i = pl.program_id(1)
            s_off = None
            # issue-space step index: each pass consumes nb+1 issues
            # (blocks 0..nb-1 plus the wrap restage of block 0), and
            # one extra issue g=0 leads the whole chunk (block nb-1 of
            # the input parity — pass 0's top halo; later passes take
            # it from the VMEM carry instead)
            e_iss = p_pass * jnp.int32(n_blocks + 1) + i
            G_MAX = multipass * (n_blocks + 1)
            KR = refresh_interval(lpad, rpad, ny, temporal)
        elif panels == 1:
            i = pl.program_id(0)
            s_off = None
        else:
            pnl = pl.program_id(0)
            i = pl.program_id(1)
            # 128-aligned clipped window start: panel p's lanes sit at
            # window offset 0 (first), 128 (middle), 256 (last panel).
            # The x128 is the OUTERMOST op so Mosaic's divisibility
            # prover accepts the dynamic DMA lane index ("failed to
            # prove a tile index divisible by the tiling" otherwise).
            s_off = jnp.int32(LANE) * jnp.clip(
                pnl * jnp.int32(PP // LANE) - 1, 0, jnp.int32((nyp - PW) // LANE)
            )
        if multipass:
            # per-issue refresh (computed in flat_flag below); keep the
            # classic name bound for shared code paths that never run flat
            def _issue_refresh(g):
                """Refresh flag of the pass issue g stages for: passes
                0, KR, 2*KR, ... (absolute — phase_ref carries the
                chunk's starting pass index) re-mirror their staged
                pads, matching the classic runner's rem(p0, K) == 0."""
                g = jnp.asarray(g, jnp.int32)
                q = jnp.where(
                    g == 0,
                    jnp.int32(0),
                    (g - 1) // jnp.int32(n_blocks + 1),
                )
                return _rem(phase_ref[0] + q, KR) == 0

            # the consuming pass's flag: gates the carry remirror fix
            do_refresh = _rem(phase_ref[0] + p_pass, KR) == 0
        else:
            do_refresh = rfl_ref[0] != 0

        if rdma:
            my = jax.lax.axis_index(axis)
            ndev = jax.lax.axis_size(axis)
            right = jax.lax.rem(my + 1, ndev)
            left = jax.lax.rem(my - 1 + ndev, ndev)

            # my last HR rows -> right neighbor's comm_top (it pulls
            # them at its block 0); my first HR rows -> left neighbor's
            # comm_bot (its block G-1). The reference's boundary-row
            # Isend/Irecv (README.md:45). Descriptors are rebuilt from
            # the same refs at the start and wait sites (the local-DMA
            # copies() pattern).
            def rdma_down():
                return pltpu.make_async_remote_copy(
                    src_ref=sbuf.at[0],
                    dst_ref=ct_ref,
                    send_sem=ssem.at[0],
                    recv_sem=rsem.at[0],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            def rdma_up():
                return pltpu.make_async_remote_copy(
                    src_ref=sbuf.at[1],
                    dst_ref=cb_ref,
                    send_sem=ssem.at[1],
                    recv_sem=rsem.at[1],
                    device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            @pl.when(i == sched["send_step"])
            def _():
                # stage my edge slabs HBM -> VMEM send buffers
                lc0 = pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(sched["send_down_row0"], HR), :],
                    sbuf.at[0], ssem.at[0],
                )
                lc1 = pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(sched["send_up_row0"], HR), :],
                    sbuf.at[1], ssem.at[1],
                )
                lc0.start()
                lc1.start()
                # pass-start rendezvous with both neighbors: guarantees
                # their previous pass (which consumed my last sends) is
                # complete before these sends overwrite their comm
                # buffers — the Waitall-before-reuse discipline
                if "nobarrier" not in ablate:  # perf-lab compile probe
                    bar = pltpu.get_barrier_semaphore()
                    pltpu.semaphore_signal(
                        bar, inc=1, device_id=left,
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    pltpu.semaphore_signal(
                        bar, inc=1, device_id=right,
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    pltpu.semaphore_wait(bar, 2)
                lc0.wait()
                lc1.wait()
                rdma_down().start()
                rdma_up().start()

            # the receives are awaited as late as possible: the rotated
            # block order (body block (i+1) mod G) puts the consuming
            # edge blocks at the last two grid steps, hiding the ICI
            # transfer behind interior compute (the reference's overlap
            # mode, README.md:45-51)
            @pl.when(i == sched["wait_up_step"])
            def _():
                rdma_up().wait()

            @pl.when(i == sched["wait_down_step"])
            def _():
                rdma_down().wait()

        def remirror(slot, flag=None):
            """Re-assert the pad-lane mirror invariant on a freshly
            staged block, in the storage dtype (exact lane copies):
            P[j] = P[j+ny] for j < lpad, P[j] = P[j-ny] for
            j >= lpad+ny. One timestep invalidates one pad lane per
            side (the nyp-periodic roll feeds the outermost lanes from
            the wrong edge), so this only needs to run every
            refresh_interval() passes — the caller's flag gates it
            (flat kernels pass the staged issue's own pass flag)."""
            if "remirror" in ablate:  # perf-lab/compile probe
                return
            if panels > 1:
                # a panel window cannot see the opposite lattice edge;
                # the runner re-mirrors between passes instead
                return

            @pl.when(do_refresh if flag is None else flag)
            def _():
                lane = jax.lax.broadcasted_iota(jnp.int32, (br, nyp), 1)
                for s in range(NSPEEDS):
                    # roll in f32: Mosaic has no 16-bit lane rotate, and
                    # the bf16->f32->bf16 round trip is exact for copies
                    v = fbody[slot, s].astype(jnp.float32)
                    left = pltpu.roll(v, nyp - ny, axis=1)
                    right = pltpu.roll(v, ny, axis=1)
                    v = jnp.where(lane < lpad, left, v)
                    fbody[slot, s] = jnp.where(
                        lane >= lpad + ny, right, v
                    ).astype(storage)

        def copies(k, role="full"):
            if role != "full":
                # static halo-role issue (k is a Python int): stage only
                # the SLIVER rows the window assembly can read — the
                # last SLIVER of the block for the s_top role, the first
                # SLIVER for s_bot (T <= SLIVER always here)
                if external_halo:
                    sblk = min(max(k - 1 + start, 0), n_blocks - 1)
                else:
                    sblk = (k + start + n_blocks - 1) % n_blocks
                slot = k % SLOTS
                ro = br - SLIVER if role == "top" else 0
                r0s = sblk * br + ro
                out = [
                    pltpu.make_async_copy(
                        f_hbm.at[:, pl.ds(r0s, SLIVER), :],
                        fbody.at[slot, :, pl.ds(ro, SLIVER), :],
                        sems.at[slot, 0],
                    )
                ]
                if wbody is not None:
                    out.append(
                        pltpu.make_async_copy(
                            walls_hbm.at[pl.ds(r0s, SLIVER), :],
                            wbody.at[slot, pl.ds(ro, SLIVER), :],
                            sems.at[slot, 1],
                        )
                    )
                return out
            if multipass:
                # issue g = 0 pre-stages block nb-1 of the chunk's input
                # (parity 0) — pass 0's top halo; issues g >= 1 belong to
                # pass q = (g-1)//(nb+1) with local k' = (g-1)%(nb+1)
                # staging block k' (k' == nb restages block 0, the s_bot
                # of the pass's last block), reading parity q%2 (the
                # chunk always starts at parity 0; multipass is even)
                g = jnp.asarray(k, jnp.int32)
                q = (g - 1) // jnp.int32(n_blocks + 1)
                kk = _rem(g - 1, n_blocks + 1)
                blk = jnp.where(
                    g == 0,
                    jnp.int32(n_blocks - 1),
                    jnp.where(kk == jnp.int32(n_blocks), jnp.int32(0), kk),
                )
                par = jnp.where(g == 0, jnp.int32(0), _rem(q, 2))
                slot = _rem(g, SLOTS)
                r0 = blk * jnp.int32(br)
                return [
                    pltpu.make_async_copy(
                        out2.at[par, :, pl.ds(r0, br), :],
                        fbody.at[slot],
                        sems.at[slot, 0],
                    )
                ]
            if rdma:
                # rotated order: issue k stages block k mod G; the body
                # at step i is block (i+1) mod G, so the edge blocks (0
                # and G-1, which need the remote halos) land on the last
                # two grid steps. The wrapped neighbor staging is wrong
                # only for the cross-device halo rows, which the window
                # assembly overrides with the comm-buffer rows.
                blk = _rem(k, n_blocks)
            elif external_halo:
                # no x wrap: edge issues stage a clamped block whose halo
                # rows get patched from the neighbor-device inputs below
                # (interior segments never actually clamp: their neighbor
                # blocks all exist locally)
                blk = jnp.clip(
                    jnp.asarray(k, jnp.int32) - 1 + jnp.int32(start),
                    0,
                    jnp.int32(n_blocks - 1),
                )
            else:
                blk = _rem(k + (start + n_blocks - 1), n_blocks)
            slot = _rem(k, SLOTS)
            r0 = blk * jnp.int32(br)
            lane_sl = slice(None) if panels == 1 else pl.ds(s_off, PW)
            out = [
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(r0, br), lane_sl],
                    fbody.at[slot],
                    sems.at[slot, 0],
                )
            ]
            if wbody is not None:
                out.append(
                    pltpu.make_async_copy(
                        walls_hbm.at[pl.ds(r0, br), lane_sl],
                        wbody.at[slot],
                        sems.at[slot, 1],
                    )
                )
            return out

        def begin(k, role="full"):
            for c in copies(k, role):
                c.start()

        def wait(k, role="full"):
            for c in copies(k, role):
                c.wait()

        # warm-up at i=0: start the first SLOTS-1 issues; every step
        # prefetches issue i+SLOTS-1 while computing block i — the TPU
        # version of the reference's software prefetch of the next
        # vector block (src/latticeboltzmann.c:350-358). The skew
        # kernel never reads issue 0's slot (the s_top halo role is
        # replaced by the carry scratch), so its pipeline starts at
        # issue 1 — one whole dead block DMA saved per launch.
        k_first = 1 if skew else 0

        if multipass:
            first_step = (p_pass == 0) & (i == 0)

            @pl.when(first_step)
            def _():
                for k in range(min(SLOTS - 1, G_MAX + 1)):
                    begin(k)
                for k in range(2):
                    wait(k)
                    remirror(k, _issue_refresh(k))

            tgt = e_iss + jnp.int32(SLOTS - 1)
            # the issue counter jumps by 2 across a pass boundary (the
            # pass's leading issue has no consuming grid step of its
            # own), so pass-start steps begin TWO issues
            @pl.when((i == 0) & (p_pass > 0) & (tgt - 1 <= jnp.int32(G_MAX)))
            def _():
                begin(tgt - 1)

            @pl.when(tgt <= jnp.int32(G_MAX))
            def _():
                begin(tgt)

            # e_iss skips one value across each pass boundary, so the
            # per-step wait(e+2) cadence would skip issue p*(nb+1)+1 —
            # pass p's block 0 — leaving it unwaited AND un-remirrored
            # (stale pads on refresh passes, ~1e-3 errors seeding from
            # block 0; caught by test_flat_refresh_and_carry_interaction)
            @pl.when((i == 0) & (p_pass > 0))
            def _():
                wait(e_iss + 1)
                remirror(_rem(e_iss + 1, SLOTS), _issue_refresh(e_iss + 1))

            wait(e_iss + 2)
            remirror(_rem(e_iss + 2, SLOTS), _issue_refresh(e_iss + 2))
        else:
            # the last issue's role decides the traced begin/wait split
            # below: a non-"full" role needs its own statically-shaped
            # descriptor (DMA byte counts are baked into the descriptor,
            # so a begin and its wait must agree), gated by pl.when on
            # the one step that touches issue length+1
            last_role = _issue_role(length + 1)

            @pl.when(i == 0)
            def _():
                for k in range(k_first, min(SLOTS - 1, length + 2)):
                    if _issue_role(k) != "skip":
                        begin(k, _issue_role(k))
                for k in range(k_first, 2):
                    if _issue_role(k) != "skip":
                        wait(k, _issue_role(k))
                    remirror(k)  # SLOTS >= 4, so issues 0, 1 sit in slots 0, 1

            if last_role == "full":
                @pl.when(i + SLOTS - 1 < length + 2)
                def _():
                    begin(i + SLOTS - 1)

                wait(i + 2)
            else:
                # issues [SLOTS-1, length] are bodies (full); issue
                # length+1 is the s_bot halo role — sliver or skipped
                @pl.when(i + SLOTS - 1 < length + 1)
                def _():
                    begin(i + SLOTS - 1)

                if last_role != "skip" and length + 1 >= SLOTS - 1:
                    # begun in warmup when length+1 < SLOTS-1
                    @pl.when(i + SLOTS - 1 == length + 1)
                    def _():
                        begin(length + 1, last_role)

                @pl.when(i + 2 < length + 1)
                def _():
                    wait(i + 2)

                if last_role != "skip":
                    @pl.when(i + 2 == length + 1)
                    def _():
                        wait(length + 1, last_role)

            remirror(_rem(i + 2, SLOTS))

        if external_halo and not rdma:
            # patch the T neighbor-device rows into the resident edge
            # slots (the pull stencil only ever reads those T rows from
            # the edge slots): top halo into issue-0's slot, bottom halo
            # into issue-(length+1)'s slot
            if need_top:

                @pl.when(i == 0)
                def _():
                    for s in range(NSPEEDS):
                        fbody[0, s, br - T :, :] = htop[s]
                    if wbody is not None:
                        wbody[0, br - T :, :] = whtop[...]

            if need_bot:

                @pl.when(i == length - 1)
                def _():
                    slot_last = (length + 1) % SLOTS
                    for s in range(NSPEEDS):
                        fbody[slot_last, s, :T, :] = hbot[s]
                    if wbody is not None:
                        wbody[slot_last, :T, :] = whbot[...]

        if multipass:
            s_top = _rem(e_iss, SLOTS)
            s_body = _rem(e_iss + 1, SLOTS)
            s_bot = _rem(e_iss + 2, SLOTS)
        else:
            s_top = _rem(i, SLOTS)   # holds block i-1: its last row is our top halo
            s_body = _rem(i + 1, SLOTS)  # block i
            s_bot = _rem(i + 2, SLOTS)  # block i+1: its first row is our bottom halo

        # Forcing touches column j=0 (lane lpad) AND every pad mirror of
        # it (lanes with (j - lpad) mod ny == 0) — column ny-1's pull
        # reads the right mirror, so skipping them would break both the
        # wrap physics and the mirror invariant. The guard values at a
        # mirror equal the real ones, so all copies make the same
        # all-or-nothing decision. Real lattices have exactly two such
        # lanes (lpad and lpad+ny); lattices narrower than their padding
        # have more.
        force_lanes = [j for j in range(nyp) if (j - lpad) % ny == 0]
        force_blocks = sorted({j // LANE * LANE for j in force_lanes})
        # floor-mod bias: makes (x + bias) nonnegative for every window
        # lane of every panel before lax.rem (which truncates toward 0)
        _mod_bias = ny * ((lpad + 2 * LANE) // ny + 2)

        def forced_dyn(planes, wall):
            """Panel form of `forced`: the window's lattice-lane origin
            s_off is a runtime scalar, so the forced lanes cannot be
            static lane sub-blocks; the guard and the six updates run
            full-window-width against an iota mask instead. Costs ~6
            wide selects per sub-step — acceptable on the huge-lattice
            path panels serve."""
            r = planes[0].shape[0]
            lane = s_off + jax.lax.broadcasted_iota(jnp.int32, (r, PW), 1)
            ok = _rem(lane - jnp.int32(lpad) + jnp.int32(_mod_bias), ny) == 0
            if wall is not None:
                ok &= jnp.logical_not(wall)
            ok = (
                ok
                & (planes[6] - a58 > zero)
                & (planes[3] - a14 > zero)
                & (planes[7] - a58 > zero)
            )
            out = list(planes)
            for s, delta in ((6, -a58), (3, -a14), (7, -a58),
                             (5, a58), (1, a14), (8, a58)):
                out[s] = jnp.where(ok, planes[s] + delta, planes[s])
            return out

        def forced(planes, wall):
            """Channel forcing on column j=0 (src/latticeboltzmann.c:
            489-518), applied to any row set (body or halo rows — halo
            rows must be post-forcing because boundary outputs pull
            from them). All guard/update arithmetic runs on the one or
            two 128-lane sub-blocks containing the forced lanes, written
            back with static lane concats (dynamic_update_slice has no
            Pallas TPU lowering). wall=None means the window is known
            solid-free (the wall guard term is identically false)."""
            r = planes[0].shape[0]
            oks = {}
            for b in force_blocks:
                lane = b + jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1)
                ok = None
                for j in force_lanes:
                    if b <= j < b + LANE:
                        ok = (lane == j) if ok is None else ok | (lane == j)
                if wall is not None:
                    ok &= jnp.logical_not(wall[:, b : b + LANE])
                oks[b] = (
                    ok
                    & (planes[6][:, b : b + LANE] - a58 > zero)
                    & (planes[3][:, b : b + LANE] - a14 > zero)
                    & (planes[7][:, b : b + LANE] - a58 > zero)
                )
            out = list(planes)
            for s, delta in ((6, -a58), (3, -a14), (7, -a58),
                             (5, a58), (1, a14), (8, a58)):
                segs, pos = [], 0
                for b in force_blocks:
                    if b > pos:
                        segs.append(planes[s][:, pos:b])
                    sub = planes[s][:, b : b + LANE]
                    segs.append(jnp.where(oks[b], sub + delta, sub))
                    pos = b + LANE
                if pos < nyp:
                    segs.append(planes[s][:, pos:])
                out[s] = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            return out

        def stream_collide_window(f, wall, cls=None):
            """One fused step on an R-row window: returns the R-2 valid
            interior rows (pull-scheme gather per
            src/latticeboltzmann.c:230-243, BGK per :258-296, masked
            bounce-back per :246-255; wall f0 passthrough = own value).
            With cls (solid-class codes: 1=bounce-back, 2=slip_x,
            3=slip_y) the free-slip specular reflections are two extra
            masked selects per speed."""
            R = f[0].shape[0]
            pulled = []
            for s in range(NSPEEDS):
                ex, ey = int(E[s, 0]), int(E[s, 1])
                if "pull" in ablate:
                    ex, ey = 0, 0
                col = f[s][1 - ex : R - 1 - ex]  # (R-2, nyp)
                # pure lane roll: the periodic wrap is carried by the
                # mirror pad lanes (pick_layout), not a per-step edge fix
                if not ey:
                    pulled.append(col)
                else:
                    # modulo the WINDOW's width, not nyp: lane-band
                    # recomputes (advance_region) evolve sub-windows
                    # narrower than nyp, and an ey=-1 roll by nyp-1
                    # lanes lands at (nyp-1) mod W — wrong by far
                    W_ = f[s].shape[1]
                    shift = ey if ("negroll" in ablate and ey < 0) else ey % W_
                    pulled.append(pltpu.roll(col, shift, axis=1))
            if "collide" in ablate:
                return pulled

            # moments with shared partial sums (same values as the
            # reference's sums, reassociated for op count)
            p = pulled
            d56 = p[5] + p[6]
            d78 = p[7] + p[8]
            d58 = p[5] + p[8]
            d67 = p[6] + p[7]
            density = (p[0] + (p[1] + p[3])) + ((p[2] + p[4]) + (d56 + d78))
            if fast_math or "recip" in ablate:
                # hardware approximate reciprocal: max rel err 1.6e-5
                # measured on v5e, -7 us/step. This is the framework's
                # analog of the reference's -Ofast build (Makefile:2),
                # which licenses exactly this class of substitution;
                # --exact-math / fast_math=False restores IEEE division.
                inv_rho = pl.reciprocal(density, approx=True)
            else:
                inv_rho = one / density
            u_x = ((p[2] - p[4]) + (d56 - d78)) * inv_rho
            u_y = ((p[1] - p[3]) + (d58 - d67)) * inv_rho
            # directional e_i . u, pre-scaled by 3/c^2 (as the reference's
            # vector kernel does, src/latticeboltzmann.c:399-409)
            ux3 = three * icsq * u_x
            uy3 = three * icsq * u_y
            # 1 - 1.5|u|^2/c^2 from the pre-scaled components:
            # uterm = (1/6)(ux3^2 + uy3^2) * csq = 1.5|u|^2/c^2
            base = one - sixth * csq * (ux3 * ux3 + uy3 * uy3)

            # relaxation folded into the equilibrium weights:
            # out = (1-1/tau) f + (w_s/tau) rho (base + eu + eu^2/2),
            # with the quadratic part shared between opposite-speed
            # pairs (eu_opp = -eu) — the reference's math (:283-296)
            # with ~25% fewer vector ops
            c1 = one - itau
            iw0, iw14, iw58 = itau * w[0], itau * w[1], itau * w[5]
            r0_, r14, r58 = iw0 * density, iw14 * density, iw58 * density

            # bounce-back select fused into the relaxation per pair: both
            # pair members' pulled planes are live here anyway (out[sp]
            # bounces to p[sn] and vice versa), so the masked select
            # rides the same vector-loop pass instead of 9 standalone
            # select passes over the window (which measured ~25% of the
            # whole step, scripts/anatomy.py)
            wall_c = cls_c = bounce = None
            wf = iwf = None
            if wall is not None and "walls" not in ablate:
                wall_c = wall[1 : R - 1]
                if cls is not None:
                    cls_c = cls[1 : R - 1]
                    # class codes are exact small floats, so equality is
                    # safe; precedence was resolved in class_plane
                    bounce = cls_c == np.float32(1.0)
                elif "mulsel" in ablate:
                    # perf-lab: arithmetic select a*(1-w) + b*w with
                    # w in {0,1} — exact for nonnegative values, and the
                    # muls/adds co-issue where vselects may be port-bound
                    wf = jnp.where(wall_c, one, zero)
                    iwf = jnp.where(wall_c, zero, one)

            def finish(s, relaxed):
                if wall_c is None:
                    return relaxed
                if cls_c is None:
                    if wf is not None:
                        return relaxed * iwf + p[int(OPPOSITE[s])] * wf
                    return jnp.where(wall_c, p[int(OPPOSITE[s])], relaxed)
                # slip (specular reflection, the "reflect" BC the
                # reference names but never implements,
                # src/latticeboltzmann.c:21)
                o = jnp.where(cls_c == np.float32(2.0), p[int(REFLECT_X[s])], relaxed)
                o = jnp.where(cls_c == np.float32(3.0), p[int(REFLECT_Y[s])], o)
                return jnp.where(bounce, p[int(OPPOSITE[s])], o)

            out = [None] * NSPEEDS
            out[0] = finish(0, c1 * p[0] + r0_ * base)
            for sp, sn, r_ in ((1, 3, r14), (2, 4, r14), (5, 7, r58), (6, 8, r58)):
                if sp == 1:
                    eu = uy3
                elif sp == 2:
                    eu = ux3
                elif sp == 5:
                    eu = ux3 + uy3
                else:  # sp == 6
                    eu = ux3 - uy3
                q = base + half * eu * eu
                out[sp] = finish(sp, c1 * p[sp] + r_ * (q + eu))
                out[sn] = finish(sn, c1 * p[sn] + r_ * (q - eu))

            if "collide2x" in ablate:
                # perf-lab: run the collision arithmetic a second time
                # with a CSE-proof perturbed relaxation rate, to measure
                # whether the VPU math is hidden behind DMA (time
                # unchanged) or exposed (grows by one collision's worth).
                # The duplicate skips the wall selects — wall physics is
                # not meaningful under this flag.
                c1b = c1 * dtype(1.0 + 1e-6)
                out2 = [None] * NSPEEDS
                out2[0] = c1b * p[0] + r0_ * base
                for sp, sn, r_ in ((1, 3, r14), (2, 4, r14), (5, 7, r58), (6, 8, r58)):
                    eu = {1: uy3, 2: ux3, 5: ux3 + uy3, 6: ux3 - uy3}[sp]
                    q = base + half * eu * eu
                    out2[sp] = c1b * p[sp] + r_ * (q + eu)
                    out2[sn] = c1b * p[sn] + r_ * (q - eu)
                out = [half * (a + b) for a, b in zip(out, out2)]

            return out

        # assemble the extended window: rows [r0-T, r0+br+T) from the
        # three resident blocks (cast up to compute precision if the
        # storage dtype is bf16). On the rdma path the cross-device edge
        # rows come from the comm buffers the neighbors' remote DMAs
        # filled (re-mirrored: they are raw stored rows with decayed pad
        # lanes), selected in for the first/last body block only.
        if rdma:
            body_blk = _rem(i + sched["body_offset"], n_blocks)
            is_first = body_blk == 0
            is_last = body_blk == jnp.int32(n_blocks - 1)
            hlane = jax.lax.broadcasted_iota(jnp.int32, (T, nyp), 1)

            def fix_halo(x):
                x = x.astype(jnp.float32)  # no 16-bit lane rotate in Mosaic
                xl = pltpu.roll(x, nyp - ny, axis=1)
                xr = pltpu.roll(x, ny, axis=1)
                x = jnp.where(hlane < lpad, xl, x)
                return jnp.where(hlane >= lpad + ny, xr, x).astype(storage)

            th0, th1 = sched["top_halo_rows"]
            bh0, bh1 = sched["bot_halo_rows"]

            def top_piece(s):
                return jnp.where(
                    is_first, fix_halo(ct_ref[s, th0:th1]),
                    fbody[s_top, s, br - T :],
                )

            def bot_piece(s):
                return jnp.where(
                    is_last, fix_halo(cb_ref[s, bh0:bh1]), fbody[s_bot, s, :T]
                )
        elif multipass:
            # block 0 of pass p > 0 takes its top halo from the VMEM
            # carry (block nb-1 of pass p-1, written one grid step ago —
            # the one cross-pass dependency too fresh to round-trip
            # through HBM). The carry rows skipped the staged-block
            # remirror, so on refresh passes the same pad fix is applied
            # here (a (T, nyp) select — cheap).
            use_carry = (i == 0) & (p_pass > 0)
            hlane2 = jax.lax.broadcasted_iota(jnp.int32, (T, nyp), 1)

            def _carry_fixed(s):
                if "nocarryfix" in ablate:  # perf probe: raw carry
                    return c2_ref[s][...]
                x = c2_ref[s].astype(jnp.float32)
                xl = pltpu.roll(x, nyp - ny, axis=1)
                xr = pltpu.roll(x, ny, axis=1)
                x2 = jnp.where(hlane2 < lpad, xl, x)
                x2 = jnp.where(hlane2 >= lpad + ny, xr, x2)
                return jnp.where(do_refresh, x2, x).astype(storage)

            def top_piece(s):
                if "nocarry" in ablate:  # perf probe: staged top always
                    return fbody[s_top, s, br - T :]
                return jnp.where(
                    use_carry, _carry_fixed(s), fbody[s_top, s, br - T :]
                )

            def bot_piece(s):
                return fbody[s_bot, s, :T]
        else:
            def top_piece(s):
                return fbody[s_top, s, br - T :]

            def bot_piece(s):
                return fbody[s_bot, s, :T]

        f = (
            None  # skew assembles its own parallelogram window below
            if skew
            else [
                jnp.concatenate(
                    [top_piece(s), fbody[s_body, s], bot_piece(s)], axis=0
                ).astype(dtype)
                for s in range(NSPEEDS)
            ]
        )
        cls = None
        wall = None
        if not wall_mode:
            pass  # wall-free fast variant: no mask at all
        elif wall_spec is None:
            w_top = wbody[s_top, br - T :]
            w_bot = wbody[s_bot, :T]
            if rdma:
                # static wall halos (exchanged once by the caller)
                w_top = jnp.where(is_first, whtop[...], w_top)
                w_bot = jnp.where(is_last, whbot[...], w_bot)
            codes = jnp.concatenate([w_top, wbody[s_body], w_bot], axis=0)
            wall = codes > zero  # any solid class (forcing skips them all)
            if has_slip:
                cls = codes
        else:
            # closed-form mask from iotas — no walls DMA. Window rows are
            # global rows [base - T, base + br + T) with periodic wrap at
            # the *global* row count (the shard offset arrives in SMEM on
            # the sharded variant). Lanes map to real columns through the
            # mirror layout (pad lanes mirror the opposite edge's columns,
            # so pad-site dynamics — including walls — mirror real sites
            # and the mirror invariant survives wall bounce-back).
            R = br + 2 * T
            wrap_n = cfg.nx if external_halo else nx
            base = _rem(i + jnp.int32(1 if rdma else start), n_blocks) * jnp.int32(br)
            if external_halo:
                base = base + off_ref[0]
            # row_shift: storage rows are a rotation of physical rows
            # (wall_partition); the geometry tests run in physical rows
            row0 = base + jnp.int32(row_shift) - jnp.int32(T) + jnp.int32(wrap_n)
            rows = _rem(row0 + jax.lax.broadcasted_iota(jnp.int32, (R, PW), 0), wrap_n)
            # lane -> real column (multi-wrap periodic, matching pad_state);
            # panel windows add their runtime lattice-lane origin
            shift = (round_up(lpad, ny) - lpad) % ny
            lane_idx = jax.lax.broadcasted_iota(jnp.int32, (R, PW), 1)
            if panels > 1:
                lane_idx = lane_idx + s_off + jnp.int32(_mod_bias - lpad)
                # (same floor-mod bias trick as forced_dyn: lane - lpad
                # stays nonnegative before the truncating rem)
                cols = _rem(lane_idx, ny)
            else:
                cols = _rem(lane_idx + jnp.int32(shift), ny)
            wall = None
            for prim in wall_spec:
                kind = prim[0]
                if kind == "channel":
                    w_ = (rows == 0) | (rows == jnp.int32(wrap_n - 1))
                elif kind == "rect":
                    _, pr0, pr1, pc0, pc1 = prim
                    w_ = (
                        (rows >= jnp.int32(pr0))
                        & (rows < jnp.int32(pr1))
                        & (cols >= jnp.int32(pc0))
                        & (cols < jnp.int32(pc1))
                    )
                elif kind == "circle2":
                    _, ci2, cj2, r2q = prim
                    di = 2 * rows - jnp.int32(ci2)
                    dj = 2 * cols - jnp.int32(cj2)
                    w_ = di * di + dj * dj <= jnp.int32(r2q)
                else:
                    raise ValueError(f"unknown wall-spec primitive {kind!r}")
                wall = w_ if wall is None else wall | w_
            if wall is None:  # empty spec: fully periodic fluid box
                wall = jnp.zeros((R, PW), jnp.bool_)

        def evolve(ff, ww, cc, do_force: bool = True, emit=None):
            """T fused steps on a (sub-)window: trims one invalid row
            per side per step (forcing precedes every step:
            src/latticeboltzmann.c:192,201). ww=None is the solid-free
            fast variant: the 9 bounce-back selects per step were ~24%
            of the kernel's VPU time (scripts/anatomy.py). do_force=False
            is for lane-sliced sub-windows, whose coordinates `forced`
            does not speak — the partitioner keeps forcing lanes out of
            them, so skipping is exact there. emit(t, ff) observes the
            window at each time level BEFORE forcing (the skew carry is
            pre-forcing: its consumer re-applies the step's forcing to
            the assembled window, see advance_skew)."""
            for t in range(T):
                if emit is not None:
                    emit(t, ff)
                if do_force and "force" not in ablate:
                    ff = (forced_dyn if panels > 1 else forced)(ff, ww)
                ff = stream_collide_window(ff, ww, cc)
                if ww is not None:
                    ww = ww[1:-1]
                if cc is not None:
                    cc = cc[1:-1]
            return ff

        def advance(masked: bool):
            if masked and region is not None:
                return advance_region()
            if skew:
                return advance_skew()
            ww = wall if masked else None
            cc = cls if masked else None
            emit = None
            if emit_carry:
                def emit(t, ffx):
                    # the run's LAST trapezoid block owns the rows the
                    # following skew launch needs (its window's top two
                    # rows at each time level, pre-forcing)
                    @pl.when(i == length - 1)
                    def _():
                        for s in range(NSPEEDS):
                            carry_out[s, 2 * t : 2 * t + 2, :] = ffx[s][
                                -2:
                            ].astype(jnp.float32)
            ff = evolve(list(f), ww, cc, emit=emit)
            if panels == 1:
                for s in range(NSPEEDS):
                    out_ref[s, :, :] = ff[s].astype(storage)
                return
            # store only the panel's own PP lanes: the clip puts them at
            # window offset 0 / 128 / 256 for first / middle / last
            offs = [(pnl == 0, 0), (pnl == jnp.int32(panels - 1), 2 * LANE)]
            if panels > 2:
                offs.append(
                    ((pnl > 0) & (pnl < jnp.int32(panels - 1)), LANE)
                )
            for cond, off in offs:

                @pl.when(cond)
                def _(off=off):
                    for s in range(NSPEEDS):
                        out_ref[s, :, :] = ff[s][:, off : off + PP].astype(storage)

        def advance_region():
            """Free evolution plus masked recomputation of the wall
            neighborhoods — the region form of the masked variant.

            The full window first evolves with the select-free fast
            kernel; wall effects contaminate at most one site per step,
            so after T steps only rows/lanes within T of a solid site
            are wrong. Those neighborhoods are then re-evolved from the
            ORIGINAL window on narrow sub-windows (row bands x all
            lanes, all rows x 128-aligned lane bands) with the full
            masked kernel, and their interiors overwrite the free
            result via static out_ref stores. Exact: outside the
            contamination radius the free and masked computations are
            bitwise identical (where(False, a, b) == b), and each
            recompute consumes pristine inputs with a >=T-site margin.

            This is the TPU form of the reference's per-VECWIDTH
            "any wall?" dispatch (src/latticeboltzmann.c:437-478) at
            sub-block granularity: the round-2 anatomy showed full-width
            selects cost 52 us/step (28%) for 0.28% wall sites. A
            select-patchwork (concat of selected/passthrough pieces) is
            NOT used because rolled-layout values feeding vector concats
            hard-crash Mosaic's layout pass (bisected on-tunnel);
            sub-window recomputation uses only op shapes the round-2
            kernel already compiles."""
            row_bands, lane_bands = region

            def compute_patches():
                """[(gg, dst, lane_src)]: the re-evolved wall
                neighborhoods and their out_ref destinations."""
                patches = []
                # row-band recomputes: walls spanning many lanes but few
                # rows (e.g. channel walls). Bands are tight wall
                # extents in window coords; expand by T for
                # contamination, clamp to the output range, 8-align the
                # store offsets, pad the input window by T more.
                for r0, r1 in row_bands or ():
                    o_lo = max(r0 - T, T)
                    o_hi = min(r1 + T, br + T)
                    o_lo = T + (o_lo - T) // 8 * 8          # align store row
                    o_hi = min(T - (-(o_hi - T) // 8) * 8, br + T)
                    if o_lo >= o_hi:
                        continue
                    a, b = o_lo - T, o_hi + T
                    gg = [pp[a:b] for pp in f]
                    gg = evolve(gg, wall[a:b], None if cls is None else cls[a:b])
                    patches.append(
                        (gg, (slice(o_lo - T, o_hi - T), slice(None)), None)
                    )
                # lane-band recomputes: walls spanning many rows but few
                # lanes (e.g. a thin barrier). The sub-window's lane
                # rolls wrap at its own edges, feeding junk inward one
                # lane per step — the T-lane input margin keeps it out
                # of the stored band. The partitioner guarantees bands
                # are 128-aligned, >=2T from the lattice's lane edges,
                # and free of forcing lanes (forced would need a
                # lane-offset variant).
                for l0, l1 in lane_bands or ():
                    a, b = l0 - T, l1 + T
                    gg = [pp[:, a:b] for pp in f]
                    gg = evolve(
                        gg, wall[:, a:b], None if cls is None else cls[:, a:b],
                        do_force=False,
                    )
                    patches.append(
                        (gg, (slice(None), slice(l0, l1)), slice(T, T + l1 - l0))
                    )
                return patches

            def store_patches(patches):
                for gg, dst, lane_src in patches:
                    for s in range(NSPEEDS):
                        val = gg[s] if lane_src is None else gg[s][:, lane_src]
                        out_ref[(s, *dst)] = val.astype(storage)

            if "whenpatch" in ablate:
                # perf probe for the single-launch design: the whole
                # patch machinery (compute + stores) under a scalar
                # grid-index branch. If Mosaic lowers pl.when around a
                # side-effect-only region to a REAL branch (as the
                # i == 0 warmup/emit_carry regions suggest), the patch
                # cost is paid on one block instead of all — the
                # round-2 "+105 us/step" both-bodies finding applied to
                # value-producing branches, not store-only regions.
                # Physics is intentionally wrong here (patches land
                # before the free store and only on block 0).
                # "whennever" makes the condition statically-unknowable
                # but never true at runtime: isolates the cost of the
                # when-region's mere presence (scheduling conservatism)
                # from the taken branch's execution.
                cond = (
                    i == jnp.int32(2 * n_blocks)
                    if "whennever" in ablate
                    else i == 0
                )

                @pl.when(cond)
                def _():
                    store_patches(compute_patches())
                ff = evolve(list(f), None, None)
                for s in range(NSPEEDS):
                    out_ref[s, :, :] = ff[s].astype(storage)
                return
            # Patch recomputes run FIRST (they read the pristine window
            # f): computing them before the free evolution lets f's
            # planes die progressively inside it instead of staying live
            # end-to-end — the full-liveness variant measured ~+8
            # us/step of VMEM pressure. Patch stores still come LAST so
            # they overwrite the full-block free store.
            patches = compute_patches()
            ff = evolve(list(f), None, None)
            for s in range(NSPEEDS):
                out_ref[s, :, :] = ff[s].astype(storage)
            store_patches(patches)

        def advance_skew():
            """Wavefront (time-skewed) evolution of block b = start + i:
            a FIXED (br + 2)-row window sliding one lattice row per
            step. At time level t the live rows are
            [b*br + T - t, b*br + br + T - t); the two rows below come
            from block b-1's window at the same level, carried across
            the sequential grid in c_ref (seeded at i == 0 from the
            emit_carry trapezoid launch's output). After T steps the
            window IS the block's own output rows — no shrinking
            overlap, so deep temporal blocking costs no extra VPU work.

            The step result bounces through w_ref (an f32 VMEM scratch)
            before the next step's carry concat: rolled values feeding
            a vector concat hard-crash Mosaic's layout pass
            (docs/TUNING.md round-3 notes), while concats of plain ref
            loads are the kernel's standard window assembly. The
            'skewconcat' ablate keeps the direct dataflow instead (a
            hardware compile/perf probe). f32 bouncing keeps bf16
            storage runs bitwise-equal to the trapezoid kernel, which
            also computes whole passes in f32.

            c_ref keeps each 2-row carry level in its own 8-row slot
            (tile-boundary-aligned masked accesses, the safest subtile
            shape for Mosaic); the HBM seed stays compact at 2 rows per
            level — it crosses HBM once per pass."""
            @pl.when(i == 0)
            def _():
                for t in range(T):
                    c_ref[:, 8 * t : 8 * t + 2, :] = carr_in[
                        :, 2 * t : 2 * t + 2, :
                    ].astype(jnp.float32)

            direct = "skewconcat" in ablate
            ff = None
            for t in range(T):
                if t == 0:
                    # rows [b*br + T, b*br + br + T) at t=0: plain loads
                    # from the two resident staged blocks
                    cur = [
                        jnp.concatenate(
                            [fbody[s_body, s, T:], fbody[s_bot, s, :T]],
                            axis=0,
                        ).astype(dtype)
                        for s in range(NSPEEDS)
                    ]
                elif direct:
                    cur = ff
                else:
                    for s in range(NSPEEDS):
                        w_ref[s] = ff[s]
                    cur = [w_ref[s][...] for s in range(NSPEEDS)]
                win = []
                for s in range(NSPEEDS):
                    # read block b-1's level-t carry, then replace it in
                    # place with mine for block b+1 (my window's top two
                    # rows at level t — program order keeps the load
                    # before the store)
                    c_t = c_ref[s, 8 * t : 8 * t + 2, :]
                    win.append(jnp.concatenate([c_t, cur[s]], axis=0))
                    c_ref[s, 8 * t : 8 * t + 2, :] = cur[s][br - 2 :, :]
                if "force" not in ablate:
                    win = forced(win, None)
                ff = stream_collide_window(win, None, None)
            for s in range(NSPEEDS):
                out_ref[s, :, :] = ff[s].astype(storage)

        def advance_flat():
            """Flat (multipass) step: free evolve + parity-indexed
            write-behind output DMA + the cross-pass VMEM carry."""
            j_glob = p_pass * jnp.int32(n_blocks) + i
            oslot = _rem(j_glob, 2)

            def out_copy(pp, ii, oslot_):
                # pass pp writes parity (pp+1) % 2 (chunks start at 0)
                par_o = _rem(pp + 1, 2)
                return pltpu.make_async_copy(
                    obody.at[oslot_],
                    out2.at[par_o, :, pl.ds(ii * jnp.int32(br), br), :],
                    osem.at[oslot_],
                )

            # write-behind discipline: the slot's previous DMA (issued
            # two steps ago) must finish before its VMEM is overwritten.
            # This wait also transitively orders every cross-pass HBM
            # read after the write it depends on (the read's issue
            # begins >= nb-3 steps after this wait confirms the write).
            @pl.when(j_glob >= 2)
            def _():
                jj = j_glob - 2
                out_copy(
                    jj // jnp.int32(n_blocks), _rem(jj, n_blocks), oslot
                ).wait()

            ff = evolve(list(f), None, None)
            # cross-pass carry: this pass's last block's top-halo rows
            # for the next pass's block 0, stored in the storage dtype
            # so the carry path is bitwise-equal to an HBM round trip.
            # Written UNCONDITIONALLY by every block — the last writer
            # of pass p is block nb-1, exactly the value pass p+1's
            # block 0 reads, and the tiny (T, nyp) store is far cheaper
            # than a pl.when region's static scheduling tax
            # (docs/TUNING.md).
            if "nocarry" not in ablate:
                for s in range(NSPEEDS):
                    c2_ref[s] = ff[s][br - T :].astype(storage)

            for s in range(NSPEEDS):
                obody[oslot, s] = ff[s].astype(storage)
            out_copy(p_pass, i, oslot).start()

            @pl.when(j_glob == jnp.int32(multipass * n_blocks - 1))
            def _():
                # chunk end: drain both in-flight output DMAs
                out_copy(p_pass, i, oslot).wait()
                jj = j_glob - 1
                out_copy(
                    jj // jnp.int32(n_blocks), _rem(jj, n_blocks), _rem(jj, 2)
                ).wait()

        # wall_mode=False is the wall-free fast variant: no mask, no
        # bounce-back selects — where(False, a, b) == b exactly, so it is
        # bitwise-identical to the masked variant on solid-free windows.
        # The choice is STATIC (per kernel): a dynamic per-window branch
        # (pl.when or lax.cond on a solid flag) measured +110 us/step on
        # v5e — Mosaic predicates vector regions by executing both
        # bodies. The runner instead partitions the grid into circular
        # block segments (wall_segments) and launches the right kernel
        # variant per segment.
        if multipass:
            advance_flat()
        else:
            advance(wall_mode and "walls" not in ablate)

    return kernel


@functools.lru_cache(maxsize=64)
def make_step(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    interpret: bool = False,
    temporal: int = 1,
    external_halo: bool = False,
    slots: int | None = None,
    wall_spec=None,
    has_slip: bool = False,
    ablate: frozenset = frozenset(),
    lpad: int | None = None,
    start: int = 0,
    length: int | None = None,
    wall_mode: bool = True,
    row_shift: int = 0,
    fast_math: bool = False,
    rdma: bool = False,
    axis: str = "x",
    region=None,
    panels: int = 1,
    emit_carry: bool = False,
    skew: bool = False,
):
    """Jittable padded-state half-step:
    (f_src, dst_donor, walls_padded_f32, [halos...], refresh) -> f_new,
    where f_new reuses dst_donor's HBM buffer in place
    (input_output_aliases). Call twice per timestep pair with buffer
    roles swapped — fixed roles per scan iteration keep XLA from
    inserting carry copies. `refresh` is a (1,) int32 flag: nonzero
    makes the kernel re-mirror the pad lanes of every staged block
    (raise it every refresh_interval() passes).

    start/length/wall_mode select a circular block segment and its
    kernel variant (see _make_kernel): only that segment's output rows
    are written; the rest of the (aliased) donor buffer is untouched,
    so chaining segment calls composes a full pass.

    f: (9, nx, nyp) in the mirror-pad layout (pick_layout / pad_state):
    real columns at lanes [lpad, lpad+ny), pad lanes holding the
    periodic continuation. walls: (nx, nyp) float32 0/1 padded the same
    way. With has_slip the walls plane instead carries solid-class codes
    0/1/2/3 (fluid / bounce-back / slip_x / slip_y) — free-slip walls
    ride the existing mask DMA for free.
    """
    dtype = np.dtype(cfg.dtype).type
    itemsize = np.dtype(cfg.dtype).itemsize
    if lpad is None:
        # centered mirror-pad layout, consistent with pick_layout(ny, T)
        # when nyp came from it (the old lpad=0 default failed the
        # pad-depth validation for every temporal >= 1)
        lpad = (nyp - cfg.ny) // 2
    if has_slip and wall_spec is not None:
        raise ValueError("slip masks are arbitrary; use the DMA mask path")
    if rdma and interpret:
        raise ValueError(
            "the rdma halo kernel has no interpret-mode support (remote "
            "DMA under shard_map hangs/mis-shapes in jax 0.9 interpret "
            "modes; see docs/SCALING.md) — use the ppermute path off-TPU"
        )
    walls_dma = wall_spec is None
    if slots is None:
        w_eff = nyp if panels == 1 else nyp // panels + 2 * LANE
        slots = (
            6
            if _vmem_need(br, 6, w_eff, itemsize, temporal, walls_dma, skew)
            <= VMEM_BUDGET
            else 4
        )
    kernel = _make_kernel(
        cfg, nx, nyp, br, dtype, temporal, external_halo, slots, wall_spec, has_slip,
        ablate, lpad, start, length, wall_mode, row_shift, fast_math, rdma, axis,
        region, panels, emit_carry, skew,
    )
    PW = nyp if panels == 1 else nyp // panels + 2 * LANE
    PP = nyp // panels
    n_blocks = nx // br
    if length is None:
        length = n_blocks
    stage_walls = walls_dma and wall_mode
    HR = RDMA_HR  # rdma edge-slab rows (8-row DMA alignment)

    in_specs = [
        # pinned to HBM (not ANY): with ANY the compiler may promote
        # small arrays to VMEM, where dynamic-row DMA slices hit
        # Mosaic's tile-alignment restriction
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),  # donor (buffer reuse only)
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    need_top = external_halo and start == 0
    need_bot = external_halo and start + length == n_blocks
    if external_halo:
        T = temporal
        halo_spec = pl.BlockSpec(
            (NSPEEDS, T, nyp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        whalo_spec = pl.BlockSpec((T, nyp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if not rdma:
            in_specs += [halo_spec] * (need_top + need_bot)
        if walls_dma:
            # wall halos only where the mask is actually read: the
            # wall-free (wall_mode=False) launch variant never stages
            # walls, so a union-free sharded edge takes only the f halo
            in_specs += [whalo_spec] * (
                ((need_top + need_bot) if stage_walls else 0)
                if not rdma else 2
            )
        else:
            # shard's global row offset, (1,) int32 in SMEM
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    # skew carry seed: the emit_carry launch's (9, 2T, nyp) f32 output
    if skew:
        in_specs += [
            pl.BlockSpec(
                (NSPEEDS, 2 * temporal, nyp),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    # pad-remirror flag, (1,) int32 in SMEM (always the last input)
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]

    if rdma:
        out_index = lambda i: (
            0,
            jax.lax.rem(i + jnp.int32(1), jnp.int32(n_blocks)),
            0,
        )
    elif panels > 1:
        out_index = lambda p, i: (0, i + start, p)  # affine runs only
    elif start == 0 and length == n_blocks:
        out_index = lambda i: (0, i, 0)
    elif start + length <= n_blocks:
        out_index = lambda i: (0, i + start, 0)
    else:  # the (at most one) circularly wrapping segment
        out_index = lambda i: (
            0,
            jax.lax.rem(i + jnp.int32(start), jnp.int32(n_blocks)),
            0,
        )

    out_shape = jax.ShapeDtypeStruct((NSPEEDS, nx, nyp), cfg.dtype)
    out_specs = pl.BlockSpec((NSPEEDS, br, PP), out_index, memory_space=pltpu.VMEM)
    if emit_carry:
        # the skew seed: this run's last block's window top-2 rows per
        # time level, f32 (the compute precision — keeps bf16 runs
        # bitwise-equal to the all-trapezoid chain)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((NSPEEDS, 2 * temporal, nyp), np.float32),
        )
        out_specs = (
            out_specs,
            pl.BlockSpec(
                (NSPEEDS, 2 * temporal, nyp),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
    if rdma:
        # comm buffers: the neighbors' remote DMAs land here. Outputs
        # (not scratch) so the buffers have symmetric addresses across
        # the SPMD shards; the caller discards them.
        comm = jax.ShapeDtypeStruct((NSPEEDS, HR, nyp), cfg.dtype)
        comm_spec = pl.BlockSpec(
            (NSPEEDS, HR, nyp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = (out_shape, comm, comm)
        out_specs = (out_specs, comm_spec, comm_spec)

    step = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(length,) if panels == 1 else (panels, length),
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={1: 0},
        scratch_shapes=(
            [pltpu.VMEM((slots, NSPEEDS, br, PW), cfg.dtype)]  # rotating body slots
            + ([pltpu.VMEM((slots, br, PW), jnp.float32)] if stage_walls else [])
            + [pltpu.SemaphoreType.DMA((slots, 2 if stage_walls else 1))]
            + ([pltpu.VMEM((2, NSPEEDS, HR, nyp), cfg.dtype),
                pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
               if rdma else [])
            + ([pltpu.VMEM((NSPEEDS, 8 * temporal, nyp), jnp.float32),  # carry
                pltpu.VMEM((NSPEEDS, br, nyp), jnp.float32)]            # bounce
               if skew else [])
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * (2 if panels > 1 else 1),
            # raise the default 16MB scoped-vmem cap so larger row blocks
            # and deeper temporal windows fit (v5e has 128MB VMEM)
            vmem_limit_bytes=112 * 1024 * 1024,
            **({"has_side_effects": True} if rdma else {}),
            **({"collective_id": 13}
               if rdma and "nobarrier" not in ablate else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(124 * br * length * nyp * temporal),
            bytes_accessed=int(
                (2 * NSPEEDS * itemsize + (4 if stage_walls else 0))
                * br * length * nyp
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    return step


@functools.lru_cache(maxsize=16)
def make_flat_step(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    interpret: bool,
    temporal: int,
    lpad: int,
    multipass: int,
    slots: int | None = None,
    fast_math: bool = False,
    ablate: frozenset = frozenset(),
):
    """Jittable FLAT multi-pass step (see _make_kernel's multipass note):
    (f2, phase) -> f2', advancing multipass * temporal timesteps in ONE
    kernel launch. f2 is the stacked (2, 9, nx, nyp) ping-pong pair in
    the mirror-pad layout with the live state at parity 0; f2' reuses
    its buffer in place (input_output_aliases) and returns the final
    state at parity 0 again (multipass is even). phase is the absolute
    pass index of the chunk's first pass, (1,) int32 — it phases the
    in-kernel pad-refresh cadence exactly like the classic runner's
    rem(p0, K) == 0 flag. Wall-free lattices only (the wall path keeps
    per-pass launches; docs/TUNING.md explains why)."""
    dtype = np.dtype(cfg.dtype).type
    itemsize = np.dtype(cfg.dtype).itemsize
    if slots is None:
        slots = (
            6
            if _vmem_need(br, 6 + 2, nyp, itemsize, temporal, False)
            <= VMEM_BUDGET
            else 4
        )
    kernel = _make_kernel(
        cfg, nx, nyp, br, dtype, temporal, slots=slots, wall_spec=(),
        ablate=ablate, lpad=lpad, wall_mode=False, fast_math=fast_math,
        multipass=multipass,
    )
    n_blocks = nx // br
    T = temporal

    def body(f2_in, phase_ref, out2, *scratch):
        # adapt to the shared kernel signature: f_hbm/donor/walls are
        # unused in flat mode (all reads and writes go through out2,
        # the aliased in/out buffer)
        return kernel(f2_in, None, None, phase_ref, out2, *scratch)

    step = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((2, NSPEEDS, nx, nyp), cfg.dtype),
        grid=(multipass, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((slots, NSPEEDS, br, nyp), cfg.dtype),  # staging
            pltpu.SemaphoreType.DMA((slots, 1)),
            pltpu.VMEM((2, NSPEEDS, br, nyp), cfg.dtype),      # out write-behind
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((NSPEEDS, T, nyp), cfg.dtype),          # cross-pass carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(124 * br * n_blocks * nyp * temporal * multipass),
            bytes_accessed=int(
                2 * NSPEEDS * itemsize * br * n_blocks * nyp * multipass
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    return step


def class_plane(walls, slip_x=None, slip_y=None):
    """Solid-class codes as one float32 plane: 0 fluid, 1 bounce-back
    wall, 2 slip_x, 3 slip_y. Precedence walls > slip_x > slip_y (the
    xla backend's documented overlap rule)."""
    walls = jnp.asarray(walls, bool)
    cls = walls.astype(jnp.float32)
    if slip_y is not None:
        cls = jnp.where(jnp.asarray(slip_y, bool) & ~walls, jnp.float32(3.0), cls)
    if slip_x is not None:
        cls = jnp.where(jnp.asarray(slip_x, bool) & ~walls, jnp.float32(2.0), cls)
    return cls


def pad_state(f, walls, cfg: LatticeConfig, nyp: int, lpad: int,
              row_shift: int = 0):
    """Embed (9, NX, NY) state into the (9, NX, NYP) mirror-pad layout
    (pick_layout): real columns at lanes [lpad, lpad+ny), pad lanes on
    both sides holding the periodic continuation of the lattice — the
    lane-boundary analog of the reference's NYPADDED stride padding
    (src/latticeboltzmann.c:69-76), except the pads carry live mirror
    values so the kernel's y wrap is a pure lane roll. `walls` may be a
    bool mask or a float32 class-code plane (see class_plane); its pads
    mirror the real wall pattern so pad-site dynamics mirror real sites.

    row_shift rotates the x axis (storage row r holds physical row
    (r + row_shift) mod NX — exact for the periodic lattice; see
    wall_partition). unpad_state inverts both transformations."""
    ny = cfg.ny
    idx = (np.arange(nyp) - lpad) % ny  # lane -> real column, multi-wrap
    f_p = jnp.asarray(f)
    walls_p = jnp.asarray(walls).astype(jnp.float32)
    if row_shift:
        # one fused gather (row rotation x lane mirror): two chained
        # gathers held a second full-lattice temporary, which OOM'd the
        # 4000x16000 (2.3 GB/buffer) config
        ridx = (np.arange(f_p.shape[1]) + row_shift) % f_p.shape[1]
        return f_p[:, ridx[:, None], idx[None, :]], walls_p[ridx[:, None], idx[None, :]]
    return f_p[:, :, idx], walls_p[:, idx]


_pad_state_jit = jax.jit(
    pad_state, static_argnums=(2, 3, 4, 5), donate_argnums=(0,)
)


def _pad_state_donated(f, walls, cfg, nyp, lpad, row_shift=0):
    """Donating form for the top-level runners: frees the unpadded
    state's HBM buffer once the padded copy exists, instead of keeping
    both live for the whole run — 2.3 GB of headroom at 4000x16000.
    The shapes differ, so XLA cannot ALIAS the donation and warns
    "donated buffers were not usable"; the donation is deliberate for
    its lifetime effect alone, so that warning is suppressed here."""
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable"
        )
        return _pad_state_jit(f, walls, cfg, nyp, lpad, row_shift)


def unpad_state(f_p, cfg: LatticeConfig, lpad: int, row_shift: int = 0):
    """Invert pad_state: (9, NX, NYP) storage layout -> (9, NX, NY)."""
    if row_shift:
        nx = f_p.shape[1]
        ridx = (np.arange(nx) - row_shift) % nx
        cols = lpad + np.arange(cfg.ny)
        return f_p[:, ridx[:, None], cols[None, :]]  # one fused gather
    return f_p[:, :, lpad : lpad + cfg.ny]


# default temporal-blocking depth for f32 at full-size blocks. T=3
# measured fastest on v5e with the round-3 region kernel (800x4000 f32
# slope-timed: T=3 160.3 us/step = 19,968 MLUPS vs T=4 167.8 / T=5
# 184.2): the DMA per step grows to ~123 us (from 92 at T=4) but stays
# under the VPU time, while the temporal window's overlap arithmetic
# drops from 25% to 18.75% of rows. bf16 and VMEM-capped shapes default
# to T=2 (see _plan).
DEFAULT_TEMPORAL = 3

# wavefront time-skewing default for the wall-free segment launches
# (see _make_kernel's skew docstring / _make_pass). Off until the
# on-chip measurement flips it; Session/run_steps take an explicit
# override either way.
SKEW_DEFAULT = False


def _pick_panels(nx: int, nyp: int, itemsize: int, walls_dma: bool):
    """(block_rows, n_panels) for the 2-D lane-panel grid: the largest
    row block whose panel window (nyp/n + 256 lanes) fits the VMEM
    budget with 6 staging slots, at the fewest panels. (0, 1) when no
    panel split helps."""
    nlb = nyp // LANE
    for br in (32, 40, 24):
        if nx % br:
            continue
        for n in range(2, nlb + 1):
            if nlb % n:
                continue
            pw = nyp // n + 2 * LANE
            if pw > nyp:
                continue
            if _vmem_need(br, 6, pw, itemsize, 4, walls_dma) <= VMEM_BUDGET:
                return br, n
    return 0, 1


def _plan(cfg: LatticeConfig, nx: int, mask, temporal, interpret, walls_dma,
          allow_panels: bool = True, skew: bool = False):
    """Shared launch planning for run_steps / run_steps_probed:
    (nyp, lpad, br, temporal, row_shift, segs, panels), or None to fall
    back to the XLA engine (odd shapes, float64, degenerate widths)."""
    t0 = DEFAULT_TEMPORAL if temporal is None else temporal
    nyp, lpad = pick_layout(cfg.ny, max(t0, 1))
    itemsize = np.dtype(cfg.dtype).itemsize
    br = pick_block_config(nx, nyp, itemsize, walls_dma=walls_dma, skew=skew)[0]
    panels = 1
    if allow_panels and br == 0:
        # the 2-D lane-panel grid: a capability fallback for lattices so
        # wide that NO full-width row block fits VMEM. It is not a perf
        # win where both work (4000x16000 f32: 12.5k panel vs 15.7k
        # single-launch — the 256 re-staged halo lanes per panel and the
        # dynamic-offset forcing cost more than BR=32 recovers), so it
        # only engages when the alternative is the XLA fallback.
        br2, p2 = _pick_panels(nx, nyp, itemsize, walls_dma)
        if p2 > 1 and br2 > 0:
            br, panels = br2, p2
    if br == 0 or np.dtype(cfg.dtype) == np.float64 or cfg.ny < max(t0, 1):
        return None
    if temporal is not None and not (1 <= temporal <= br):
        # fail fast at plan time: _make_kernel's own T<=br check would
        # otherwise surface only after minutes of tunnel compile, and a
        # negative fbody[..., br-T:] slice gives an opaque shape error
        raise ValueError(
            f"temporal={temporal} must be in [1, {br}] (block rows at "
            f"nx={nx}, ny={cfg.ny}, {np.dtype(cfg.dtype).name})"
        )
    if temporal is None:
        # interpreter mode is a semantics tool — temporal blocking only
        # multiplies its cost. T=2 measured fastest for bf16 (19.2k vs
        # 18.2k at 800x4000: halved traffic moves the DMA/VPU balance)
        # and for VMEM-capped BR<32 shapes (4000x16000 f32: 15.7k vs
        # 14.1k at T=4: shallower windows lose less to row overlap).
        temporal = 1 if interpret else min(
            2
            if (np.dtype(cfg.dtype) == np.dtype("bfloat16") or br < 32)
            else DEFAULT_TEMPORAL,
            br,
        )
    # huge lattices (>1 GB/buffer) once had to opt out of segmentation:
    # with pad/advance fused in one jit, the chained segment launches
    # held unaliased full-lattice temporaries and ResourceExhausted the
    # chip at 4000x16000 f32 (docs/TUNING.md round-3 notes). With the
    # Session phase split (pad_state in its own dispatch; the runner jit
    # holds only f_p + scratch) the 4-launch region partition fits and
    # measures ~17.1k vs 15.7k MLUPS for the single masked launch.
    if mask is None:  # plan-only probe (no geometry): one masked launch
        row_shift, segs = 0, ((0, None, True, None),)
    elif panels > 1:
        # panels x segmentation (round 4): the panel kernel accepts
        # affine partial block runs, so wide lattices get the same
        # launch partition as the headline path. Recompute regions are
        # the one thing the panel kernel still rejects — degrade region
        # runs to full-window selects (still launch-partitioned).
        row_shift, segs = wall_partition_regions(
            np.asarray(mask), br, temporal, cfg.ny, nyp, lpad
        )
        segs = tuple((s, ln, wm, None) for (s, ln, wm, _r) in segs)
        nb_ = nx // br
        if any(s + (ln or nb_) > nb_ for (s, ln, _w, _r) in segs):
            # a wrapping run (shouldn't arise post-rotation): fall back
            # to the round-3 single masked launch
            wm = bool((np.asarray(mask, np.float64) > 0).any())
            row_shift, segs = 0, ((0, None, wm, None),)
    else:
        row_shift, segs = wall_partition_regions(
            np.asarray(mask), br, temporal, cfg.ny, nyp, lpad
        )
    return nyp, lpad, br, temporal, row_shift, segs, panels


def _segs_at(cfg: LatticeConfig, nx: int, mask, br: int, temporal: int,
             nyp: int, lpad: int, row_shift: int):
    """Re-partition at a different temporal depth than the main plan's
    (the remainder and probed runners step at T=1) keeping the rotation
    the state was padded with — select regions anchor to the window
    height br + 2*T, so a T=4 region is misaligned in a T=1 kernel."""
    if 9 * nx * nyp * np.dtype(cfg.dtype).itemsize > 10**9:
        # DELIBERATE remainder-only opt-out (the main pass segments at
        # every size since the Session phase split removed _plan's >1 GB
        # opt-out): remainder/probed T=1 passes run a handful of steps
        # per call, so their partition would buy microseconds while its
        # extra launch chain re-raises the >1 GB liveness pressure the
        # split fixed — one full-mask launch is the safe, cheap choice
        return ((0, None, True, None),)
    return wall_partition_regions(
        np.asarray(mask), br, temporal, cfg.ny, nyp, lpad, rebase=row_shift
    )[1]


def _flag(x):
    """Traced bool -> (1,) int32 SMEM-shaped refresh flag."""
    return jnp.reshape(jnp.asarray(x, jnp.int32), (1,))


def wall_segments(walls, br: int, temporal: int):
    """Partition the row blocks into circularly-contiguous runs of
    solid-containing and solid-free temporal windows.

    Window b covers rows [b*br - T, b*br + br + T) with periodic x wrap.
    Returns a tuple of (start, length, wall_mode) runs covering every
    block exactly once; the runner launches the masked or wall-free
    kernel variant per run. For the reference scene (channel + barrier,
    src/latticeboltzmann.c:567-578) this is two runs — the walls hug
    row 0/NX-1 and the barrier rows — and 68% of blocks take the
    select-free fast kernel."""
    m = np.asarray(walls)
    row = (m.astype(np.float64) > 0).any(axis=1)
    nx = row.shape[0]
    T = temporal
    nb = nx // br
    ext = np.r_[row[nx - T :], row, row[:T]]
    flags = np.array([ext[b * br : b * br + br + 2 * T].any() for b in range(nb)])
    if flags.all() or not flags.any():
        return ((0, nb, bool(flags.any())),)
    s0 = next(b for b in range(nb) if flags[b] != flags[b - 1])
    runs = []
    run_start, run_flag, run_len = s0, bool(flags[s0]), 0
    for k in range(nb):
        b = (s0 + k) % nb
        if bool(flags[b]) != run_flag:
            runs.append((run_start, run_len, run_flag))
            run_start, run_flag, run_len = b, bool(flags[b]), 0
        run_len += 1
    runs.append((run_start, run_len, run_flag))
    return tuple(runs)


def wall_partition(walls, br: int, temporal: int):
    """(row_shift, segments): wall_segments rebased by a storage-row
    rotation so every segment is an affine (non-wrapping) block run.

    The lattice is x-periodic, so storing it rotated by row_shift is an
    exact relabeling; it buys two things measured on v5e: the circularly
    wrapping segment's `rem` output index map cost +12.5 us/step (it
    defeats Mosaic's output pipelining), and rebasing merges the wrapped
    run into one launch (each extra launch costs ~36-48 us/pass of DMA
    pipeline drain + refill — see LAUNCH_COST_PASS_UNITS). Segments
    write disjoint output rows from the same input state, so their order
    within a pass is free; masked runs go first — masked-first measured
    ~13 us/step faster than free-first on v5e."""
    segs = wall_segments(walls, br, temporal)
    if len(segs) == 1:
        return 0, segs
    nb = np.asarray(walls).shape[0] // br
    s0 = segs[0][0]
    rebased = tuple(((s - s0) % nb, ln, w) for (s, ln, w) in segs)
    rebased = tuple(sorted(rebased, key=lambda t: (not t[2], t[0])))
    return s0 * br, rebased


# fixed cost per recompute instance in the region cost model, in
# row x lane-block units (~0.5 us of per-sub-window sequencing measured
# on v5e; see wall_partition_regions). Tests zero it to force the
# region kernel on CPU-sized lattices where it would not otherwise pay.
REGION_FIXED_COST = 300.0

# Fixed cost of one extra kernel launch per pass, in the same
# row x lane-block units (1216 units ~= 2.1 us/step, the measured
# full-mask select cost of one BR=32 block). Measured directly on v5e
# (scripts/anatomy.py --section launchtax, 800x4000 f32 T=3): splitting
# a single all-free launch into 2 launches costs +15.9 us/step and into
# 3 launches +24.3 us/step (~36-48 us per pass per extra launch).
# Notably this is NOT a universal drain+refill toll — the flat
# multipass experiment (make_flat_step, docs/TUNING.md) showed the
# pass-to-pass kernel boundary costs ~nothing; the tax is specific to
# chaining ADDITIONAL donated launches inside one pass. Per-step units
# scale as 1/temporal. The old hardcoded 2400 (~4 us/pass)
# underestimated this ~10x and made the DP over-split: the reference
# scene's 3-launch region partition measured 168.7 us/step vs
# 162.9-165.1 for the 2-launch coarse partition in the same session.
#
# Round-5 note: slim halo-role staging HALVED the raw boundary tax
# (free 1L->2L +6.9, ->3L +15.9 us/step total), but do NOT re-derive
# this constant from that alone: at <=12000 the DP flips the reference
# scene to a 3-launch (2-block full-mask + 6-block regions) plan that
# MEASURES ~9 us/step WORSE than the 2-launch plan in an interleaved
# A/B (168.2-170.1 vs 159.6-160.3; docs/TUNING.md round-5) — the
# regions run's real cost exceeds its model by more than the boundary
# got cheaper. 24000 keeps selecting the measured-optimal plan on
# every scene measured; treat it as a calibrated plan selector, not a
# pure boundary price.
LAUNCH_COST_PASS_UNITS = 24000.0


def _bands(values, gap: int, bound: int):
    """Sorted ints -> merged half-open (lo, hi) bands, closing gaps <=
    gap (a 2-row gap between select patches costs more in concat edges
    than it saves in select width)."""
    bands: list[list[int]] = []
    for v in sorted(values):
        if bands and v - bands[-1][1] <= gap:
            bands[-1][1] = v + 1
        else:
            bands.append([v, v + 1])
    return tuple((lo, min(hi, bound)) for lo, hi in bands)


def _region_partitioner(sub_b, br: int, temporal: int, ny: int, nyp: int,
                        lpad: int, launch_cost: float):
    """The shared region-decomposition + launch-split machinery over
    per-block (R, nyp) wall submasks (None = solid-free window), used by
    both the local partition (wall_partition_regions) and the sharded
    union partition (shard_partition_regions). Returns
    (region_of, split_run)."""
    T = temporal
    R = br + 2 * T
    nlb = nyp // LANE
    # lanes the recompute sub-windows must avoid: forcing is applied by
    # a full-width-coordinate patch the lane sub-windows cannot express
    force_lanes = {j for j in range(nyp) if (j - lpad) % ny == 0}

    def region_of(blocks):
        """Decompose the run's wall cells into row-type rows (span many
        lanes -> recompute the row band at full width) and lane-type
        lanes (the rest -> recompute the 128-aligned lane band at full
        height). None = infeasible or not worth it -> full-mask kernel."""
        u = np.zeros((R, nyp), bool)
        for b in blocks:
            u |= sub_b[b]
        spans = np.zeros(R, int)
        for r in np.nonzero(u.any(axis=1))[0]:
            lanes_r = np.nonzero(u[r])[0]
            spans[r] = lanes_r[-1] - lanes_r[0] + 1
        row_type = spans > nyp // 4
        lane_cells = u & ~row_type[:, None]
        row_bands = _bands(np.nonzero(row_type)[0].tolist(), 2 * T + 8, R)
        # Expand wall lanes by T before snapping to 128-lane blocks: the
        # stored band is exactly [l0, l1) (advance_region's lane patches
        # cannot over-store past the 128-aligned edge the way row patches
        # extend their store by T), so every wall cell must sit >= T
        # lanes INSIDE its band or the free evolution's contamination
        # leaks past the band edge unpatched (a wall at lane 128 with
        # T=3 corrupts lanes 125-127 of the free result).
        wall_lanes = np.nonzero(lane_cells.any(axis=0))[0]
        if wall_lanes.size:
            wall_lanes = np.concatenate(
                [wall_lanes - T, wall_lanes, wall_lanes + T]
            ).clip(0, nyp - 1)
        lane_blocks = np.unique(wall_lanes // LANE)
        lane_bands = tuple(
            (lo * LANE, min(hi * LANE, nyp)) for lo, hi in _bands(lane_blocks.tolist(), 1, nlb)
        )
        for l0, l1 in lane_bands:
            if l0 - T < 0 or l1 + T > nyp:
                return None  # band touches the lane edge: no input margin
            if any(l0 - T <= j < l1 + T for j in force_lanes):
                return None  # forcing inside the sub-window (see evolve)
        if _region_area(row_bands, lane_bands) >= R * nlb:
            return None  # full-mask selects beat the recompute structure
        return (row_bands, lane_bands)

    def _region_area(row_bands, lane_bands):
        """Per-block recompute cost in row x lane-block units, including
        a measured fixed cost per recompute instance (~0.5 us of
        sequencing per sub-window evolution = ~300 units): without it
        the DP chose regions for runs like the reference's channel run,
        whose 2-block row-band recomputes cost more than the 2 full-mask
        selects they replace (measured 170.0 vs 169.6 us/step)."""
        rows_cost = sum(
            (min(hi + T, br + T) - max(lo - T, T) + 2 * T) for lo, hi in row_bands
        ) * nlb
        lanes_cost = sum((l1 - l0) // LANE + 1 for l0, l1 in lane_bands) * R
        return rows_cost + lanes_cost + REGION_FIXED_COST * (
            len(row_bands) + len(lane_bands)
        )

    def area(blocks):
        reg = region_of(blocks)
        if reg is None:
            return R * nlb
        return _region_area(*reg)

    def split_run(blocks):
        """Interval DP: partition one contiguous masked run into groups
        minimizing total select area + per-launch fixed cost."""
        mlen = len(blocks)
        best = [0.0] + [float("inf")] * mlen
        cut = [0] * (mlen + 1)
        for j in range(1, mlen + 1):
            for i in range(j):
                c = best[i] + launch_cost + (j - i) * area(blocks[i:j])
                if c < best[j]:
                    best[j], cut[j] = c, i
        groups, j = [], mlen
        while j > 0:
            groups.append(blocks[cut[j] : j])
            j = cut[j]
        return list(reversed(groups))

    return region_of, split_run


def shard_partition_regions(
    mask, n_dev: int, br: int, temporal: int, ny: int, nyp: int, lpad: int,
    launch_cost: float | None = None,
):
    """(top_wall_mode, interior_runs, bot_wall_mode): the wall-
    specialization partition for the sharded external-halo path.

    SPMD requires ONE launch set shared by every shard, so the local
    block grid [0, nb) is partitioned by the UNION of the per-shard
    window masks: a block's temporal window is masked iff it contains a
    solid site in ANY shard (a select-free launch stays exact on every
    shard; shards whose window happens to be free just take the masked
    kernel's where(False, ...) = identity). On a 1-device mesh the
    union IS the local partition, recovering the single-chip
    specialization; multi-device it is conservative by construction.

    interior_runs covers local blocks [1, nb-1) as affine
    (start, length, wall_mode, region) runs — these launches take no
    halo inputs, preserving the comm/compute-overlap schedule (the
    interior compute has no data dependency on the ppermute,
    README.md:45-51). The two edge blocks stay separate halo-consuming
    launches; their union flags (returned as
    top_wall_mode / bot_wall_mode) include the neighbor shard's halo
    rows, with global x wrap. With nb < 3 there is no interior:
    interior_runs is () and both flags conservatively OR together
    (callers keep the single full-shard launch)."""
    if launch_cost is None:
        launch_cost = LAUNCH_COST_PASS_UNITS / temporal
    m = np.asarray(mask, np.float64) > 0
    nx = m.shape[0]
    T = temporal
    L = nx // n_dev
    nb = L // br
    m_p = m[:, (np.arange(nyp) - lpad) % ny]

    def window_union(b):
        # local block b's window rows in every shard, with global wrap
        # (only the edge blocks' windows actually leave their shard)
        rows = (
            np.arange(b * br - T, b * br + br + T)[None, :]
            + np.arange(n_dev)[:, None] * L
        ) % nx
        return m_p[rows].any(axis=0)

    sub_b = []
    for b in range(nb):
        u = window_union(b)
        sub_b.append(u if u.any() else None)
    top_wm = sub_b[0] is not None
    bot_wm = sub_b[nb - 1] is not None
    if nb < 3:
        any_wm = top_wm or bot_wm
        return any_wm, (), any_wm
    region_of, split_run = _region_partitioner(
        sub_b, br, temporal, ny, nyp, lpad, launch_cost
    )
    runs: list[list[int]] = [[1]]
    for b in range(2, nb - 1):
        if (sub_b[b] is not None) != (sub_b[runs[-1][-1]] is not None):
            runs.append([b])
        else:
            runs[-1].append(b)
    out = []
    for run in runs:
        if sub_b[run[0]] is not None:
            for g in split_run(run):
                out.append((g[0], len(g), True, region_of(g)))
        else:
            out.append((run[0], len(run), False, None))
    # masked runs first (measured faster on the local path); edges are
    # appended by the caller and must stay last (they consume the halos)
    out.sort(key=lambda t: (not t[2], t[0]))
    return top_wm, tuple(out), bot_wm


def shard_partition_regions_sync(
    mask, n_dev: int, br: int, temporal: int, ny: int, nyp: int, lpad: int,
    launch_cost: float | None = None,
):
    """Full-range union partition for the SYNCHRONOUS sharded schedule:
    runs of (start, length, wall_mode, region) covering local blocks
    [0, nb) — the edge blocks are merged into their adjacent runs
    instead of living in dedicated one-block launches. The runs whose
    span contains block 0 / nb-1 consume the f halos (make_step's
    need_top/need_bot); every other launch still has no data dependency
    on the ppermute, so partial overlap survives for free. vs
    shard_partition_regions this trades the guaranteed-overlap edge
    launches (2 extra launch boundaries, ~16 us/step each measured) for
    the local path's launch-count economy — the right trade wherever
    halo comm (ICI: ~5-7 us/pass) is cheaper than a launch boundary."""
    if launch_cost is None:
        launch_cost = LAUNCH_COST_PASS_UNITS / temporal
    m = np.asarray(mask, np.float64) > 0
    nx = m.shape[0]
    T = temporal
    L = nx // n_dev
    nb = L // br
    m_p = m[:, (np.arange(nyp) - lpad) % ny]

    def window_union(b):
        rows = (
            np.arange(b * br - T, b * br + br + T)[None, :]
            + np.arange(n_dev)[:, None] * L
        ) % nx
        return m_p[rows].any(axis=0)

    sub_b = [None] * nb
    for b in range(nb):
        u = window_union(b)
        sub_b[b] = u if u.any() else None
    region_of, split_run = _region_partitioner(
        sub_b, br, temporal, ny, nyp, lpad, launch_cost
    )
    runs: list[list[int]] = [[0]]
    for b in range(1, nb):
        if (sub_b[b] is not None) != (sub_b[runs[-1][-1]] is not None):
            runs.append([b])
        else:
            runs[-1].append(b)
    out = []
    for run in runs:
        if sub_b[run[0]] is not None:
            for g in split_run(run):
                out.append((g[0], len(g), True, region_of(g)))
        else:
            out.append((run[0], len(run), False, None))
    # halo-consuming spans last (their launches stall on the ppermute;
    # everything before them overlaps it), masked-first among the rest
    # (measured faster on the local path). Correctness is
    # order-independent: runs write disjoint row ranges of the donor.
    out.sort(key=lambda t: (
        t[0] == 0 or t[0] + t[1] == nb, not t[2], t[0]
    ))
    return tuple(out)


def wall_partition_regions(
    mask, br: int, temporal: int, ny: int, nyp: int, lpad: int,
    launch_cost: float | None = None, rebase: int | None = None,
):
    """(row_shift, runs) with runs of (start, length, wall_mode, region):
    wall_partition refined with a static recompute region per masked run.

    The region decomposes the run's solid sites (in the padded
    storage-lane space — pad lanes mirror real columns, so walls near
    the lattice's column edges also cover their pad mirrors) into
    row-type bands (walls spanning many lanes, e.g. channel walls) and
    128-aligned lane-type bands (walls spanning few lanes, e.g. a thin
    barrier). The kernel then evolves such blocks select-free and
    re-evolves only the band neighborhoods masked (see advance_region).
    Masked runs are split by a small interval DP balancing recompute
    area (rows x lane-blocks per block) against the fixed cost of an
    extra kernel launch. launch_cost is in row x lane-block units (a
    fully-masked 40x32-laneblock block = 1280 units ~= 2.1 us/step
    measured); None uses the measured per-pass boundary tax
    LAUNCH_COST_PASS_UNITS / temporal (~36-48 us of DMA pipeline
    drain + refill per extra launch per pass, measured by
    scripts/anatomy.py --section launchtax — see the constant's note).

    This is what makes the reference scene cheap: its barrier spans 5
    columns (1 lane block of 32) over 200 rows, and its channel walls
    span 2 rows over all lanes — neither should pay full-window selects
    (src/latticeboltzmann.c:437-478 is the reference's analog: a
    per-VECWIDTH any-wall dispatch)."""
    # rebase pins the storage-row rotation to a caller-chosen value (a
    # multiple of br): the remainder/probed runners re-partition at a
    # different temporal depth than the main runner (regions anchor to
    # the window height, which depends on T) but must keep the rotation
    # the state was padded with. Under a pinned rotation one run may
    # wrap circularly — make_step's wrapping index map handles it (a
    # few-step diagnostics path, not the hot loop).
    if launch_cost is None:
        launch_cost = LAUNCH_COST_PASS_UNITS / temporal
    m = np.asarray(mask, np.float64) > 0
    nx = m.shape[0]
    T = temporal
    nb = nx // br
    m_p = m[:, (np.arange(nyp) - lpad) % ny]
    sub_b: list = []  # per-block (R, nyp) wall submask, None when free
    for b in range(nb):
        rr = np.arange(b * br - T, b * br + br + T) % nx
        sub = m_p[rr]
        sub_b.append(sub if sub.any() else None)
    flags = np.array([s is not None for s in sub_b])
    region_of, split_run = _region_partitioner(
        sub_b, br, temporal, ny, nyp, lpad, launch_cost
    )

    if flags.all() or not flags.any():
        wmode = bool(flags.any())
        reg = region_of(list(range(nb))) if wmode else None
        return rebase or 0, ((0, nb, wmode, reg),)
    s0 = next(b for b in range(nb) if flags[b] != flags[b - 1])
    shift = s0 if rebase is None else rebase // br
    runs: list[list[int]] = [[s0]]
    for k in range(1, nb):
        b = (s0 + k) % nb
        if flags[b] != flags[runs[-1][-1]]:
            runs.append([b])
        else:
            runs[-1].append(b)
    out = []
    for run in runs:
        if flags[run[0]]:
            for g in split_run(run):
                out.append(((g[0] - shift) % nb, len(g), True, region_of(g)))
        else:
            out.append(((run[0] - shift) % nb, len(run), False, None))
    out.sort(key=lambda t: (not t[2], t[0]))
    return shift * br, tuple(out)


def _make_pass(cfg, nx, nyp, br, interpret, temporal, wall_spec, has_slip,
               lpad, segs, row_shift=0, fast_math=False, panels=1,
               skew=False):
    """One full kernel pass (temporal steps) as a chain of segment
    launches: each writes its circular block run into the shared aliased
    donor buffer, so the chain composes the whole lattice update. Each
    seg is (start, length, wall_mode[, region]).

    skew=True rewrites each wall-free run of >= 2 blocks (at temporal
    >= 2) into an emit_carry trapezoid launch for its first block plus a
    wavefront launch for the rest (see _make_kernel): the carry output
    of the former feeds the latter, which XLA sequences by the data
    dependency. Masked runs, T=1 remainder passes, and panel grids keep
    the classic trapezoid windows."""
    nb = nx // br
    common = dict(
        wall_spec=wall_spec, has_slip=has_slip, lpad=lpad,
        row_shift=row_shift, fast_math=fast_math, panels=panels,
    )
    steps = []  # (kind, launch): 0 classic, 1 emit_carry, 2 skew
    for seg in segs:
        start, ln, wm = seg[0], seg[1], seg[2]
        reg = seg[3] if len(seg) > 3 else None
        ln_eff = nb if ln is None else ln
        if skew and not wm and panels == 1 and temporal >= 2 and ln_eff >= 2:
            steps.append((1, make_step(
                cfg, nx, nyp, br, interpret, temporal, start=start,
                length=1, wall_mode=False, emit_carry=True, **common,
            )))
            steps.append((2, make_step(
                cfg, nx, nyp, br, interpret, temporal,
                start=(start + 1) % nb, length=ln_eff - 1,
                wall_mode=False, skew=True, **common,
            )))
        else:
            steps.append((0, make_step(
                cfg, nx, nyp, br, interpret, temporal, start=start,
                length=ln, wall_mode=wm, region=reg, **common,
            )))
    steps = tuple(steps)

    def one_pass(src, dst, walls_p, rfl):
        carry = None
        for kind, st in steps:
            if kind == 1:
                dst, carry = st(src, dst, walls_p, rfl)
            elif kind == 2:
                dst = st(src, dst, walls_p, carry, rfl)
            else:
                dst = st(src, dst, walls_p, rfl)
        return dst

    return one_pass


@functools.lru_cache(maxsize=64)
def _make_runner(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    interpret: bool,
    temporal: int,
    wall_spec=None,
    has_slip: bool = False,
    lpad: int = 0,
    segs=((0, None, True),),
    row_shift: int = 0,
    fast_math: bool = False,
    panels: int = 1,
    segs1=None,
    with_remainder: bool = True,
    skew: bool = False,
):
    """One persistent jitted runner per configuration: advances
    2*temporal*n_pairs + 2*k1 + odd steps with DYNAMIC counts
    (fori_loop), so changing the step count never recompiles — the
    remainder (n_steps mod 2*temporal) runs as k1 fixed-role T=1 pairs
    plus at most one swapped-role single pass inside the same program.
    A separate per-remainder compiled program would recompile through
    the tunnel on the first run at each new step count — bench_suite
    round 3 measured that as ~7 s of 'runtime' on an 8.5 s row.
    segs1 is the T=1 segment partition for the remainder passes (select
    regions anchor to the window height br + 2*T, see _segs_at); None
    falls back to the always-correct single full-lattice launch.

    with_remainder=False omits the T=1 remainder machinery entirely
    (k1/odd must then be zero — guarded in Session.advance): the T=1
    pass program costs ~11 s of XLA CPU compile at test sizes, which a
    one-shot caller with a static multiple-of-2T step count never uses.

    Every refresh_interval() passes the kernel re-mirrors the pad lanes
    (see pick_layout); with panels > 1 the kernel cannot (a panel
    window never sees the opposite lattice edge), so the runner
    re-mirrors between passes with two narrow XLA updates in a nested
    super-step loop, and once before the remainder passes."""
    one_pass = _make_pass(
        cfg, nx, nyp, br, interpret, temporal, wall_spec, has_slip, lpad, segs,
        row_shift, fast_math, panels, skew,
    )
    if not with_remainder:
        one_pass1 = None
    elif temporal == 1:
        one_pass1 = one_pass
    else:
        # remainder passes never skew (wavefront needs temporal >= 2)
        one_pass1 = _make_pass(
            cfg, nx, nyp, br, interpret, 1, wall_spec, has_slip, lpad,
            segs1 if segs1 is not None else ((0, None, True, None),),
            row_shift, fast_math, panels,
        )
    K = refresh_interval(lpad, nyp - lpad - cfg.ny, cfg.ny, temporal)
    remirror = _make_remirror_xla(cfg, nyp, lpad) if panels > 1 else None
    # remainder passes re-mirror pads every pass: in-kernel when the
    # kernel can (panels == 1), otherwise via the XLA form applied to
    # each pass's output (its pad lanes are stale up to depth 1 after a
    # T=1 pass; the narrow updates restore them from the always-valid
    # real columns). A single upfront remirror is NOT enough: with tight
    # pads (min pad == T) the 2*temporal - 1 possible remainder passes
    # exceed the min(lpad, rpad) validity depth.
    on1 = _flag(panels == 1)
    _rm = (lambda x: x) if remirror is None else remirror

    def _with_remainder(a, b, walls_p, k1, odd):
        if one_pass1 is None:
            return a, b
        a = _rm(a)  # invariant: carried src pads are fresh at loop entry

        def pair1(_, c):
            x, y = c
            y2 = _rm(one_pass1(x, y, walls_p, on1))
            x2 = _rm(one_pass1(y2, x, walls_p, on1))
            return (x2, y2)

        def single(_, c):
            x, y = c
            return (_rm(one_pass1(x, y, walls_p, on1)), x)

        a, b = jax.lax.fori_loop(0, k1, pair1, (a, b))
        a, b = jax.lax.fori_loop(0, odd, single, (a, b))
        return a, b

    if panels == 1:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def runner(f_p, walls_p, n_pairs, k1, odd):
            # the ping-pong scratch is created INSIDE the jit: passing a
            # fresh jnp.zeros_like from the caller made it a donated input
            # XLA could not always alias, emitting a "donated buffers were
            # not usable" warning (one full-lattice copy) on every call
            scratch = jnp.zeros_like(f_p)

            def body(it, carry):
                a, b = carry
                p0 = 2 * jnp.asarray(it, jnp.int32)
                b = one_pass(a, b, walls_p,
                             _flag(jax.lax.rem(p0, jnp.int32(K)) == 0))
                a = one_pass(b, a, walls_p,
                             _flag(jax.lax.rem(p0 + 1, jnp.int32(K)) == 0))
                return (a, b)

            a, b = jax.lax.fori_loop(0, n_pairs, body, (f_p, scratch))
            a, b = _with_remainder(a, b, walls_p, k1, odd)
            return a, b, _checksum(a)

        return runner

    off = _flag(False)  # the panel kernel ignores the refresh flag
    # passes valid after one full XLA remirror: each pass consumes T
    # lanes of pad depth and the remirror restores min(lpad, rpad, ny)
    allow = min(lpad, nyp - lpad - cfg.ny, cfg.ny) // temporal
    ppr = max(1, allow // 2)  # pairs per remirror: 2*ppr passes <= allow

    @functools.partial(jax.jit, donate_argnums=(0,))
    def panel_runner(f_p, walls_p, n_pairs, k1, odd):
        scratch = jnp.zeros_like(f_p)

        if allow >= 2:
            def inner(_, c):
                x, y = c
                y = one_pass(x, y, walls_p, off)
                x = one_pass(y, x, walls_p, off)
                return (x, y)

            def outer(o, carry):
                a, b = carry
                a = remirror(a)
                todo = jnp.minimum(
                    jnp.int32(ppr), n_pairs - o * jnp.int32(ppr)
                )
                return jax.lax.fori_loop(0, todo, inner, (a, b))

            n_outer = (n_pairs + jnp.int32(ppr) - 1) // jnp.int32(ppr)
            a, b = jax.lax.fori_loop(0, n_outer, outer, (f_p, scratch))
        else:
            # tight pads (min pad < 2T): every pass needs fresh mirrors
            def inner(_, c):
                x, y = c
                y = remirror(one_pass(x, y, walls_p, off))
                x = remirror(one_pass(y, x, walls_p, off))
                return (x, y)

            a, b = jax.lax.fori_loop(
                0, n_pairs, inner, (remirror(f_p), scratch)
            )
        a, b = _with_remainder(a, b, walls_p, k1, odd)
        return a, b, _checksum(a)

    return panel_runner


def _checksum(a):
    """Tiny fused reduce returned alongside the state: fetching it is
    the completion barrier (block_until_ready can return early through
    tunneled runtimes), with no separate reduce dispatch per run call."""
    return jnp.sum(a[0, 0, :8].astype(jnp.float32))


def _make_remirror_xla(cfg: LatticeConfig, nyp: int, lpad: int):
    """Pad re-mirror as two narrow in-place XLA updates (the between-
    pass form used with lane panels): lanes [0, lpad) <- [ny, ny+lpad),
    lanes [lpad+ny, nyp) <- [lpad, lpad+rpad). Touches only the pad
    lanes, so the cost is ~(lpad+rpad)/nyp of a full pass."""
    ny = cfg.ny
    rpad = nyp - lpad - ny

    def remirror(x):
        if lpad:
            x = jax.lax.dynamic_update_slice(
                x, x[:, :, ny : ny + lpad], (0, 0, 0)
            )
        if rpad:
            x = jax.lax.dynamic_update_slice(
                x, x[:, :, lpad : lpad + rpad], (0, 0, lpad + ny)
            )
        return x

    return remirror


class Session:
    """Persistent launch state for one lattice configuration: the plan
    (one host mask fetch for wall partitioning), the padded walls, and
    the jitted runners are built once; each advance() is then a single
    runner dispatch whose returned checksum doubles as the completion
    barrier.

    This is the tunnel-facing fix for fixed per-call cost: the stateless
    run_steps() re-plans, re-pads, and re-unpads on every call — ~4
    host round-trips plus a full mask fetch, ~0.2-0.3 s through the
    tunneled chip regardless of step count. bench.py round 2 measured
    that as the gap between the slope rate (~160 us/step) and the
    end-to-end rate; the reference has no per-call cost at all (one
    long in-process loop, src/latticeboltzmann.c:148-164).

    Usage:
        sess = Session(cfg, walls, wall_spec=spec)
        if sess.plan is None: ...  # caller falls back to the XLA engine
        sess.load(f)               # pad into the mirror-lane layout
        sess.advance(n)            # one dispatch each
        sess.block()               # fetch the checksum (completion)
        f = sess.state()           # unpad (non-destructive)
    """

    def __init__(
        self,
        cfg: LatticeConfig,
        walls,
        *,
        interpret: bool = False,
        temporal: int | None = None,
        wall_spec=None,
        slip_x=None,
        slip_y=None,
        fast_math: bool = False,
        panels: int | None = None,
        static_steps: int | None = None,
        skew: bool | None = None,
    ):
        """static_steps: a one-shot caller (run_steps) that will only
        ever advance() this exact count may pass it here; when it is a
        multiple of 2*temporal the runner skips compiling the T=1
        remainder program (~11 s of XLA CPU compile at test sizes).
        Long-lived callers leave it None and get the fully dynamic
        runner."""
        has_slip = slip_x is not None or slip_y is not None
        if has_slip:
            wall_spec = None  # slip masks are arbitrary; DMA the class plane
        self.cfg = cfg
        self.nx = walls.shape[0]
        self.interpret = interpret
        self.wall_spec = wall_spec
        self.has_slip = has_slip
        self.fast_math = fast_math
        self.skew = SKEW_DEFAULT if skew is None else skew
        self.mask = class_plane(walls, slip_x, slip_y) if has_slip else walls
        self.plan = _plan(
            cfg, self.nx, self.mask, temporal, interpret, wall_spec is None,
            allow_panels=not has_slip,  # the panel kernel has no slip path
            skew=self.skew,
        )
        self._f_p = None
        self._chk = None
        if self.plan is None:
            # odd shapes, float64 (software-emulated on TPU — a
            # correctness config, not a perf config; SURVEY.md section 7
            # 'hard parts'), degenerate widths: caller routes to XLA
            return
        nyp, lpad, br, temporal, row_shift, segs, n_panels = self.plan
        if panels is not None:
            n_panels = panels
            if n_panels > 1:
                row_shift, segs = 0, ((0, None, True, None),)
        self.nyp, self.lpad, self.br = nyp, lpad, br
        self.temporal, self.row_shift = temporal, row_shift
        self.segs, self.panels = segs, n_panels
        self._with_remainder = (
            static_steps is None or static_steps % (2 * temporal) != 0
        )
        self._walls_p = None
        self._runner = self._build_runner(self._with_remainder)

    def _build_runner(self, with_remainder: bool):
        """The lru-cached jitted runner for this plan. segs1 is the T=1
        re-partition for the in-runner remainder passes (select regions
        anchor to the window height br + 2*T)."""
        segs1 = (
            self.segs
            if self.temporal == 1 or self.panels > 1 or not with_remainder
            else _segs_at(self.cfg, self.nx, self.mask, self.br, 1,
                          self.nyp, self.lpad, self.row_shift)
        )
        return _make_runner(
            self.cfg, self.nx, self.nyp, self.br, self.interpret,
            self.temporal, self.wall_spec, self.has_slip, self.lpad,
            self.segs, self.row_shift, self.fast_math, self.panels,
            segs1, with_remainder, self.skew,
        )

    def load(self, f) -> None:
        """Pad unpadded state into the session (donates f's buffer)."""
        self._f_p, walls_p = _pad_state_donated(
            f, self.mask, self.cfg, self.nyp, self.lpad, self.row_shift
        )
        if self._walls_p is None:
            self._walls_p = walls_p
        self._chk = None

    @property
    def loaded(self) -> bool:
        return self._f_p is not None

    def advance(self, n_steps: int) -> None:
        """Advance the padded state n_steps: ONE runner dispatch for any
        step count (the remainder mod 2*temporal runs as dynamic T=1
        loop counts inside the same compiled program — no per-remainder
        recompiles)."""
        if n_steps <= 0:
            return
        n_pairs, rem = divmod(n_steps, 2 * self.temporal)
        if rem and not self._with_remainder:
            # a static_steps session asked for a count off its promised
            # multiple: upgrade to the fully dynamic runner (lru-cached)
            self._with_remainder = True
            self._runner = self._build_runner(True)
        # hand the state over BEFORE dispatch: the runner donates it, so
        # if the dispatch raises (the tunnel's UNAVAILABLE mid-run
        # failure mode) the session must read as unloaded — keeping the
        # reference would leave it pointing at a deleted buffer and every
        # later advance()/state() would die with "Array has been deleted"
        # instead of a clean reload
        f_p, self._f_p, self._chk = self._f_p, None, None
        a, b, chk = self._runner(f_p, self._walls_p, n_pairs, rem // 2, rem % 2)
        # never retain the dead scratch: at 4000x16000 each buffer is
        # 2.3 GB and a third live buffer OOMs the chip during unpad
        del b
        self._f_p, self._chk = a, chk

    def block(self) -> float:
        """Completion barrier: fetch the runner's fused checksum (see
        _checksum — block_until_ready alone can return early through
        tunneled runtimes)."""
        return 0.0 if self._chk is None else float(self._chk)

    def state(self):
        """Current state, unpadded (non-destructive; session keeps the
        padded buffers for further advance() calls)."""
        return unpad_state(self._f_p, self.cfg, self.lpad, self.row_shift)

    def unload(self):
        """Unpad and release the padded state (frees the scratch first —
        the big-lattice memory discipline run_steps always had)."""
        out = self.state()
        self._f_p = self._chk = None
        return out


def run_steps(
    f,
    walls,
    cfg: LatticeConfig,
    n_steps: int,
    *,
    interpret: bool = False,
    temporal: int | None = None,
    wall_spec=None,
    slip_x=None,
    slip_y=None,
    fast_math: bool = False,
    panels: int | None = None,
    skew: bool | None = None,
):
    """Simulation-backend adapter: unpadded in, unpadded out — the
    stateless one-shot form of Session (which long-lived callers like
    the Simulation facade keep across calls to amortize the per-call
    plan/pad/unpad cost).

    `f` is DONATED: its device buffer is consumed by the kernel chain
    and must not be used after this call (pass jnp.array(f, copy=True)
    to keep it). The Simulation facade handles this automatically.

    panels overrides the planner's lane-panel count (the 2-D grid is
    auto-selected only when no full-width row block fits VMEM — a
    capability fallback, not a perf path; tests force it on small
    lattices).

    fast_math=True substitutes the hardware approximate reciprocal for
    1/rho (max rel err 1.6e-5 on v5e) — the analog of the reference's
    -Ofast build (Makefile:2). Off by default: in isolation it measured
    -7 us/step, but in the full segmented kernel it is ~7 us/step
    SLOWER (it breaks a Mosaic fusion around the moments), so IEEE
    division wins on both accuracy and speed today.

    Each runner loop iteration advances two kernel passes (A->B then
    B->A, each `temporal` timesteps) with fixed buffer roles, exactly
    the reference's DoTimeStep structure (src/latticeboltzmann.c:
    186-210) — here it keeps XLA's while-loop buffer assignment stable
    so the aliased pallas outputs stay zero-copy. Remainder steps (when
    n_steps is not a multiple of 2*temporal) run as dynamic T=1 loop
    counts inside the same program; for exact multiples the T=1 program
    is never even built (static_steps below).
    """
    sess = Session(
        cfg, walls, interpret=interpret, temporal=temporal,
        wall_spec=wall_spec, slip_x=slip_x, slip_y=slip_y,
        fast_math=fast_math, panels=panels, static_steps=n_steps,
        skew=skew,
    )
    if sess.plan is None:
        from . import stream_collide

        return stream_collide.run_steps(f, walls, cfg, n_steps, slip_x, slip_y)
    sess.load(f)
    del f  # the unpadded buffer is donated: dead from here on
    sess.advance(n_steps)
    return sess.unload()


@functools.lru_cache(maxsize=64)
def _make_probed_runner(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    interpret: bool,
    every: int,
    temporal: int,
    n_chunks: int,
    wall_spec=None,
    has_slip: bool = False,
    lpad: int = 0,
    segs=((0, None, True),),
    row_shift: int = 0,
    fast_math: bool = False,
    skew: bool = False,
):
    """Probe-fused runner: advances n_chunks * every steps under ONE jit,
    emitting (rho, u_x, u_y) at the probe sites every `every` steps into
    an on-device series — run_probed with a single host sync on the
    Pallas backend (the reference's PrintLattice stream made per-step,
    src/latticeboltzmann.c:610-639).

    Pass structure per chunk, in preference order: temporal-blocked
    fixed-role pairs when every % (2*T) == 0 (full kernel speed),
    single-step fixed-role pairs when every is even, and single-step
    swapped-role passes otherwise (odd `every` — XLA inserts carry
    copies, a diagnostics-mode cost).
    """
    from .stream_collide import probe_values

    if every % (2 * temporal) == 0:
        t_used = temporal
        pairs = every // (2 * temporal)
    elif every % 2 == 0:
        t_used = 1
        pairs = every // 2
    else:
        t_used = 1
        pairs = 0  # odd path below
    stepP = _make_pass(
        cfg, nx, nyp, br, interpret, t_used, wall_spec, has_slip, lpad, segs,
        row_shift, fast_math, skew=skew,
    )

    on = _flag(True)  # diagnostics mode: re-mirror pads every pass

    @functools.partial(jax.jit, donate_argnums=(0,))
    def runner(a, walls_p, probes):
        b = jnp.zeros_like(a)  # in-jit scratch: see _make_runner
        if pairs:
            def body(carry, _):
                def inner(_, c):
                    x, y = c
                    y = stepP(x, y, walls_p, on)
                    x = stepP(y, x, walls_p, on)
                    return (x, y)

                a_, b_ = jax.lax.fori_loop(0, pairs, inner, carry)
                return (a_, b_), probe_values(a_, probes)
        else:
            def body(carry, _):
                a_, b_ = carry
                for _ in range(every):
                    a_, b_ = stepP(a_, b_, walls_p, on), a_
                return (a_, b_), probe_values(a_, probes)

        (a, b), series = jax.lax.scan(body, (a, b), length=n_chunks)
        return a, series

    return runner


def run_steps_probed(
    f,
    walls,
    cfg: LatticeConfig,
    n_steps: int,
    probes,
    *,
    every: int = 1,
    interpret: bool = False,
    wall_spec=None,
    slip_x=None,
    slip_y=None,
    fast_math: bool = False,
    skew: bool | None = None,
    temporal: int | None = None,
):
    """(f_final, series): advance n_steps sampling probes every `every`
    steps, all on device with one host sync. series: (n_steps//every, P, 3).

    temporal overrides the planner's depth (interpret mode plans T=1,
    under which the skew rewrite never engages — tests pass an explicit
    T>=2 with a matching `every` to exercise the probed skew path)."""
    from . import stream_collide

    if n_steps % every:
        raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
    has_slip = slip_x is not None or slip_y is not None
    if has_slip:
        wall_spec = None
    nx = f.shape[1]
    mask = class_plane(walls, slip_x, slip_y) if has_slip else walls
    skew = SKEW_DEFAULT if skew is None else skew
    plan = _plan(cfg, nx, mask, temporal, interpret, wall_spec is None,
                 allow_panels=False, skew=skew)
    if plan is None:
        fout, series = stream_collide.run_steps_probed(
            f, walls, cfg, n_steps, probes, slip_x, slip_y
        )
        return fout, series[every - 1 :: every]
    nyp, lpad, br, temporal, row_shift, segs, _ = plan
    if every % (2 * temporal) != 0 and temporal != 1:
        # the probed runner falls back to T=1 passes (see
        # _make_probed_runner); regions anchor to the window height
        segs = _segs_at(cfg, nx, mask, br, 1, nyp, lpad, row_shift)
    f_p, walls_p = _pad_state_donated(f, mask, cfg, nyp, lpad, row_shift)
    del f  # the unpadded buffer is donated: dead from here on
    # probe sites live at storage row (i - row_shift) mod nx, lane j + lpad
    probes = jnp.stack(
        [(probes[:, 0] - row_shift) % nx, probes[:, 1] + lpad], axis=1
    )
    runner = _make_probed_runner(
        cfg, nx, nyp, br, interpret, every, temporal, n_steps // every,
        wall_spec, has_slip, lpad, segs, row_shift, fast_math, skew,
    )
    fout_p, series = runner(f_p, walls_p, probes)
    return unpad_state(fout_p, cfg, lpad, row_shift), series


