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

Layout: f is (9, NX, NYP) float32/bfloat16, NYP = NY rounded up to 128
lanes. The periodic y wrap is done in-VMEM with a lane roll plus an
edge-column fix at the true NY boundary (padding lanes are treated as
wall sites and never feed real sites). The x wrap falls out of the
rotating-slot staging: whole neighbor row-blocks (with wrapped block
indices) are resident, so stencil halos are just their edge rows.
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
    br: int, slots: int, nyp: int, itemsize: int, temporal: int, walls_dma: bool = True
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
    return need


# Sized against the 100MB vmem_limit_bytes with pipeline slack; 84MB (not
# 80) so that BR=16/slots=4 at 16000 lanes still fits once the walls-slot
# term is counted (it ran under the 100MB limit all along — the old 80MB
# budget simply didn't account for walls).
VMEM_BUDGET = 84 * 1024 * 1024


def pick_block_config(
    nx: int, nyp: int, itemsize: int = 4, temporal: int = 4, walls_dma: bool = True
) -> tuple[int, int]:
    """(block_rows, staging_slots): the largest block of (32, 24, 16, 8)
    dividing NX that fits the VMEM budget, with 6 staging slots when
    affordable (deeper DMA prefetch lead) else 4. BR=32/6 measured
    fastest on v5e at 4096 lanes; wide lattices step down. Returns
    (0, 0) when nothing divides NX (caller falls back to XLA)."""
    for br in (32, 24, 16, 8):
        if nx % br:
            continue
        for slots in (6, 4):
            if _vmem_need(br, slots, nyp, itemsize, temporal, walls_dma) <= VMEM_BUDGET:
                return br, slots
    return 0, 0


def pick_block_rows(nx: int, nyp: int | None = None, itemsize: int = 4, temporal: int = 4) -> int:
    """Back-compat shim: block rows only."""
    return pick_block_config(nx, nyp if nyp is not None else LANE, itemsize, temporal)[0]


def _roll_y_periodic(plane, ey: int, ny: int):
    """Circular shift by ey in {+1,-1} along the lane axis with the wrap
    at the *true* column count ny (not the padded lane count): the VMEM
    equivalent of the reference's y_r/y_l wrapped gather indices
    (src/latticeboltzmann.c:233-234)."""
    rows = plane.shape[0]
    nyp = plane.shape[1]
    rolled = pltpu.roll(plane, ey % nyp, axis=1)  # pltpu.roll wants shift >= 0
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, nyp), 1)
    if ey == 1:
        # out[:, 0] must be in[:, ny-1] (wrap), not in[:, nyp-1] (padding)
        return jnp.where(lane_idx == 0, plane[:, ny - 1 : ny], rolled)
    else:
        # out[:, ny-1] must be in[:, 0]
        return jnp.where(lane_idx == ny - 1, plane[:, 0:1], rolled)


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
):
    """Build the kernel body. All shape/physics parameters are baked in
    as Python constants (the jit-specialization equivalent of the
    reference's #define block, src/latticeboltzmann.c:36-56).

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
    """
    ny = cfg.ny
    n_blocks = nx // br
    T = temporal
    if not (1 <= T <= br):
        raise ValueError(f"temporal={T} must be in [1, {br}]")
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
        if external_halo and wall_spec is not None:
            htop, hbot, off_ref, out_ref, fbody, sems = rest
            wbody = None
        elif external_halo:
            htop, hbot, whtop, whbot, out_ref, fbody, wbody, sems = rest
        elif wall_spec is not None:
            out_ref, fbody, sems = rest
            wbody = None
        else:
            out_ref, fbody, wbody, sems = rest
        i = pl.program_id(0)

        def copies(k):
            if external_halo:
                # no x wrap: edge issues stage a clamped block whose halo
                # rows get patched from the neighbor-device inputs below
                blk = jnp.clip(
                    jnp.asarray(k, jnp.int32) - 1, 0, jnp.int32(n_blocks - 1)
                )
            else:
                blk = _rem(k + (n_blocks - 1), n_blocks)
            slot = _rem(k, SLOTS)
            r0 = blk * jnp.int32(br)
            out = [
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(r0, br), :],
                    fbody.at[slot],
                    sems.at[slot, 0],
                )
            ]
            if wbody is not None:
                out.append(
                    pltpu.make_async_copy(
                        walls_hbm.at[pl.ds(r0, br), :],
                        wbody.at[slot],
                        sems.at[slot, 1],
                    )
                )
            return out

        def start(k):
            for c in copies(k):
                c.start()

        def wait(k):
            for c in copies(k):
                c.wait()

        # warm-up at i=0: start the first SLOTS-1 issues; every step
        # prefetches issue i+SLOTS-1 while computing block i — the TPU
        # version of the reference's software prefetch of the next
        # vector block (src/latticeboltzmann.c:350-358)
        @pl.when(i == 0)
        def _():
            for k in range(min(SLOTS - 1, n_blocks + 2)):
                start(k)
            wait(0)
            wait(1)

        @pl.when(i + SLOTS - 1 < n_blocks + 2)
        def _():
            start(i + SLOTS - 1)

        wait(i + 2)

        if external_halo:
            # patch the T neighbor-device rows into the resident edge
            # slots (the pull stencil only ever reads those T rows from
            # the edge slots): top halo into issue-0's slot, bottom halo
            # into issue-(G+1)'s slot
            @pl.when(i == 0)
            def _():
                for s in range(NSPEEDS):
                    fbody[0, s, br - T :, :] = htop[s]
                if wbody is not None:
                    wbody[0, br - T :, :] = whtop[...]

            @pl.when(i == n_blocks - 1)
            def _():
                slot_last = (n_blocks + 1) % SLOTS
                for s in range(NSPEEDS):
                    fbody[slot_last, s, :T, :] = hbot[s]
                if wbody is not None:
                    wbody[slot_last, :T, :] = whbot[...]

        s_top = _rem(i, SLOTS)      # holds block i-1: its last row is our top halo
        s_body = _rem(i + 1, SLOTS)  # block i
        s_bot = _rem(i + 2, SLOTS)  # block i+1: its first row is our bottom halo

        def forced(planes, wall):
            """Channel forcing on column j=0 (src/latticeboltzmann.c:
            489-518), applied to any row set (body or halo rows — halo
            rows must be post-forcing because boundary outputs pull
            from them). The forced column lives in lane 0, so all the
            guard/update arithmetic runs on a single 128-lane sub-block,
            written back with a static lane concat."""
            r = planes[0].shape[0]
            sub = [p[:, :LANE] for p in planes]
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (r, LANE), 1) == 0
            ok = (
                lane0
                & jnp.logical_not(wall[:, :LANE])
                & (sub[6] - a58 > zero)
                & (sub[3] - a14 > zero)
                & (sub[7] - a58 > zero)
            )
            out = list(planes)
            for s, delta in ((6, -a58), (3, -a14), (7, -a58),
                             (5, a58), (1, a14), (8, a58)):
                new_sub = jnp.where(ok, sub[s] + delta, sub[s])
                # static lane concat (dynamic_update_slice has no Pallas
                # TPU lowering)
                out[s] = jnp.concatenate([new_sub, planes[s][:, LANE:]], axis=1)
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
                col = f[s][1 - ex : R - 1 - ex]  # (R-2, nyp)
                pulled.append(_roll_y_periodic(col, ey, ny) if ey else col)

            # moments with shared partial sums (same values as the
            # reference's sums, reassociated for op count)
            p = pulled
            d56 = p[5] + p[6]
            d78 = p[7] + p[8]
            d58 = p[5] + p[8]
            d67 = p[6] + p[7]
            density = (p[0] + (p[1] + p[3])) + ((p[2] + p[4]) + (d56 + d78))
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
            out = [None] * NSPEEDS
            out[0] = c1 * p[0] + r0_ * base
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
                out[sp] = c1 * p[sp] + r_ * (q + eu)
                out[sn] = c1 * p[sn] + r_ * (q - eu)

            wall_c = wall[1 : R - 1]
            if cls is None:
                return [
                    jnp.where(wall_c, p[int(OPPOSITE[s])], out[s])
                    for s in range(NSPEEDS)
                ]
            # slip (specular reflection, the "reflect" BC the reference
            # names but never implements, src/latticeboltzmann.c:21):
            # class codes are exact small floats, so equality is safe.
            # Precedence was resolved when the class plane was built.
            cls_c = cls[1 : R - 1]
            bounce = cls_c == np.float32(1.0)  # NOT wall_c: that includes slip sites
            res = []
            for s in range(NSPEEDS):
                o = jnp.where(cls_c == np.float32(2.0), p[int(REFLECT_X[s])], out[s])
                o = jnp.where(cls_c == np.float32(3.0), p[int(REFLECT_Y[s])], o)
                res.append(jnp.where(bounce, p[int(OPPOSITE[s])], o))
            return res

        # assemble the extended window: rows [r0-T, r0+br+T) from the
        # three resident blocks (cast up to compute precision if the
        # storage dtype is bf16)
        f = [
            jnp.concatenate(
                [fbody[s_top, s, br - T :], fbody[s_body, s], fbody[s_bot, s, :T]],
                axis=0,
            ).astype(dtype)
            for s in range(NSPEEDS)
        ]
        cls = None
        if wall_spec is None:
            codes = jnp.concatenate(
                [wbody[s_top, br - T :], wbody[s_body], wbody[s_bot, :T]], axis=0
            )
            wall = codes > zero  # any solid class (forcing skips them all)
            if has_slip:
                cls = codes
        else:
            # closed-form mask from iotas — no walls DMA. Window rows are
            # global rows [base - T, base + br + T) with periodic wrap at
            # the *global* row count (the shard offset arrives in SMEM on
            # the sharded variant); padding lanes (col >= ny) are solid,
            # as pad_state marks them.
            R = br + 2 * T
            wrap_n = cfg.nx if external_halo else nx
            base = i * jnp.int32(br)
            if external_halo:
                base = base + off_ref[0]
            row0 = base - jnp.int32(T) + jnp.int32(wrap_n)
            rows = _rem(row0 + jax.lax.broadcasted_iota(jnp.int32, (R, nyp), 0), wrap_n)
            cols = jax.lax.broadcasted_iota(jnp.int32, (R, nyp), 1)
            wall = cols >= jnp.int32(ny)
            for prim in wall_spec:
                kind = prim[0]
                if kind == "channel":
                    wall |= (rows == 0) | (rows == jnp.int32(wrap_n - 1))
                elif kind == "rect":
                    _, pr0, pr1, pc0, pc1 = prim
                    wall |= (
                        (rows >= jnp.int32(pr0))
                        & (rows < jnp.int32(pr1))
                        & (cols >= jnp.int32(pc0))
                        & (cols < jnp.int32(pc1))
                    )
                elif kind == "circle2":
                    _, ci2, cj2, r2q = prim
                    di = 2 * rows - jnp.int32(ci2)
                    dj = 2 * cols - jnp.int32(cj2)
                    wall |= di * di + dj * dj <= jnp.int32(r2q)
                else:
                    raise ValueError(f"unknown wall-spec primitive {kind!r}")

        # advance T steps in VMEM, trimming one invalid row per side per
        # step (forcing precedes every step: src/latticeboltzmann.c:192,201)
        for _ in range(T):
            f = forced(f, wall)
            f = stream_collide_window(f, wall, cls)
            wall = wall[1:-1]
            if cls is not None:
                cls = cls[1:-1]

        for s in range(NSPEEDS):
            out_ref[s, :, :] = f[s].astype(storage)

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
):
    """Jittable padded-state half-step:
    (f_src, dst_donor, walls_padded_f32) -> f_new, where f_new reuses
    dst_donor's HBM buffer in place (input_output_aliases). Call twice
    per timestep pair with buffer roles swapped — fixed roles per scan
    iteration keep XLA from inserting carry copies.

    f: (9, nx, nyp); walls: (nx, nyp) float32 0/1 with padding lanes
    (j >= cfg.ny) marked solid. With has_slip the walls plane instead
    carries solid-class codes 0/1/2/3 (fluid / bounce-back / slip_x /
    slip_y) — free-slip walls ride the existing mask DMA for free.
    """
    dtype = np.dtype(cfg.dtype).type
    itemsize = np.dtype(cfg.dtype).itemsize
    if has_slip and wall_spec is not None:
        raise ValueError("slip masks are arbitrary; use the DMA mask path")
    walls_dma = wall_spec is None
    if slots is None:
        slots = (
            6
            if _vmem_need(br, 6, nyp, itemsize, temporal, walls_dma) <= VMEM_BUDGET
            else 4
        )
    kernel = _make_kernel(
        cfg, nx, nyp, br, dtype, temporal, external_halo, slots, wall_spec, has_slip
    )
    n_blocks = nx // br

    in_specs = [
        # pinned to HBM (not ANY): with ANY the compiler may promote
        # small arrays to VMEM, where dynamic-row DMA slices hit
        # Mosaic's tile-alignment restriction
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),  # donor (buffer reuse only)
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    if external_halo:
        T = temporal
        in_specs += [
            pl.BlockSpec((NSPEEDS, T, nyp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NSPEEDS, T, nyp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        if walls_dma:
            in_specs += [
                pl.BlockSpec((T, nyp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, nyp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ]
        else:
            # shard's global row offset, (1,) int32 in SMEM
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NSPEEDS, nx, nyp), cfg.dtype),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (NSPEEDS, br, nyp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        input_output_aliases={1: 0},
        scratch_shapes=(
            [pltpu.VMEM((slots, NSPEEDS, br, nyp), cfg.dtype)]  # rotating body slots
            + ([pltpu.VMEM((slots, br, nyp), jnp.float32)] if walls_dma else [])
            + [pltpu.SemaphoreType.DMA((slots, 2 if walls_dma else 1))]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # raise the default 16MB scoped-vmem cap so larger row blocks
            # and deeper temporal windows fit (v5e has 128MB VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(124 * nx * nyp * temporal),
            bytes_accessed=int((2 * NSPEEDS * itemsize + (4 if walls_dma else 0)) * nx * nyp),
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


def pad_state(f, walls, cfg: LatticeConfig):
    """Embed (9, NX, NY) state into the (9, NX, NYP) padded layout;
    padding lanes are marked solid and filled with edge values (they
    never feed real sites — the lane-boundary analog of the reference's
    NYPADDED stride padding, src/latticeboltzmann.c:69-76). `walls` may
    be a bool mask or a float32 class-code plane (see class_plane)."""
    nyp = round_up(cfg.ny, LANE)
    pad = nyp - cfg.ny
    f_p = jnp.pad(jnp.asarray(f), ((0, 0), (0, 0), (0, pad)), mode="edge")
    walls_f = jnp.asarray(walls).astype(jnp.float32)
    walls_p = jnp.pad(walls_f, ((0, 0), (0, pad)), mode="constant", constant_values=1.0)
    return f_p, walls_p


# default temporal-blocking depth: T=4 measured fastest on v5e
# (BR=32/T=4: 16,014 MLUPS on 800x4000 f32; deeper windows lose to
# window-overlap compute)
DEFAULT_TEMPORAL = 4


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
):
    """One persistent jitted runner per configuration: advances
    2*temporal*n_pairs steps with a dynamic pair count (fori_loop), so
    changing the step count never recompiles."""
    stepT = make_step(
        cfg, nx, nyp, br, interpret, temporal, wall_spec=wall_spec, has_slip=has_slip
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def runner(f_p, scratch, walls_p, n_pairs):
        def body(_, carry):
            a, b = carry
            b = stepT(a, b, walls_p)
            a = stepT(b, a, walls_p)
            return (a, b)

        a, b = jax.lax.fori_loop(0, n_pairs, body, (f_p, scratch))
        return a, b

    return runner


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
):
    """Simulation-backend adapter: unpadded in, unpadded out.

    Each loop iteration advances two kernel passes (A->B then B->A, each
    `temporal` timesteps) with fixed buffer roles, exactly the
    reference's DoTimeStep structure (src/latticeboltzmann.c:186-210) —
    here it keeps XLA's while-loop buffer assignment stable so the
    aliased pallas outputs stay zero-copy. Remainder steps run as
    statically-unrolled single-step passes.
    """
    has_slip = slip_x is not None or slip_y is not None
    if has_slip:
        wall_spec = None  # slip masks are arbitrary; DMA the class plane
    nx = f.shape[1]
    br = pick_block_config(
        nx,
        round_up(cfg.ny, LANE),
        np.dtype(cfg.dtype).itemsize,
        walls_dma=wall_spec is None,
    )[0]
    if br == 0 or np.dtype(cfg.dtype) == np.float64:
        # odd shapes, and float64 (software-emulated on TPU — a
        # correctness config, not a perf config; SURVEY.md section 7
        # 'hard parts') route to the XLA engine
        from . import stream_collide

        return stream_collide.run_steps(f, walls, cfg, n_steps, slip_x, slip_y)
    if temporal is None:
        # interpreter mode is a semantics tool — temporal blocking only
        # multiplies its cost
        temporal = 1 if interpret else min(DEFAULT_TEMPORAL, br)
    nyp = round_up(cfg.ny, LANE)
    mask = class_plane(walls, slip_x, slip_y) if has_slip else walls
    f_p, walls_p = pad_state(f, mask, cfg)
    runner = _make_runner(cfg, nx, nyp, br, interpret, temporal, wall_spec, has_slip)

    n_pairs = n_steps // (2 * temporal)
    a, b = runner(f_p, jnp.zeros_like(f_p), walls_p, n_pairs)
    rem = n_steps % (2 * temporal)
    if rem:
        rem_runner = _make_rem_runner(
            cfg, nx, nyp, br, interpret, rem, wall_spec, has_slip
        )
        a = rem_runner(a, b, walls_p)
    return a[:, :, : cfg.ny]


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
        stepP = make_step(cfg, nx, nyp, br, interpret, temporal,
                          wall_spec=wall_spec, has_slip=has_slip)
        pairs = every // (2 * temporal)
    elif every % 2 == 0:
        stepP = make_step(cfg, nx, nyp, br, interpret, 1,
                          wall_spec=wall_spec, has_slip=has_slip)
        pairs = every // 2
    else:
        stepP = make_step(cfg, nx, nyp, br, interpret, 1,
                          wall_spec=wall_spec, has_slip=has_slip)
        pairs = 0  # odd path below

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def runner(a, b, walls_p, probes):
        if pairs:
            def body(carry, _):
                def inner(_, c):
                    x, y = c
                    y = stepP(x, y, walls_p)
                    x = stepP(y, x, walls_p)
                    return (x, y)

                a_, b_ = jax.lax.fori_loop(0, pairs, inner, carry)
                return (a_, b_), probe_values(a_, probes)
        else:
            def body(carry, _):
                a_, b_ = carry
                for _ in range(every):
                    a_, b_ = stepP(a_, b_, walls_p), a_
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
):
    """(f_final, series): advance n_steps sampling probes every `every`
    steps, all on device with one host sync. series: (n_steps//every, P, 3).
    """
    from . import stream_collide

    if n_steps % every:
        raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
    has_slip = slip_x is not None or slip_y is not None
    if has_slip:
        wall_spec = None
    nx = f.shape[1]
    nyp = round_up(cfg.ny, LANE)
    br = pick_block_config(
        nx, nyp, np.dtype(cfg.dtype).itemsize, walls_dma=wall_spec is None
    )[0]
    if br == 0 or np.dtype(cfg.dtype) == np.float64:
        fout, series = stream_collide.run_steps_probed(
            f, walls, cfg, n_steps, probes, slip_x, slip_y
        )
        return fout, series[every - 1 :: every]
    temporal = 1 if interpret else min(DEFAULT_TEMPORAL, br)
    mask = class_plane(walls, slip_x, slip_y) if has_slip else walls
    f_p, walls_p = pad_state(f, mask, cfg)
    runner = _make_probed_runner(
        cfg, nx, nyp, br, interpret, every, temporal, n_steps // every,
        wall_spec, has_slip,
    )
    fout_p, series = runner(f_p, jnp.zeros_like(f_p), walls_p, probes)
    return fout_p[:, :, : cfg.ny], series


@functools.lru_cache(maxsize=64)
def _make_rem_runner(
    cfg: LatticeConfig,
    nx: int,
    nyp: int,
    br: int,
    interpret: bool,
    rem: int,
    wall_spec=None,
    has_slip: bool = False,
):
    step1 = make_step(cfg, nx, nyp, br, interpret, 1, wall_spec=wall_spec, has_slip=has_slip)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rem_runner(a, b, walls_p):
        for _ in range(rem):
            a, b = step1(a, b, walls_p), a
        return a

    return rem_runner
