"""Multi-chip lattice sharding — the TPU-native re-design of the
reference's MPI row decomposition (README.md:44-57, mpi-runtimes.dat).

The lattice's x (row) axis is sharded over a 1-D device mesh with
`shard_map`. The pull-scheme stream needs each shard's neighbor boundary
rows, so each step exchanges one row of the three up-moving speed planes
(2,5,6 — e_x=+1) downward and one row of the three down-moving planes
(4,7,8 — e_x=-1) upward via `jax.lax.ppermute` — the ICI equivalent of
the reference's MPI_Isend/Irecv halo exchange of boundary rows.

Two compute schedules, mirroring the reference's two MPI modes:

- overlap=False: exchange halos, then compute the whole padded block
  (the reference's "exchange, then compute" mode).
- overlap=True: the step is expressed so interior rows (no halo
  dependency) are computable while the ppermute is in flight, exactly
  like the reference's interior/boundary split (img/comms-overlap.png);
  XLA's latency-hiding scheduler overlaps the collective with the
  interior work because there is no data dependency.

Both schedules compute bit-identical results (tests assert this), and
match the unsharded engine.

The whole n-step loop runs as `lax.scan` *inside* one shard_map region:
per step the only communication is the two neighbor ppermutes; there are
zero host round-trips and zero resharding collectives.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.spec import E, NSPEEDS, REFLECT_X, REFLECT_Y, LatticeConfig
from ..ops import stream_collide as ops

# Speeds that pull from the row above (e_x=+1) / below (e_x=-1).
UP_SPEEDS = (2, 5, 6)
DOWN_SPEEDS = (4, 7, 8)

AXIS = "x"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the lattice's x axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _exchange_halos(f_local: jax.Array):
    """Neighbor boundary-row exchange (reference: README.md:45 — exchange
    before Stream). Returns (top_halo, bot_halo):

    - top_halo: (3, 1, NY) rows of speeds 2,5,6 from the *upper* neighbor's
      last row (global row r0-1), needed to pull at local row 0.
    - bot_halo: (3, 1, NY) rows of speeds 4,7,8 from the *lower* neighbor's
      first row (global row r0+L), needed to pull at local row L-1.
    """
    n = jax.lax.axis_size(AXIS)
    down = [(i, (i + 1) % n) for i in range(n)]  # send toward larger x
    up = [(i, (i - 1) % n) for i in range(n)]    # send toward smaller x
    send_down = f_local[np.asarray(UP_SPEEDS), -1:, :]   # my last row -> next dev
    send_up = f_local[np.asarray(DOWN_SPEEDS), :1, :]    # my first row -> prev dev
    top_halo = jax.lax.ppermute(send_down, AXIS, down)
    bot_halo = jax.lax.ppermute(send_up, AXIS, up)
    return top_halo, bot_halo


def _pull_padded(f_local, top_halo, bot_halo):
    """Pull gather on the local block given halo rows. y wraps locally
    (y is unsharded); x uses halo rows instead of a wrap."""
    L = f_local.shape[1]
    pulled = []
    for s in range(NSPEEDS):
        ex, ey = int(E[s, 0]), int(E[s, 1])
        plane = jnp.roll(f_local[s], ey, axis=1) if ey else f_local[s]
        if ex == 0:
            pulled.append(plane)
        elif ex == 1:
            halo = top_halo[UP_SPEEDS.index(s)]
            halo = jnp.roll(halo, ey, axis=1) if ey else halo
            pulled.append(jnp.concatenate([halo, plane[:-1]], axis=0))
        else:
            halo = bot_halo[DOWN_SPEEDS.index(s)]
            halo = jnp.roll(halo, ey, axis=1) if ey else halo
            pulled.append(jnp.concatenate([plane[1:], halo], axis=0))
    return jnp.stack(pulled)


def _finish(pulled, walls_local, cfg, slip_x_l=None, slip_y_l=None):
    """Collide + masked bounce-back (and optional free-slip specular
    reflection) on already-pulled distributions. Precedence walls >
    slip_x > slip_y, matching ops.stream_collide — including its
    mixed-precision contract: with bf16 storage the arithmetic runs in
    f32 and rounds back on return (ops.collide expects compute-dtype
    inputs; feeding it raw bf16 would also promote the scan carry)."""
    storage = pulled.dtype
    pulled = pulled.astype(ops._compute_dtype(cfg))
    relaxed = ops.collide(pulled, cfg)
    if slip_y_l is not None:
        relaxed = jnp.where(slip_y_l[None, :, :], pulled[np.asarray(REFLECT_Y)], relaxed)
    if slip_x_l is not None:
        relaxed = jnp.where(slip_x_l[None, :, :], pulled[np.asarray(REFLECT_X)], relaxed)
    bounced = pulled[np.asarray(ops.OPPOSITE)]
    return jnp.where(walls_local[None, :, :], bounced, relaxed).astype(storage)


def _step_local(f_local, walls_local, cfg: LatticeConfig, overlap: bool,
                slip_x_l=None, slip_y_l=None):
    """One timestep on a local row block: forcing, halo exchange, fused
    stream+collide. With overlap=True the interior rows' compute has no
    dependency on the ppermute results, so XLA can hide the collective —
    the reference's Isend/compute-interior/Waitall/compute-boundary
    schedule (README.md:45-51) expressed dataflow-style."""
    solid = walls_local
    if slip_x_l is not None:
        solid = solid | slip_x_l
    if slip_y_l is not None:
        solid = solid | slip_y_l
    f_local = ops.apply_source(f_local, solid, cfg)
    top_halo, bot_halo = _exchange_halos(f_local)

    def finish(pulled, sl):
        return _finish(
            pulled, walls_local[sl], cfg,
            None if slip_x_l is None else slip_x_l[sl],
            None if slip_y_l is None else slip_y_l[sl],
        )

    if not overlap:
        pulled = _pull_padded(f_local, top_halo, bot_halo)
        return finish(pulled, slice(None))

    # Interior rows [1, L-1): pure local pull (rows 0..L-1 suffice).
    interior = ops.pull(f_local)[:, 1:-1, :]
    # jnp-roll-based pull wraps x locally; rows 1..L-2 never read the
    # wrapped rows, so the interior slice equals the true pull.
    out_interior = finish(interior, slice(1, -1))

    # Boundary rows 0 and L-1: need the halos.
    pulled_all = _pull_padded(f_local, top_halo, bot_halo)
    out_top = finish(pulled_all[:, :1, :], slice(None, 1))
    out_bot = finish(pulled_all[:, -1:, :], slice(-1, None))
    return jnp.concatenate([out_top, out_interior, out_bot], axis=1)


def make_run_steps(mesh: Mesh, cfg: LatticeConfig, *, overlap: bool = True,
                   slip: bool = False):
    """Build a jitted (f, walls, n_steps) -> f over the mesh. f is
    (9, NX, NY) sharded on axis 1; walls (NX, NY) sharded on axis 0.
    With slip=True the signature becomes
    (f, walls, slip_x, slip_y, n_steps) -> f (masks sharded like walls)."""

    fspec = P(None, AXIS, None)
    wspec = P(AXIS, None)

    if slip:
        def sharded_loop_slip(f_local, walls_local, sx_l, sy_l, n_steps):
            def body(carry, _):
                return _step_local(carry, walls_local, cfg, overlap, sx_l, sy_l), None

            out, _ = jax.lax.scan(body, f_local, length=n_steps)
            return out

        @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
        def run_steps_slip(f, walls, slip_x, slip_y, n_steps: int):
            shmapped = jax.shard_map(
                partial(sharded_loop_slip, n_steps=n_steps),
                mesh=mesh,
                in_specs=(fspec, wspec, wspec, wspec),
                out_specs=fspec,
            )
            return shmapped(f, walls, slip_x, slip_y)

        return run_steps_slip

    def sharded_loop(f_local, walls_local, n_steps):
        def body(carry, _):
            return _step_local(carry, walls_local, cfg, overlap), None

        out, _ = jax.lax.scan(body, f_local, length=n_steps)
        return out

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def run_steps(f, walls, n_steps: int):
        shmapped = jax.shard_map(
            partial(sharded_loop, n_steps=n_steps),
            mesh=mesh,
            in_specs=(fspec, wspec),
            out_specs=fspec,
        )
        return shmapped(f, walls)

    return run_steps


def shard_state(mesh: Mesh, f, walls):
    """Place global arrays with the row-decomposed sharding."""
    f = jax.device_put(f, NamedSharding(mesh, P(None, AXIS, None)))
    walls = jax.device_put(walls, NamedSharding(mesh, P(AXIS, None)))
    return f, walls


def make_pallas_run_steps(
    mesh: Mesh,
    cfg: LatticeConfig,
    *,
    temporal: int | None = None,
    interpret: bool = False,
    wall_spec=None,
    has_slip: bool = False,
    fast_math: bool = False,
    rdma: bool = False,
    mask=None,
    overlap: bool = True,
):
    """Production multi-chip path: the fused Pallas kernel runs on each
    device's local row block, with the x halos (T rows of f + walls per
    pass, T = temporal depth) delivered by `jax.lax.ppermute` over ICI —
    the TPU-native form of the reference's MPI boundary-row exchange
    (README.md:44-53). Wall halos are static and exchanged once.

    mask (the host-side global walls array, optional) enables wall
    specialization of the interior launches: SPMD requires one program
    on every shard, so the local block grid is partitioned by the UNION
    of the per-shard window masks (fused_kernel.shard_partition_regions)
    — wall-free runs take the select-free kernel variant and masked runs
    get recompute regions, exactly like the single-chip path. On a
    1-device mesh the union IS the local partition, so the sharded row
    recovers the single-chip wall specialization; multi-device it is
    conservative (a block is masked if masked in ANY shard). Interior
    runs take no halo inputs, so the comm/compute overlap schedule is
    unchanged. None keeps the unspecialized single interior launch.

    rdma=True moves the halo exchange INSIDE the kernel
    (pltpu.make_async_remote_copy + neighbor barrier semaphores): each
    pass sends the edge rows over ICI at grid start, computes the
    interior blocks, and only awaits the receive before the two edge
    blocks — the reference's MPI_Isend / compute-interior / MPI_Waitall
    overlap (README.md:45-51) as one Pallas kernel. TPU-only (no
    interpret-mode support in jax 0.9).

    With wall_spec (closed-form geometry, see ops/fused_kernel.py), the
    kernel computes the mask from the shard's global row offset instead:
    no walls DMA, no wall-halo exchange.

    Returns a jitted (f, walls, n_steps) -> f over global (9, NX, NY) /
    (NX, NY) arrays with the row-decomposed sharding.
    """
    from ..ops import fused_kernel as fk

    n_dev = mesh.devices.size
    if cfg.nx % n_dev:
        raise ValueError(f"NX={cfg.nx} not divisible by {n_dev} devices")
    L = cfg.nx // n_dev
    t0 = fk.DEFAULT_TEMPORAL if temporal is None else temporal
    nyp, lpad = fk.pick_layout(cfg.ny, max(t0, 1))
    rpad = nyp - lpad - cfg.ny
    br = fk.pick_block_config(
        L,
        nyp,
        np.dtype(cfg.dtype).itemsize,
        walls_dma=wall_spec is None,
    )[0]
    if br == 0 or cfg.ny < max(t0, 1):
        raise ValueError(f"local rows {L} not tileable; use the 'sharded' XLA backend")
    if temporal is None:
        # same measured heuristic as the local planner (fused_kernel
        # _plan): T=2 for bf16 storage (halved traffic moves the DMA/VPU
        # balance; 19.2k vs 18.2k MLUPS at 800x4000) and for VMEM-capped
        # narrow blocks (shallower windows lose less to row overlap)
        temporal = min(
            2
            if (np.dtype(cfg.dtype) == np.dtype("bfloat16") or br < 32)
            else fk.DEFAULT_TEMPORAL,
            br,
        )
    T = temporal
    refresh_k = fk.refresh_interval(lpad, rpad, cfg.ny, T)
    nb = L // br

    # union-mask wall specialization of the interior launches (slip
    # masks ride the walls plane as class codes the partitioner does
    # not speak, so slip runs keep the unspecialized interior)
    edge_wm = (True, True)
    int_runs_T = int_runs_1 = sync_runs_T = sync_runs_1 = None
    if mask is not None and not rdma and not has_slip:
        if overlap and nb >= 3:
            top_wm, int_runs_T, bot_wm = fk.shard_partition_regions(
                np.asarray(mask), n_dev, br, T, cfg.ny, nyp, lpad
            )
            _, int_runs_1, _ = fk.shard_partition_regions(
                np.asarray(mask), n_dev, br, 1, cfg.ny, nyp, lpad
            )
            edge_wm = (top_wm, bot_wm)
        elif not overlap:
            sync_runs_T = fk.shard_partition_regions_sync(
                np.asarray(mask), n_dev, br, T, cfg.ny, nyp, lpad
            )
            sync_runs_1 = fk.shard_partition_regions_sync(
                np.asarray(mask), n_dev, br, 1, cfg.ny, nyp, lpad
            )

    def _trio(tdepth: int, int_runs=None, sync_runs=None):
        """The per-pass launch set at one temporal depth, as
        (step_fn, takes_htop, takes_hbot, takes_wtop, takes_wbot)
        metadata rows consumed generically by one_pass.

        overlap=True with >=3 blocks per shard: the pass is split into
        an interior segment (takes NO halo inputs — its launch has no
        data dependency on the ppermute, so XLA's latency-hiding
        scheduler runs the collective underneath it) and two one-block
        edge segments that alone consume the halos — the
        compile-anywhere form of the reference's MPI_Isend /
        compute-interior / MPI_Waitall / compute-boundary overlap
        (README.md:45-51, img/comms-overlap.png).

        overlap=False: the LOCAL path's launch economy — the union-mask
        partition over ALL blocks (shard_partition_regions_sync), with
        the halo operands attached to the runs that contain the edge
        blocks (ordered last, so the other launches still overlap the
        ppermute). On ICI the exchange is ~5-7 us/pass, far below the
        ~16 us/step each extra launch boundary costs, so this schedule
        beats the guaranteed-overlap one wherever links are ICI-class;
        overlap=True remains for comm-dominated fabrics (DCN).

        The rdma variant overlaps inside one kernel; tiny shards
        (nb < 3) have no interior and keep the single launch."""

        def mk(**kw):
            return fk.make_step(
                cfg, L, nyp, br, interpret, tdepth, external_halo=True,
                wall_spec=wall_spec, has_slip=has_slip, lpad=lpad,
                fast_math=fast_math, axis=AXIS, **kw,
            )

        def meta(fn, start, length, wall_mode):
            nt = start == 0
            nbt = start + length == nb
            sw = wall_spec is None and wall_mode
            return (fn, nt, nbt, sw and nt, sw and nbt)

        if rdma:
            return (meta(mk(rdma=True), 0, nb, True),)
        if sync_runs is not None:
            return tuple(
                meta(mk(start=s, length=ln, wall_mode=wm, region=reg),
                     s, ln, wm)
                for (s, ln, wm, reg) in sync_runs
            )
        if nb < 3 or not overlap:
            return (meta(mk(), 0, nb, True),)
        if int_runs is None:
            interior = ((mk(start=1, length=nb - 2), False, False, False, False),)
        else:
            # union-partitioned interior: masked runs (with recompute
            # regions where the DP says they pay) first, select-free
            # runs after — still zero halo inputs per launch
            interior = tuple(
                (mk(start=s, length=ln, wall_mode=wm, region=reg),
                 False, False, False, False)
                for (s, ln, wm, reg) in int_runs
            )
        return interior + (
            meta(mk(start=0, length=1, wall_mode=edge_wm[0]), 0, 1, edge_wm[0]),
            meta(mk(start=nb - 1, length=1, wall_mode=edge_wm[1]),
                 nb - 1, 1, edge_wm[1]),
        )

    steps_T = _trio(T, int_runs_T, sync_runs_T)
    steps_1 = _trio(1, int_runs_1, sync_runs_1)
    need_wt = any(m[3] for m in steps_T + steps_1)
    need_wb = any(m[4] for m in steps_T + steps_1)

    fspec = P(None, AXIS, None)
    wspec = P(AXIS, None)

    lane_to_col = (np.arange(nyp) - lpad) % cfg.ny

    def _remirror(x):
        """Rebuild the mirror pad lanes of a (..., nyp) slab from its
        real columns — applied to the halo rows each pass (they come
        from the neighbor's stored state, whose pads decay like ours).
        Expressed as slice+concat (three contiguous vector copies), NOT
        a lane gather — the gather form sat on the critical path of
        every halo-consuming launch and lowered to ~tens of us/step; the
        multi-wrap gather remains only for lattices narrower than their
        own padding (lpad > ny), where a single wrap can't fill the pad."""
        ny, rpad = cfg.ny, nyp - lpad - cfg.ny
        if lpad > ny or rpad > ny:
            return x[..., lpad : lpad + ny][..., lane_to_col]
        return jnp.concatenate(
            [x[..., ny : ny + lpad],
             x[..., lpad : lpad + ny],
             x[..., lpad : lpad + rpad]],
            axis=-1,
        )

    def _prelude(walls_l):
        """Per-shard-map-region setup shared by the plain and probed
        loops: neighbor permutations, static wall halos (or the shard's
        global row offset), and the one_pass launcher."""
        n = jax.lax.axis_size(AXIS)
        down = [(i, (i + 1) % n) for i in range(n)]
        up = [(i, (i - 1) % n) for i in range(n)]
        whtop = whbot = offset = None
        if wall_spec is None:
            # static wall halos: one exchange per run (only the masked
            # halo-consuming launches read them)
            if rdma or need_wt:
                whtop = jax.lax.ppermute(walls_l[L - T :], AXIS, down)
            if rdma or need_wb:
                whbot = jax.lax.ppermute(walls_l[:T], AXIS, up)
        else:
            # shard's global row offset for the in-kernel iota mask
            offset = (jax.lax.axis_index(AXIS) * L).astype(jnp.int32)[None]

        def one_pass(src, donor, steps, t, rfl):
            if rdma:
                # the kernel exchanges its own halos over ICI
                stepfn = steps[0][0]
                if wall_spec is not None:
                    return stepfn(src, donor, walls_l, offset, rfl)[0]
                wt = whtop[T - t :] if t < T else whtop
                return stepfn(src, donor, walls_l, wt, whbot[:t], rfl)[0]
            # the ppermutes are issued first; launches without halo
            # operands (every interior run; all but the last runs of the
            # sync schedule) have no data dependency on them, so the ICI
            # transfer rides underneath their compute
            htop = jax.lax.ppermute(src[:, L - t :, :], AXIS, down)
            hbot = jax.lax.ppermute(src[:, :t, :], AXIS, up)
            wt = wb = None
            if wall_spec is None:
                if whtop is not None:
                    wt = whtop[T - t :] if t < T else whtop
                if whbot is not None:
                    wb = whbot[:t]
            for fn, takes_ht, takes_hb, takes_wt, takes_wb in steps:
                # operand order mirrors make_step's in_specs: f halos
                # (top then bot), wall halos (top then bot) where the
                # launch stages walls, then offset (wall_spec) + refresh
                args = [src, donor, walls_l]
                if takes_ht:
                    args.append(htop)
                if takes_hb:
                    args.append(hbot)
                if wall_spec is None:
                    if takes_wt:
                        args.append(wt)
                    if takes_wb:
                        args.append(wb)
                else:
                    args.append(offset)
                donor = fn(*args, rfl)
            return donor

        return one_pass

    def _make_loop(with_rem: bool):
        def sharded_loop(f_l, walls_l, n_pairs, k1, odd):
            # the remainder (n_steps mod 2T) runs as DYNAMIC T=1 loop
            # counts inside this same program — k1 fixed-role pairs plus
            # at most one swapped-role single pass — so changing the step
            # count never recompiles the shard_map program (a
            # per-remainder-class compile once executed inside a timed
            # benchmark run through the tunnel: ~13 s of 'runtime').
            # with_rem=False (step count an exact multiple of 2T) omits
            # the T=1 pass program — a second full kernel compile a
            # remainder-free caller never uses.
            one_pass = _prelude(walls_l)

            def body(it, carry):
                a, b = carry
                p0 = 2 * jnp.asarray(it, jnp.int32)
                K = jnp.int32(refresh_k)
                b = one_pass(a, b, steps_T, T, fk._flag(jax.lax.rem(p0, K) == 0))
                a = one_pass(b, a, steps_T, T,
                             fk._flag(jax.lax.rem(p0 + 1, K) == 0))
                return (a, b)

            a, b = jax.lax.fori_loop(0, n_pairs, body, (f_l, jnp.zeros_like(f_l)))
            if not with_rem:
                return a
            on = fk._flag(True)

            def pair1(_, c):
                x, y = c
                y2 = one_pass(x, y, steps_1, 1, on)
                x2 = one_pass(y2, x, steps_1, 1, on)
                return (x2, y2)

            def single(_, c):
                x, y = c
                return (one_pass(x, y, steps_1, 1, on), x)

            a, b = jax.lax.fori_loop(0, k1, pair1, (a, b))
            a, b = jax.lax.fori_loop(0, odd, single, (a, b))
            return a

        return sharded_loop

    def _make_probed_loop(n_chunks: int, every: int):
        """Probe-fused sharded loop: n_chunks * every steps under ONE
        shard_map, emitting a psum-reduced (rho, u_x, u_y) probe gather
        after each `every`-step chunk — run_probed on the sharded
        backends as one jit + one host sync (mirrors the local
        fused_kernel._make_probed_runner's pass-structure preference:
        temporal pairs when every % (2T) == 0, single-step pairs when
        even, swapped-role single passes otherwise)."""
        from ..ops.stream_collide import probe_moments

        if every % (2 * T) == 0:
            t_used, pairs, steps_used = T, every // (2 * T), steps_T
        elif every % 2 == 0:
            t_used, pairs, steps_used = 1, every // 2, steps_1
        else:
            t_used, pairs, steps_used = 1, 0, steps_1

        def probe_local(a_l, probes):
            # each probe site lives on exactly one shard: gather locally
            # (clipped rows elsewhere), zero the out-of-shard rows, and
            # psum — every device ends with the full series chunk
            off = (jax.lax.axis_index(AXIS) * L).astype(jnp.int32)
            rows = probes[:, 0] - off
            inb = (rows >= 0) & (rows < L)
            cols = a_l[:, jnp.clip(rows, 0, L - 1), probes[:, 1] + lpad]
            vals = probe_moments(cols)
            return jax.lax.psum(
                jnp.where(inb[:, None], vals, jnp.zeros_like(vals)), AXIS
            )

        def probed_loop(f_l, walls_l, probes):
            one_pass = _prelude(walls_l)
            on = fk._flag(True)  # diagnostics mode: re-mirror every pass

            def chunk(carry, _):
                a, b = carry
                if pairs:
                    def inner(_, c):
                        x, y = c
                        y = one_pass(x, y, steps_used, t_used, on)
                        x = one_pass(y, x, steps_used, t_used, on)
                        return (x, y)

                    a, b = jax.lax.fori_loop(0, pairs, inner, (a, b))
                else:
                    for _ in range(every):
                        a, b = one_pass(a, b, steps_1, 1, on), a
                return (a, b), probe_local(a, probes)

            (a, b), series = jax.lax.scan(
                chunk, (f_l, jnp.zeros_like(f_l)), length=n_chunks
            )
            return a, series

        return probed_loop

    @functools.lru_cache(maxsize=8)
    def _jitted(with_rem: bool = True):
        @partial(jax.jit, donate_argnums=(0,))
        def run(f, walls, n_pairs, k1, odd):
            f_p, walls_p = fk.pad_state(f, walls, cfg, nyp, lpad)
            out = jax.shard_map(
                _make_loop(with_rem),
                mesh=mesh,
                in_specs=(fspec, wspec, P(), P(), P()),
                out_specs=fspec,
                # pallas_call's ShapeDtypeStruct outputs carry no vma
                # annotation, so shard_map's varying-axis check can't see
                # through them
                check_vma=False,
            )(f_p, walls_p, n_pairs, k1, odd)
            return out[:, :, lpad : lpad + cfg.ny]

        return run

    def run_steps(f, walls, n_steps: int):
        # all counts dynamic within a remainder-parity class: at most two
        # programs ever compile (with/without the T=1 remainder passes)
        q, rem = divmod(n_steps, 2 * T)
        return _jitted(bool(rem))(f, walls, q, rem // 2, rem % 2)

    @functools.lru_cache(maxsize=8)
    def _jitted_probed(n_chunks: int, every: int):
        @partial(jax.jit, donate_argnums=(0,))
        def run(f, walls, probes):
            f_p, walls_p = fk.pad_state(f, walls, cfg, nyp, lpad)
            out, series = jax.shard_map(
                _make_probed_loop(n_chunks, every),
                mesh=mesh,
                in_specs=(fspec, wspec, P()),
                out_specs=(fspec, P()),
                check_vma=False,
            )(f_p, walls_p, probes)
            return out[:, :, lpad : lpad + cfg.ny], series

        return run

    def run_probed(f, walls, n_steps: int, probes, every: int = 1):
        """(f_final, series): one jit, one host sync (see
        _make_probed_loop). probes are global (P, 2) (i, j) sites."""
        if n_steps % every:
            raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
        return _jitted_probed(n_steps // every, every)(f, walls, probes)

    run_steps.run_probed = run_probed
    return run_steps


def make_pallas_backend(mesh: Mesh | None = None, *, interpret: bool = False,
                        rdma: bool = False, overlap: bool = True):
    """Simulation-backend adapter for the sharded Pallas path. Free-slip
    masks ride the walls DMA as a class-code plane (see
    fused_kernel.class_plane). overlap=False selects the single-launch
    synchronous halo schedule (see make_pallas_run_steps)."""
    cache: dict = {}

    def _cached(f, walls, cfg, wall_spec, slip_x, slip_y, fast_math, mask):
        import hashlib

        from ..ops import fused_kernel as fk

        m = mesh if mesh is not None else make_mesh()
        has_slip = slip_x is not None or slip_y is not None
        if has_slip:
            wall_spec = None
            mask = None  # class codes; the union partitioner skips slip
            walls = fk.class_plane(walls, slip_x, slip_y)
        # the union partition is mask-dependent, so the compiled-runner
        # cache must key on the mask content (host bool array; ~0.4 MB
        # packed per 800x4000 call — microseconds, never a device fetch)
        mkey = None
        if mask is not None:
            mask = np.asarray(mask, bool)
            mkey = (mask.shape, hashlib.sha1(np.packbits(mask).tobytes()).hexdigest())
        key = (m, cfg, interpret, wall_spec, has_slip, fast_math, mkey)
        if key not in cache:
            cache[key] = make_pallas_run_steps(
                m, cfg, interpret=interpret, wall_spec=wall_spec,
                has_slip=has_slip, fast_math=fast_math, rdma=rdma,
                mask=mask, overlap=overlap,
            )
        f, walls = shard_state(m, f, walls)
        return cache[key], f, walls

    def run(f, walls, cfg, n_steps, wall_spec=None, slip_x=None, slip_y=None,
            fast_math=False, mask=None):
        rs, f, walls = _cached(f, walls, cfg, wall_spec, slip_x, slip_y,
                               fast_math, mask)
        return rs(f, walls, n_steps)

    def run_probed(f, walls, cfg, n_steps, probes, every=1, wall_spec=None,
                   slip_x=None, slip_y=None, fast_math=False, mask=None):
        rs, f, walls = _cached(f, walls, cfg, wall_spec, slip_x, slip_y,
                               fast_math, mask)
        return rs.run_probed(f, walls, n_steps, probes, every)

    run.run_probed = run_probed
    return run


def make_backend(mesh: Mesh | None = None, *, overlap: bool = True):
    """Adapt to the Simulation backend signature
    run(f, walls, cfg, n_steps). Caches the per-(mesh, cfg, overlap)
    compiled runner."""
    cache: dict = {}

    def run(f, walls, cfg, n_steps, slip_x=None, slip_y=None):
        m = mesh if mesh is not None else make_mesh()
        slip = slip_x is not None or slip_y is not None
        key = (m, cfg, overlap, slip)
        if key not in cache:
            cache[key] = make_run_steps(m, cfg, overlap=overlap, slip=slip)
        f, walls = shard_state(m, f, walls)
        if slip:
            wsharding = NamedSharding(m, P(AXIS, None))
            sx = jnp.zeros(walls.shape, bool) if slip_x is None else jnp.asarray(slip_x, bool)
            sy = jnp.zeros(walls.shape, bool) if slip_y is None else jnp.asarray(slip_y, bool)
            sx = jax.device_put(sx, wsharding)
            sy = jax.device_put(sy, wsharding)
            return cache[key](f, walls, sx, sy, n_steps)
        return cache[key](f, walls, n_steps)

    return run
