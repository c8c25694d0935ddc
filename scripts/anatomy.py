"""On-chip kernel anatomy: where does the step time go?

Measures, on the real TPU, the cost of each piece of the fused
collide-stream kernel (ops/fused_kernel.py) at the headline config
(800x4000 f32, spec walls), plus the raw ceilings that bound it:

  xla_copy        XLA's own streaming loop over the same bytes (the
                  bandwidth ceiling the Pallas DMA path is judged against)
  copy BR=..      rotating-slot pure-copy pipelines (the Pallas DMA
                  ceiling at each block size)
  roll shift=..   cost of pltpu.roll by +1 vs nyp-1 lanes (the periodic
                  y-shift primitive: a 4095-lane roll lowered as a long
                  permute chain would dominate the VPU budget)
  ablations       full kernel with one piece removed at a time

Usage:  python scripts/anatomy.py [--steps 400] [--section all]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX, NY = 800, 4000
LANE = 128
NYP = (NY + LANE - 1) // LANE * LANE
NSP = 9


def timed(fn, *args, steps_per_call=1, reps=3):
    """Best wall time per inner step; forces results with a scalar fetch
    (block_until_ready is unreliable through the axon tunnel)."""
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, (time.perf_counter() - t0) / steps_per_call)
    return best


def timed_slope(fn_of_n, n1, n2, steps_per_n=1, reps=3):
    """Per-step time from the slope between two call sizes — cancels the
    fixed per-call cost (tunnel RPC + dispatch, ~25 ms here) exactly."""
    fn_of_n(n1)  # compile/warm
    t1 = timed(fn_of_n, n1, reps=reps)
    t2 = timed(fn_of_n, n2, reps=reps)
    return (t2 - t1) / ((n2 - n1) * steps_per_n)


def report(label, dt, traffic_bytes=None, sites_steps=None):
    line = f"{label:42s} {dt * 1e6:9.1f} us/pass"
    if traffic_bytes:
        line += f"  {traffic_bytes / dt / 1e9:7.1f} GB/s"
    if sites_steps:
        line += f"  {sites_steps / dt / 1e6:9.0f} MLUPS"
    print(line, flush=True)


# ---------------------------------------------------------------- xla ceiling


def xla_ceiling(n_steps):
    x = jnp.zeros((NSP, NX, NYP), jnp.float32)

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: v + 1.0, x)

    dt = timed_slope(lambda n: loop(x, n), n_steps, 2 * n_steps)
    report("xla elementwise loop", dt, traffic_bytes=2 * x.size * 4)


# ------------------------------------------------------- copy-only pipelines


def copy_pipeline(br, slots, n_steps, split_rows=0):
    """The fused kernel's rotating-slot DMA structure with compute removed:
    stage block (k-1) mod G into slot k mod SLOTS, then copy the body slot
    to the output block. split_rows>0 splits each block DMA into row
    chunks of that many rows on independent semaphores."""
    n_blocks = NX // br
    nsub = br // split_rows if split_rows else 1

    def kernel(f_hbm, donor, out_ref, fbody, sems):
        del donor
        i = pl.program_id(0)

        def copies(k):
            blk = jax.lax.rem(k + (n_blocks - 1), n_blocks)
            slot = jax.lax.rem(k, slots)
            r0 = blk * jnp.int32(br)
            if not split_rows:
                return [
                    pltpu.make_async_copy(
                        f_hbm.at[:, pl.ds(r0, br), :], fbody.at[slot], sems.at[slot, 0]
                    )
                ]
            return [
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(r0 + c * split_rows, split_rows), :],
                    fbody.at[slot, :, pl.ds(c * split_rows, split_rows), :],
                    sems.at[slot, c],
                )
                for c in range(nsub)
            ]

        @pl.when(i == 0)
        def _():
            for k in range(min(slots - 1, n_blocks + 2)):
                for c in copies(k):
                    c.start()
            for k in (0, 1):
                for c in copies(k):
                    c.wait()

        @pl.when(i + slots - 1 < n_blocks + 2)
        def _():
            for c in copies(i + slots - 1):
                c.start()

        for c in copies(i + 2):
            c.wait()

        s_body = jax.lax.rem(i + 1, slots)
        out_ref[...] = fbody[s_body]

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NSP, NX, NYP), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (NSP, br, NYP), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((slots, NSP, br, NYP), jnp.float32),
            pltpu.SemaphoreType.DMA((slots, max(nsub, 1))),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @jax.jit
    def loop(a, b, n):
        def body(_, c):
            x, y = c
            y = step(x, y)
            x = step(y, x)
            return (x, y)

        return jax.lax.fori_loop(0, n, body, (a, b))

    a = jnp.zeros((NSP, NX, NYP), jnp.float32)
    b = jnp.zeros_like(a)
    dt = timed_slope(lambda n: loop(a, b, n), n_steps // 2, n_steps, steps_per_n=2)
    tag = f"copy BR={br} slots={slots}" + (f" split={split_rows}" if split_rows else "")
    report(tag, dt, traffic_bytes=2 * a.size * 4)


# ----------------------------------------------------------------- roll cost


def roll_cost(shift, n_steps, rows=32, n_rolls=6):
    """n_rolls chained lane-rolls on a resident (rows, NYP) block, looped
    in VMEM — isolates the VPU cost of the periodic y-shift."""

    def kernel(x_ref, o_ref):
        v = x_ref[...]
        for _ in range(n_rolls):
            v = pltpu.roll(v, shift, axis=1)
        o_ref[...] = v

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, NYP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: step(v), x)

    x = jnp.zeros((rows, NYP), jnp.float32)
    dt = timed_slope(lambda n: loop(x, n), n_steps, 2 * n_steps, steps_per_n=n_rolls)
    print(f"roll shift={shift:5d} ({rows}x{NYP})            {dt * 1e9:9.1f} ns/roll", flush=True)


# ---------------------------------------------------------- alignment probes


def align_cost(offset, n_steps, rows=40, n_ops=8):
    """Chained adds on (rows-2, NYP) sublane-offset slices of a resident
    block — isolates the cost of operating on misaligned row windows
    (the fused kernel's pulled planes are row-offset slices)."""

    def kernel(x_ref, o_ref):
        a = x_ref[offset : rows - 2 + offset]
        b = x_ref[2 - offset : rows - offset]
        v = a
        for _ in range(n_ops):
            v = v + b
        o_ref[...] = v

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows - 2, NYP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x, n):
        def body(_, v):
            s = step(v)
            return jnp.concatenate([s, v[rows - 2 :]], axis=0)

        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.zeros((rows, NYP), jnp.float32)
    dt = timed_slope(lambda n: loop(x, n), n_steps, 2 * n_steps, steps_per_n=n_ops)
    print(f"add offset={offset} ({rows}x{NYP})             {dt * 1e9:9.1f} ns/op",
          flush=True)


def sublane_roll_cost(shift, n_steps, rows=40, n_rolls=8):
    def kernel(x_ref, o_ref):
        v = x_ref[...]
        for _ in range(n_rolls):
            v = pltpu.roll(v, shift, axis=0)
        o_ref[...] = v

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, NYP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: step(v), x)

    x = jnp.zeros((rows, NYP), jnp.float32)
    dt = timed_slope(lambda n: loop(x, n), n_steps, 2 * n_steps, steps_per_n=n_rolls)
    print(f"subroll shift={shift} ({rows}x{NYP})            {dt * 1e9:9.1f} ns/roll",
          flush=True)


# ----------------------------------------------------------------- ablations


def ablation(name, ablate, n_steps, temporal=4, br=32, dtype="float32"):
    from latticeboltzmann_tpu.core.geometry import channel_with_barrier, infer_spec
    from latticeboltzmann_tpu.core.spec import LatticeConfig
    from latticeboltzmann_tpu.models.engine import initial_state
    from latticeboltzmann_tpu.ops import fused_kernel as fk

    cfg = LatticeConfig(nx=NX, ny=NY, dtype=dtype)
    walls = channel_with_barrier(NX, NY)
    spec = infer_spec(walls)
    f = initial_state(cfg)
    nyp, lpad = fk.pick_layout(NY, max(temporal, 1))
    f_p, walls_p = fk.pad_state(f, walls, cfg, nyp, lpad)
    step = fk.make_step(
        cfg, NX, nyp, br, temporal=temporal, wall_spec=spec, ablate=ablate,
        lpad=lpad,
    )
    K = fk.refresh_interval(lpad, nyp - lpad - NY, NY, temporal)

    @jax.jit
    def loop(a, b, w, n):
        def body(it, c):
            x, y = c
            p0 = 2 * jnp.asarray(it, jnp.int32)
            y = step(x, y, w, fk._flag(jax.lax.rem(p0, jnp.int32(K)) == 0))
            x = step(y, x, w, fk._flag(jax.lax.rem(p0 + 1, jnp.int32(K)) == 0))
            return (x, y)

        return jax.lax.fori_loop(0, n, body, (a, b))

    b0 = jnp.zeros_like(f_p)
    n_pairs = max(n_steps // (2 * temporal), 2)
    dt = timed_slope(
        lambda n: loop(f_p, b0, walls_p, n), n_pairs, 2 * n_pairs,
        steps_per_n=2 * temporal,
    )
    report(f"kernel T={temporal} BR={br} {name}", dt, sites_steps=NX * NY)


def production(n_steps, temporal=4, dtype="float32", segs=None, use_spec=True,
               tag="", row_shift=0, scene="scaled", skew=False,
               ablate=frozenset()):
    """The real run_steps path: wall_segments partition + chained
    masked/wall-free segment kernels. segs overrides the partition
    (perf-lab); use_spec=False exercises the DMA-mask path. scene
    "scaled" = channel_with_barrier (barrier scales with the lattice);
    "reference" = geometry.reference_barrier (the fixed 200x5 barrier
    of src/latticeboltzmann.c:567-573 — bench.py's scene)."""
    from latticeboltzmann_tpu.core.geometry import (
        channel_with_barrier, infer_spec, reference_barrier,
    )
    from latticeboltzmann_tpu.core.spec import LatticeConfig
    from latticeboltzmann_tpu.models.engine import initial_state
    from latticeboltzmann_tpu.ops import fused_kernel as fk

    cfg = LatticeConfig(nx=NX, ny=NY, dtype=dtype)
    builder = reference_barrier if scene == "reference" else channel_with_barrier
    walls = builder(NX, NY)
    spec = infer_spec(walls) if use_spec else None
    f = initial_state(cfg)
    nyp, lpad = fk.pick_layout(NY, temporal)
    br = fk.pick_block_config(
        NX, nyp, np.dtype(dtype).itemsize, walls_dma=spec is None
    )[0]
    if segs is None:
        # the production partition (recompute regions), matching _plan
        row_shift, segs = fk.wall_partition_regions(
            np.asarray(walls), br, temporal, NY, nyp, lpad
        )
    f_p, walls_p = fk.pad_state(f, walls, cfg, nyp, lpad, row_shift)
    if ablate:
        # ablated variants bypass the cached runner path (lru keys would
        # collide): build the pass chain directly, no remainder program
        _orig = fk.make_step
        fk_make = functools.partial(_orig, ablate=ablate)
        fk.make_step = fk_make
        try:
            one_pass = fk._make_pass(cfg, NX, nyp, br, False, temporal, spec,
                                     False, lpad, segs, row_shift, skew=skew)
        finally:
            fk.make_step = _orig

        # same pad-remirror cadence as _make_runner: every
        # refresh_interval() passes (an it==0-only refresh would let the
        # pads decay past validity AND exclude the periodic remirror
        # cost from the measurement)
        K = fk.refresh_interval(lpad, nyp - lpad - NY, NY, temporal)

        @jax.jit
        def runner(f_p, walls_p, n_pairs, k1, odd):
            def body(it, c):
                a, b = c
                p0 = 2 * jnp.asarray(it, jnp.int32)
                b = one_pass(a, b, walls_p,
                             fk._flag(jax.lax.rem(p0, jnp.int32(K)) == 0))
                a = one_pass(b, a, walls_p,
                             fk._flag(jax.lax.rem(p0 + 1, jnp.int32(K)) == 0))
                return (a, b)
            a, b = jax.lax.fori_loop(
                0, n_pairs, body, (f_p, jnp.zeros_like(f_p)))
            return a, b, fk._checksum(a)
    else:
        runner = fk._make_runner(
            cfg, NX, nyp, br, False, temporal, spec, False, lpad, segs,
            row_shift, skew=skew,
            with_remainder=False,  # slope counts are exact multiples of 2T
        )

    def call(n):  # runner donates: hand it a fresh buffer each call
        return runner(f_p + 0, walls_p, n, 0, 0)[0]

    n_pairs = max(n_steps // (2 * temporal), 2)
    dt = timed_slope(call, n_pairs, 2 * n_pairs, steps_per_n=2 * temporal)
    report(
        f"production T={temporal} BR={br} segs={len(segs)}"
        f"{' skew' if skew else ''} {dtype} {tag}",
        dt, sites_steps=NX * NY,
    )


def flat(n_steps, temporal=3, P=16, dtype="float32", tag="",
         ablate=frozenset()):
    """The flat (multipass) kernel: P whole passes per launch,
    eliminating the per-pass launch boundary the free-floor measurement
    itself pays (~36-48 us/pass; docs/TUNING.md launch-boundary tax).
    Wall-free lattice — the flat kernel's supported scope."""
    from latticeboltzmann_tpu.core.spec import LatticeConfig
    from latticeboltzmann_tpu.models.engine import initial_state
    from latticeboltzmann_tpu.ops import fused_kernel as fk

    cfg = LatticeConfig(nx=NX, ny=NY, dtype=dtype)
    walls = np.zeros((NX, NY), bool)
    nyp, lpad = fk.pick_layout(NY, temporal)
    br = fk.pick_block_config(
        NX, nyp, np.dtype(dtype).itemsize, temporal, walls_dma=False
    )[0]
    step = fk.make_flat_step(cfg, NX, nyp, br, False, temporal, lpad, P,
                             ablate=ablate)
    f_p, _ = fk.pad_state(
        jnp.asarray(initial_state(cfg)), jnp.asarray(walls), cfg, nyp, lpad
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def runner(f2, n_chunks):
        def body(it, s):
            return step(s, jnp.reshape(it * jnp.int32(P), (1,)))

        s = jax.lax.fori_loop(0, n_chunks, body, f2)
        return s, jnp.sum(s[0, 0, 0, :8].astype(jnp.float32))

    def call(n_chunks):
        return runner(jnp.stack([f_p, f_p]), n_chunks)[1]

    spc = P * temporal  # steps per chunk
    n1 = max(n_steps // spc, 2)
    dt = timed_slope(call, n1, 3 * n1, steps_per_n=spc)
    report(f"flat T={temporal} P={P} BR={br} {dtype} {"+".join(sorted(ablate))} {tag}",
           dt, sites_steps=NX * NY)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--section", default="all",
                    choices=["all", "xla", "copy", "roll", "align", "ablate",
                             "sweep", "prod", "split", "bf16", "floor",
                             "skew", "launchtax", "flat", "slim"])
    args = ap.parse_args()
    from latticeboltzmann_tpu.utils.tpulock import tpu_lock

    # hold the inter-process TPU lock for the process's whole lifetime
    # (flock auto-releases on exit; see utils/tpulock.py). The context
    # manager MUST stay referenced: a bare tpu_lock().__enter__() is
    # garbage-collected immediately, which throws GeneratorExit into the
    # generator and runs its finally — silently releasing the lock.
    global _TPU_LOCK_CM
    _TPU_LOCK_CM = tpu_lock()
    _TPU_LOCK_CM.__enter__()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    if args.section in ("all", "xla"):
        xla_ceiling(args.steps)
    if args.section in ("all", "copy"):
        for br, slots in ((32, 6), (32, 8), (16, 6), (8, 6), (8, 12)):
            copy_pipeline(br, slots, args.steps)
        copy_pipeline(32, 6, args.steps, split_rows=8)
    if args.section in ("all", "roll"):
        for shift in (1, NYP - 1, 96, 4000):
            roll_cost(shift, max(args.steps, 2000))
    if args.section in ("all", "align"):
        for off in (0, 1, 2):
            align_cost(off, max(args.steps, 2000))
        for shift in (1, 39):
            sublane_roll_cost(shift, max(args.steps, 2000))
    if args.section in ("all", "ablate"):
        for name, ab in [
            ("full", frozenset()),
            ("mulsel (arith select)", frozenset({"mulsel"})),
            ("negroll", frozenset({"negroll"})),
            ("approx recip", frozenset({"recip"})),
            ("recip+negroll+mulsel",
             frozenset({"recip", "negroll", "mulsel"})),
            ("no-walls (selects off)", frozenset({"walls", "force"})),
        ]:
            try:
                ablation(name, ab, args.steps)
            except Exception as e:  # Mosaic may reject ablated variants
                print(f"kernel T=4 BR=32 {name}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
    if args.section in ("all", "sweep"):
        for temporal, br in ((4, 80), (5, 80), (6, 80), (4, 32), (8, 80), (4, 40)):
            try:
                ablation("", frozenset(), args.steps, temporal=temporal, br=br)
            except Exception as e:
                print(f"kernel T={temporal} BR={br}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
    if args.section in ("all", "prod"):
        for t in (4, 5):
            try:
                production(args.steps, temporal=t)
            except Exception as e:
                print(f"production T={t}: FAILED "
                      f"({type(e).__name__}: {str(e)[:150]})", flush=True)
    if args.section in ("all", "bf16"):
        # precision-layer payoff: bf16 storage halves HBM traffic, which
        # pays exactly in the bandwidth-bound regimes (low temporal
        # depth; the multi-chip halo-heavy case) — at T=4 the DMA is
        # already hidden behind the VPU and bf16 buys ~nothing
        for dt, t in (("float32", 1), ("bfloat16", 1), ("float32", 2),
                      ("bfloat16", 2), ("bfloat16", 4)):
            try:
                production(args.steps, temporal=t, dtype=dt)
            except Exception as e:
                print(f"bf16 cmp {dt} T={t}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
    if args.section == "floor":
        # Floor decomposition at the headline config (not part of "all"
        # — it recompiles three program families): how much of the
        # production step is an irreducible wall-free floor vs wall
        # handling (full-mask selects vs the region partition). The
        # free-floor row is the hard lower bound any wall-handling
        # scheme can reach at that T.
        for t in (3, 4):
            for segs, tag, scene in (
                (((0, None, False, None),), "free-floor", "scaled"),
                (((0, None, True, None),), "full-mask", "scaled"),
                (None, "auto-regions-ref", "reference"),
                (None, "auto-regions-scaled", "scaled"),
            ):
                try:
                    production(args.steps, temporal=t, segs=segs, tag=tag,
                               scene=scene)
                except Exception as e:
                    print(f"floor {tag} T={t}: FAILED "
                          f"({type(e).__name__}: {str(e)[:150]})", flush=True)
    if args.section == "skew":
        # Wavefront time-skewing (emit_carry + skew launches): fixed
        # (BR+2)-row parallelogram windows with carry through VMEM
        # scratch — zero overlap recompute at any T, making deep
        # temporal blocking (halved HBM traffic) affordable. Compare
        # against the trapezoid baseline at each T on the reference
        # scene, plus the free-floor form (no walls) that isolates the
        # skew kernel itself, plus the direct-dataflow concat variant
        # (a compile probe: rolled values feeding concats crash some
        # Mosaic versions).
        free = ((0, None, False, None),)
        for t in (3, 4, 6):
            for sk, tag in ((False, "trapezoid"), (True, "wavefront")):
                try:
                    production(args.steps, temporal=t, segs=free,
                               tag=f"free {tag}", skew=sk)
                except Exception as e:
                    print(f"skew free T={t} {tag}: FAILED "
                          f"({type(e).__name__}: {str(e)[:150]})", flush=True)
        for t in (3, 4, 6):
            for sk, tag in ((False, "trapezoid"), (True, "wavefront")):
                try:
                    production(args.steps, temporal=t, scene="reference",
                               tag=f"ref {tag}", skew=sk)
                except Exception as e:
                    print(f"skew ref T={t} {tag}: FAILED "
                          f"({type(e).__name__}: {str(e)[:150]})", flush=True)
        try:
            production(args.steps, temporal=4, segs=free, skew=True,
                       tag="free wavefront CONCAT",
                       ablate=frozenset({"skewconcat"}))
        except Exception as e:
            print(f"skew concat probe: FAILED "
                  f"({type(e).__name__}: {str(e)[:150]})", flush=True)
        for t in (2, 3):
            try:
                production(args.steps, temporal=t, scene="reference",
                           dtype="bfloat16", tag="ref wavefront", skew=True)
            except Exception as e:
                print(f"skew bf16 T={t}: FAILED "
                      f"({type(e).__name__}: {str(e)[:150]})", flush=True)
    if args.section == "launchtax":
        # Launch-boundary tax, measured in one session (the basis of
        # fused_kernel.LAUNCH_COST_PASS_UNITS): all-free splits isolate
        # the pure boundary cost (no select/region differences), then
        # the masked partitions price wall handling on top. 2026-08-18,
        # 800x4000 f32 T=3, reference scene: free 1L 141.7/139.1 (two
        # anchors), free 2L 156.7 (+15.9/boundary), free 3L 166.0,
        # coarse masked 2L 165.1/162.9, auto-regions 3L 168.7 — the
        # boundary dominates the select/region savings, so the DP must
        # price it honestly (the old 2400-unit guess over-split).
        # Post-slim re-run (2026-08-20): free 1L 142.0/139.3, 2L 147.6
        # (+6.9/boundary), 3L 156.6, coarse masked 2L 162.5, auto
        # 165.0 — the boundary tax HALVED, but the DP constant stays
        # 24000: the cheaper-boundary-derived ~13000 flips the scene to
        # a 3L regions plan that measures ~9 us/step WORSE (see the
        # constant's round-5 note and docs/TUNING.md).
        import numpy as _np
        from latticeboltzmann_tpu.core.geometry import reference_barrier
        from latticeboltzmann_tpu.ops import fused_kernel as fk

        T = 3
        nyp_, lpad_ = fk.pick_layout(NY, T)
        walls_ = _np.asarray(reference_barrier(NX, NY))
        shift_, auto_ = fk.wall_partition_regions(walls_, 32, T, NY, nyp_, lpad_)
        print(f"auto partition (shift={shift_}): {auto_}")
        nb_ = NX // 32
        n_masked = 8  # reference scene: 8-block wall run (channel + barrier)
        cases = [
            ("free 1L", ((0, None, False, None),), 0),
            ("free 2L", ((nb_ - n_masked, n_masked, False, None),
                         (0, nb_ - n_masked, False, None)), shift_),
            ("free 3L", ((nb_ - n_masked, 2, False, None),
                         (nb_ - n_masked + 2, n_masked - 2, False, None),
                         (0, nb_ - n_masked, False, None)), shift_),
            ("coarse masked 2L", ((nb_ - n_masked, n_masked, True, None),
                                  (0, nb_ - n_masked, False, None)), shift_),
            ("auto (production)", None, 0),
            ("free 1L again", ((0, None, False, None),), 0),
        ]
        for tag, segs, rs in cases:
            try:
                production(args.steps, temporal=T, segs=segs, tag=tag,
                           scene="reference", row_shift=rs)
            except Exception as e:
                print(f"launchtax {tag}: FAILED "
                      f"({type(e).__name__}: {str(e)[:150]})", flush=True)
    if args.section == "flat":
        # flat multipass kernel vs the classic per-pass free floor, in
        # one session: how much of the ~36-48 us/pass boundary tax does
        # fusing P passes into one launch recover?
        free = ((0, None, False, None),)
        try:
            production(args.steps, temporal=3, segs=free, tag="free 1L anchor")
        except Exception as e:
            print(f"flat anchor: FAILED ({type(e).__name__}: {str(e)[:150]})",
                  flush=True)
        for t, P in ((3, 16), (3, 32), (4, 16), (2, 16)):
            try:
                flat(args.steps, temporal=t, P=P)
            except Exception as e:
                print(f"flat T={t} P={P}: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})", flush=True)
        try:
            production(args.steps, temporal=3, segs=free, tag="free 1L again")
        except Exception as e:
            print(f"flat anchor2: FAILED ({type(e).__name__}: {str(e)[:150]})",
                  flush=True)
    if args.section == "slim":
        # Slim halo-role staging A/B (round 5): the halo-role issues of
        # every launch stage one 8-row sliver instead of a whole
        # br-row block (ops/fused_kernel.py "slim halo-role staging").
        # The saving scales with launch count (two slimmed ends per
        # launch), so measure the production auto plan (2 launches on
        # the reference scene) AND a free 3-launch split, interleaved
        # slim/noslim reps in one session so chip/session variance
        # cannot masquerade as the effect.
        nb_ = NX // 32
        free3 = ((nb_ - 8, 2, False, None), (nb_ - 6, 6, False, None),
                 (0, nb_ - 8, False, None))
        for rep in (1, 2):
            for tag, ab in (("slim", frozenset()),
                            ("noslim", frozenset({"noslim"}))):
                for ptag, segs in (("auto", None), ("free 3L", free3)):
                    try:
                        production(args.steps, temporal=3, segs=segs,
                                   scene="reference",
                                   tag=f"{ptag} {tag} rep{rep}", ablate=ab)
                    except Exception as e:
                        print(f"slim {ptag} {tag}: FAILED "
                              f"({type(e).__name__}: {str(e)[:150]})",
                              flush=True)
    if args.section in ("all", "split"):
        B = ((17, 8, True), (0, 17, False))
        cases = [
            ("B1 explicit", B, 224),
            ("auto (wall_partition)", None, 0),
            ("B2 explicit again", B, 224),
            ("auto again", None, 0),
        ]
        for tag, segs, rs in cases:
            try:
                production(args.steps, temporal=4, segs=segs, tag=tag,
                           row_shift=rs)
            except Exception as e:
                print(f"split {tag}: FAILED ({type(e).__name__}: {str(e)[:150]})",
                      flush=True)


if __name__ == "__main__":
    main()
