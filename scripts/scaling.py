"""Sharded scaling + communication-fraction measurements.

The reference validates its MPI backend with node-count scaling tables
(mpi-runtimes.dat) and MPI trace timelines showing the comm fraction
with and without overlap (img/comms-no-overlap.png, img/comms-overlap.png,
README.md:44-57). Single-chip era analog, two modes:

  --mode cpu   correctness + relative cost of the sharded paths on a
               virtual 8-device CPU mesh (re-execs itself with
               JAX_PLATFORMS=cpu and xla_force_host_platform_device_count)
  --mode tpu   single-chip timings of the unsharded vs 8-way sharded
               paths, plus a perfetto trace of the sharded XLA step with
               the collective-permute (halo exchange) time extracted —
               the comm-%% number the reference reads off its MPI traces

  --mode predict  the mpi-runtimes.dat analog for a 1-chip environment:
               measured per-shard step times at each shard height + an
               ICI halo-traffic model -> a 2/4/8-chip scaling table,
               clearly labeled PREDICTED (see mode_predict docstring);
               includes the DP (ds64 pair) section mirroring the
               reference's DP MPI column

  --mode ab    overlap-vs-sync schedule A/B (sharded-pallas vs
               sharded-pallas-fused) with perfetto trace capture and
               programmatic permute-fraction/overlap extraction — the
               executable analog of img/comms-{no-,}overlap.png

Writes markdown rows to stdout; paste into docs/SCALING.md.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_steps(sim_factory, steps, warmup=24):
    sim = sim_factory()
    sim.run(warmup)
    sim.elapsed = 0.0
    sim.steps_done = 0
    sim.run(steps)
    return sim


def _slope_time(sim, n1=240, n2=720, reps=2):
    """Per-step time as the slope between n1- and n2-step runs (cancels
    fixed per-dispatch overhead; bench.py's defended methodology). n1/n2
    are multiples of 240 = lcm(2T) over the temporal depths in use, so
    both hit the same zero-remainder pre-compiled runner."""
    def timed(n):
        sim.elapsed = 0.0
        sim.steps_done = 0
        sim.run(n)
        return sim.elapsed

    sim.run(n1)  # warm this exact program
    timed(n1)
    t1 = min(timed(n1) for _ in range(reps))
    t2 = min(timed(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def mode_cpu(args):
    import numpy as np

    import jax
    from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry
    from latticeboltzmann_tpu.parallel import sharded

    cfg = LatticeConfig(nx=256, ny=200, dtype=np.float32)
    walls = geometry.channel_with_barrier(cfg.nx, cfg.ny)
    ref = Simulation(cfg, walls, backend="xla").run(args.steps).state()

    print(f"devices: {jax.devices()}")
    print()
    print("| devices | backend | max abs dev vs unsharded | steps/s (CPU, relative only) |")
    print("|---|---|---|---|")
    for n_dev in (1, 2, 4, 8):
        mesh = sharded.make_mesh(n_dev)
        for backend in ("sharded", "sharded-sync", "sharded-pallas-interpret"):
            from latticeboltzmann_tpu.models import engine

            if backend == "sharded":
                run = sharded.make_backend(mesh, overlap=True)
            elif backend == "sharded-sync":
                run = sharded.make_backend(mesh, overlap=False)
            else:
                run = sharded.make_pallas_backend(mesh, interpret=True)
            engine.register_backend("_scal", run)
            t0 = time.perf_counter()
            sim = Simulation(cfg, walls, backend="_scal").run(args.steps)
            dt = time.perf_counter() - t0
            dev = float(abs(sim.state() - ref).max())
            rate = args.steps / dt
            print(f"| {n_dev} | {backend} | {dev:.2e} | {rate:.1f} |", flush=True)
            assert dev < 1e-4, f"{backend}@{n_dev} diverged: {dev}"
    print("\nall sharded configurations match the unsharded engine")


def _perfetto_comm_fraction(trace_dir):
    """Total collective-permute time / total device compute time from a
    perfetto trace (the programmatic read of what the reference's MPI
    timeline screenshots show)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    comm = total = 0.0
    names = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        lname = name.lower()
        if "fusion" in lname or "permute" in lname or "copy" in lname or \
           "while" in lname or "pallas" in lname or "custom-call" in lname:
            total += dur
            if "permute" in lname:
                comm += dur
                names[name] = names.get(name, 0.0) + dur
    if total == 0:
        return None
    return comm, total, names


def mode_tpu(args):
    import numpy as np

    import jax
    from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry
    from latticeboltzmann_tpu.parallel import sharded
    from latticeboltzmann_tpu.models import engine

    cfg = LatticeConfig(nx=400, ny=2000, dtype=np.float32)
    walls = geometry.reference_barrier(cfg.nx, cfg.ny)
    # round to a multiple of 12 = lcm(2T) over the temporal defaults so
    # no backend compiles its remainder program inside the timed run
    steps = max(12, args.steps - args.steps % 12)

    print(f"device: {jax.devices()[0].device_kind}; lattice 400x2000 f32, {steps} steps")
    print()
    print("| backend | MLUPS | note |")
    print("|---|---|---|")
    rows = [
        ("pallas", "unsharded fused kernel"),
        ("sharded-pallas", "shard_map + ppermute halos (1-device mesh here)"),
        ("sharded", "XLA engine, overlapped halo exchange"),
        ("sharded-sync", "XLA engine, exchange-then-compute"),
    ]
    for backend, note in rows:
        try:
            sim = _timed_steps(
                lambda b=backend: Simulation(cfg, walls, backend=b), steps
            )
            print(f"| {backend} | {sim.mlups:.0f} | {note} |", flush=True)
        except Exception as e:
            print(f"| {backend} | FAILED | {type(e).__name__}: {str(e)[:80]} |",
                  flush=True)

    # comm fraction from a perfetto trace of the sharded XLA path
    trace_dir = args.trace_dir
    os.makedirs(trace_dir, exist_ok=True)
    sim = Simulation(cfg, walls, backend="sharded")
    sim.run(16)  # compile outside the trace
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    sim.run(64)
    jax.profiler.stop_trace()
    res = _perfetto_comm_fraction(trace_dir)
    if res is None:
        print("\n(no perfetto trace events found)")
        return
    comm, total, names = res
    print(f"\nhalo-exchange (collective-permute) time: {comm/1e3:.2f} ms "
          f"of {total/1e3:.2f} ms device time = {100*comm/total:.1f}%")
    for n, d in sorted(names.items(), key=lambda kv: -kv[1])[:5]:
        print(f"  {d/1e3:8.2f} ms  {n}")

    # same extraction for the production sharded-PALLAS path, plus an
    # overlap check: how much of the permute time runs concurrently with
    # a kernel launch (the interior segment has no data dependency on
    # the ppermute, so a scheduler that overlaps shows ~100% here — the
    # programmatic read of the reference's img/comms-overlap.png)
    trace_dir2 = args.trace_dir + "_pallas"
    os.makedirs(trace_dir2, exist_ok=True)
    sim = Simulation(cfg, walls, backend="sharded-pallas")
    sim.run(16)
    jax.profiler.start_trace(trace_dir2, create_perfetto_trace=True)
    sim.run(64)
    jax.profiler.stop_trace()
    res2 = _perfetto_comm_fraction(trace_dir2)
    ov = _perfetto_overlap(trace_dir2)
    if res2 is None or res2[0] < 50.0:  # <50 us: no real permute
        print("\nsharded-pallas: no collective-permute events in the trace "
              "— on a 1-device mesh the ppermute lowers to a local copy, "
              "so there is nothing to overlap; the overlap evidence on one "
              "chip is the dataflow itself (the interior-segment launch "
              "takes no halo inputs; parallel/sharded.py _trio) plus the "
              "XLA backend's measured overlap above.")
    else:
        comm, total, _ = res2
        print(f"\nsharded-pallas: permute time {comm/1e3:.2f} ms of "
              f"{total/1e3:.2f} ms = {100*comm/max(total,1e-9):.1f}%")
        if ov is not None:
            p_tot, p_ov = ov
            print(f"sharded-pallas: {100*p_ov/max(p_tot,1e-9):.1f}% of permute "
                  f"time overlapped with kernel compute "
                  f"(reference overlap mode: README.md:45-51)")


def mode_ab(args):
    """Overlap-vs-sync A/B of the two sharded-Pallas halo schedules with
    jax.profiler trace capture wired in — the executable analog of the
    reference's img/comms-no-overlap.png vs img/comms-overlap.png pair
    (README.md:45-51). Both schedules are slope-timed on the reference
    scenes, then each is traced and the collective-permute fraction and
    permute/compute overlap percentage extracted programmatically. On a
    1-device mesh the ppermutes lower to local copies (no
    collective-permute device events — reported explicitly), so the
    single-chip run measures the schedules' launch economics and proves
    the capture pipeline; on a real multi-chip mesh THIS SAME COMMAND
    yields the measured comm fractions the reference reads off its MPI
    timelines."""
    import numpy as np

    import jax
    from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry

    print(f"device: {jax.devices()[0].device_kind}; "
          f"{jax.device_count()} device(s) visible")
    print("\n| scene | schedule | backend | us/step | MLUPS (slope) | permute evidence |")
    print("|---|---|---|---|---|---|")
    for nx, ny in ((400, 2000), (800, 4000)):
        cfg = LatticeConfig(nx=nx, ny=ny, dtype=np.float32)
        walls = geometry.reference_barrier(nx, ny)
        for sched, backend in (("overlap", "sharded-pallas"),
                               ("sync", "sharded-pallas-fused")):
            sim = Simulation(cfg, walls, backend=backend)
            t = _slope_time(sim)
            tdir = os.path.join(f"{args.trace_dir}_ab", f"{nx}x{ny}_{sched}")
            os.makedirs(tdir, exist_ok=True)
            jax.profiler.start_trace(tdir, create_perfetto_trace=True)
            sim.run(60)
            jax.profiler.stop_trace()
            res = _perfetto_comm_fraction(tdir)
            ov = _perfetto_overlap(tdir)
            if res is None or res[0] < 50.0:
                ev = "no permute device events (1-device mesh: local copy)"
            else:
                comm, total, _ = res
                ev = f"permute {100*comm/total:.1f}% of device time"
                if ov:
                    ev += (f", {100*ov[1]/max(ov[0],1e-9):.0f}% overlapped "
                           "with kernel compute")
            print(f"| {nx}x{ny} | {sched} | {backend} | {t*1e6:.1f} | "
                  f"{nx*ny/t/1e6:.0f} | {ev} |", flush=True)


def _perfetto_overlap(trace_dir):
    """(permute_total_us, permute_overlapped_us): how much permute time
    coincides with a Pallas kernel slice on another track."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    kerns, perms = [], []
    for e in events:
        name = e.get("name", "").lower()
        iv = (float(e.get("ts", 0.0)), float(e.get("ts", 0.0)) + float(e.get("dur", 0.0)))
        if "permute" in name:
            perms.append(iv)
        elif "custom-call" in name or "pallas" in name or "fusion" in name:
            kerns.append(iv)
    if not perms:
        return None
    kerns.sort()
    p_tot = p_ov = 0.0
    for (a, b) in perms:
        p_tot += b - a
        cov = 0.0
        for (c, d) in kerns:
            lo, hi = max(a, c), min(b, d)
            if lo < hi:
                cov += hi - lo
            if c > b:
                break
        p_ov += min(cov, b - a)
    return p_tot, p_ov


# v5e ICI: ~4.5e10 B/s per direction per link on the 1-D ring the row
# sharding uses (jax-ml.github.io/scaling-book, v5e chapter); the halo
# permutes run both directions concurrently on separate links.
ICI_BW = 4.5e10
ICI_LAT = 2e-6  # per-permute launch+latency allowance (s)


def _padded_height(L, ok, step=8, tries=32):
    """Smallest kernel-tileable height >= L (8-row sublane steps): the
    height a real shard of L rows pads to, paying the padded rows'
    full compute. None if nothing within `tries` steps tiles."""
    Lp = (L + step - 1) // step * step
    for _ in range(tries):
        if ok(Lp):
            return Lp
        Lp += step
    return None


def mode_predict(args):
    """Predicted multi-chip scaling table — the mpi-runtimes.dat analog
    (reference mpi-runtimes.dat:1-96) for an environment with ONE real
    chip. Method, clearly labeled predicted:

    - per-shard compute time t_shard(D) is MEASURED on the real chip:
      the 'sharded-pallas' backend on a 1-device mesh at the shard's row
      count (nx/D, ny) — the exact per-device program a D-chip run
      executes (interior + edge launches, self-ppermute, re-mirror),
      slope-timed between two step counts to cancel dispatch overhead;
    - halo traffic per pass is 9*T*nyp*itemsize bytes each direction
      (parallel/sharded.py one_pass); t_comm = bytes/ICI_BW + ICI_LAT
      per pass, divided by T per step;
    - overlap mode launches the interior segment with no data
      dependency on the ppermutes, so the prediction is
      max(t_shard, t_comm + t_edges) per step; t_edges (the two 1-block
      edge launches that consume the halos) is bounded by
      2/n_blocks * t_shard. Sync-mode prediction is t_shard + t_comm.

    Plug-in ready: on a real multi-chip machine the same rows re-run
    with `--mode tpu` on the D-device mesh replace these predictions."""
    import numpy as np

    import jax
    from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry
    from latticeboltzmann_tpu.ops import fused_kernel as fk

    print(f"device: {jax.devices()[0]}  (1 real chip; table is PREDICTED)")
    for nx, ny in ((400, 2000), (800, 4000)):
        cfg = LatticeConfig(nx=nx, ny=ny, dtype=np.float32)
        T = fk.DEFAULT_TEMPORAL
        nyp, _ = fk.pick_layout(ny, T)
        halo_bytes = 9 * T * nyp * 4  # per direction per pass
        t_comm_pass = halo_bytes / ICI_BW + ICI_LAT
        print(f"\n#{nx}x{ny}, {args.steps} steps SP (f32), PREDICTED from "
              f"1-chip shard measurements + ICI model")
        print(f"#halo {halo_bytes/1e3:.0f} KB/direction/pass, "
              f"t_comm {t_comm_pass*1e6:.1f} us/pass (T={T})")
        # measure the per-shard program at EVERY chip count's shard
        # height: heights the kernel cannot tile (e.g. 100 = 400/4,
        # which no block size divides) are measured at the next
        # tileable padded height — exactly what a real D-chip run would
        # do (pad the shard's rows and pay the padded compute), so no
        # table row is a fit extrapolation. (Round 4 fit t(L) from the
        # two tileable heights instead; post round-5 slim staging that
        # 2-point fit has a NEGATIVE intercept, which extrapolated to
        # absurd 4/8-chip rates — measuring padded heights replaces it.)
        ok = lambda L: bool(fk.pick_block_config(L, nyp, 4, T,
                                                 walls_dma=False)[0])
        targets = {d: _padded_height(nx // d, ok) for d in (1, 2, 4, 8)}
        meas = {}
        for L in sorted({h for h in targets.values() if h}):
            walls = geometry.channel_with_barrier(L, ny)
            shard_cfg = LatticeConfig(nx=L, ny=ny, dtype=np.float32)
            sim = Simulation(shard_cfg, walls, backend="sharded-pallas")
            meas[L] = _slope_time(sim)
        ls = np.array(sorted(meas))
        ts = np.array([meas[l] for l in ls])
        b, a = np.polyfit(ls, ts, 1) if len(ls) > 1 else (ts[0] / ls[0], 0.0)
        print("#measured shards: " + ", ".join(
            f"{l} rows = {meas[l]*1e6:.1f} us/step" for l in sorted(meas)))
        print(f"#fit t(L) = {a*1e6:.1f} us + {b*1e9:.2f} ns/row "
              "(context only; table rows are measured)")
        print("#Chips\tt_shard(us/step)\tt_comm(us/step)\tRuntime (s) "
              "overlap\tSpeedup\tMLUPS\tefficiency\tsource")
        base = None
        for d in (1, 2, 4, 8):
            L = nx // d
            Lp = targets[d]
            if Lp is not None:
                t_shard = meas[Lp]
                src = ("measured" if Lp == L
                       else f"measured @ {Lp}-row padded shard")
            else:  # no tileable height found: fit, floored at linear
                t_shard = max(a + b * L, b * L)
                src = "fit"
            t_comm = (t_comm_pass / T) if d > 1 else 0.0
            br = fk.pick_block_config(Lp or L, nyp, 4, T,
                                      walls_dma=False)[0] or 8
            nb = max(1, (Lp or L) // br)
            t_edges = 2.0 / max(nb, 2) * t_shard
            t_pred = max(t_shard, t_comm + t_edges) if d > 1 else t_shard
            runtime = t_pred * args.steps
            mlups = nx * ny * args.steps / runtime / 1e6
            if base is None:
                base = runtime
            eff = base / runtime / d
            print(f"{d}\t{t_shard*1e6:.1f}\t{t_comm*1e6:.2f}\t"
                  f"{runtime:.2f}\t{base/runtime:.2f}\t{mlups:.0f}\t"
                  f"{eff:.2f}\t{src}", flush=True)

    # --- DP section: the sharded double-single (pair-DP) kernel — the
    # analog of the reference's DP MPI column (mpi-runtimes.dat DP rows;
    # 1,205.7 MLUPS at 13 nodes, mpi-runtimes.dat:76). Same method as
    # above with the ds specifics: T=DS_TEMPORAL, halo = BOTH pair
    # components (2 ppermutes per direction per pass), and the ext-halo
    # runner is a SYNC schedule (the kernel's affine block specs consume
    # the halos directly, so nothing overlaps them): t_pred = t_shard +
    # t_comm rather than max(t_shard, t_comm + t_edges).
    from latticeboltzmann_tpu.ops import fused_ds_kernel as fdk

    nx, ny = 800, 4000
    T = fdk.DS_TEMPORAL
    nyp, _ = fdk.pick_layout(ny, T)
    halo_bytes = 2 * 9 * T * nyp * 4  # hi+lo, per direction per pass
    t_comm_pass = halo_bytes / ICI_BW + 2 * ICI_LAT
    print(f"\n#{nx}x{ny}, {args.steps} steps DP (ds64 pair), PREDICTED "
          f"from 1-chip shard measurements + ICI model (sync schedule)")
    print(f"#halo {halo_bytes/1e3:.0f} KB/direction/pass, "
          f"t_comm {t_comm_pass*1e6:.1f} us/pass (T={T})")
    ok_ds = lambda L: bool(fdk.pick_ds_block_rows(L, nyp, T, ext_halo=True))
    targets = {d: _padded_height(nx // d, ok_ds) for d in (1, 2, 4, 8)}
    meas = {}
    for L in sorted({h for h in targets.values() if h}):
        walls = geometry.channel_with_barrier(L, ny)
        shard_cfg = LatticeConfig(nx=L, ny=ny, dtype=np.float64)
        sim = Simulation(shard_cfg, walls, backend="sharded-pallas-ds64")
        meas[L] = _slope_time(sim)
    ls = np.array(sorted(meas))
    ts = np.array([meas[l] for l in ls])
    b, a = np.polyfit(ls, ts, 1) if len(ls) > 1 else (ts[0] / ls[0], 0.0)
    print("#measured shards: " + ", ".join(
        f"{l} rows = {meas[l]*1e6:.1f} us/step" for l in sorted(meas)))
    print(f"#fit t(L) = {a*1e6:.1f} us + {b*1e9:.2f} ns/row "
          "(context only; table rows are measured)")
    print("#Chips\tt_shard(us/step)\tt_comm(us/step)\tRuntime (s)\t"
          "Speedup\tMLUPS\tefficiency\tsource")
    base = None
    ref_dp = 1205.7  # mpi-runtimes.dat:76, 13-node DP overlap
    overtaken = False
    for d in (1, 2, 4, 8):
        L = nx // d
        Lp = targets[d]
        if Lp is not None:
            t_shard = meas[Lp]
            src = ("measured" if Lp == L
                   else f"measured @ {Lp}-row padded shard")
        else:
            t_shard = max(a + b * L, b * L)
            src = "fit"
        t_comm = (t_comm_pass / T) if d > 1 else 0.0
        t_pred = t_shard + t_comm
        runtime = t_pred * args.steps
        mlups = nx * ny * args.steps / runtime / 1e6
        if base is None:
            base = runtime
        eff = base / runtime / d
        mark = ""
        if not overtaken and mlups > ref_dp:
            mark = "  <- overtakes the reference 13-node DP cluster (1205.7)"
            overtaken = True
        print(f"{d}\t{t_shard*1e6:.1f}\t{t_comm*1e6:.2f}\t"
              f"{runtime:.2f}\t{base/runtime:.2f}\t{mlups:.0f}\t"
              f"{eff:.2f}\t{src}{mark}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cpu", "tpu", "predict", "ab"],
                    required=True)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--trace-dir", default="/tmp/lbm_trace")
    ap.add_argument("--_reexeced", action="store_true")
    args = ap.parse_args()

    if args.mode == "cpu" and not args._reexeced:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # the axon TPU-tunnel plugin registers itself from sitecustomize
        # even under JAX_PLATFORMS=cpu; registration gates on this var
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        sys.exit(subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--mode", "cpu",
             "--steps", str(args.steps), "--_reexeced"],
            env=env,
        ))
    if args.mode == "cpu":
        mode_cpu(args)
    else:
        from latticeboltzmann_tpu.utils.tpulock import tpu_lock

        fn = {"predict": mode_predict, "tpu": mode_tpu, "ab": mode_ab}[args.mode]
        with tpu_lock():
            fn(args)


if __name__ == "__main__":
    main()
