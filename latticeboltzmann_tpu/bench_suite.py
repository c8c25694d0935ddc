"""Benchmark suite — thirteen configs: the five BASELINE.json configs,
bf16-storage variants, the SP/DP precision-table completion rows, and
the double-single (pair-DP) fused-kernel rows, reproducing the
reference's benchmark-table methodology (README.md:66-90,
runtimes.dat / mpi-runtimes.dat): end-to-end runtime for N timesteps,
MLUPS derived as NX*NY*steps/runtime/1e6.

Every row carries the self-defending measurement bench.py pioneered for
the headline config (round-2 postmortem): a slope-timed kernel rate
from two step counts (cancels fixed per-call overhead, two independent
estimates must agree), >=2 end-to-end runs all recorded, and a
`degraded_environment` flag when the e2e rate falls below half the
slope rate (the environment, not the kernel, is then eating the
difference).

Usage:  python -m latticeboltzmann_tpu.bench_suite [--steps 10000]
        [--quick] [--out BENCH_RESULTS.md]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# (name, nx, ny, precision, geometry, backend, baseline_runtime_s, baseline_hw)
CONFIGS = [
    ("400x2000 f64 (serial C workload)", 400, 2000, "f64", "reference", "xla",
     110.31, "i5-2500K AVX 2T (README.md:70)"),
    ("400x4000 f32 fused kernel", 400, 4000, "f32", "reference", "pallas",
     7.49, "AMD R9 280X OpenCL SP (README.md:80)"),
    ("800x4000 f32 cylinder wake + rho/u extraction", 800, 4000, "f32", "cylinder", "pallas",
     14.38, "AMD R9 280X OpenCL SP (README.md:90)"),
    ("800x4000 f32 row-sharded (MPI-equivalent)", 800, 4000, "f32", "reference", "sharded-pallas",
     14.87, "13x2 Opteron 6128 MPI overlap (README.md:88)"),
    ("4000x16000 f32 large-domain", 4000, 16000, "f32", "reference", "pallas",
     None, "no reference datapoint at this size"),
    ("4000x16000 bf16-storage mixed precision", 4000, 16000, "bf16", "reference", "pallas",
     None, "no reference datapoint at this size"),
    ("800x4000 bf16-storage (headline scene)", 800, 4000, "bf16", "reference", "pallas",
     14.38, "AMD R9 280X OpenCL SP (README.md:90)"),
    # precision-table completion: the reference publishes SP and DP at
    # each of its three lattice sizes (README.md:66-90); these three
    # rows fill the combinations the configs above don't cover. DP runs
    # on the XLA engine (f64 is software-emulated on TPU — a correctness
    # config, not a perf config; step count capped like config 1).
    ("400x2000 f32 (reference default scene)", 400, 2000, "f32", "reference", "pallas",
     4.21, "AMD R9 280X OpenCL SP (README.md:73)"),
    ("400x4000 f64 (emulated DP)", 400, 4000, "f64", "reference", "xla",
     13.76, "AMD R9 280X OpenCL DP (README.md:80)"),
    ("800x4000 f64 (emulated DP)", 800, 4000, "f64", "reference", "xla",
     27.44, "AMD R9 280X OpenCL DP (README.md:90)"),
    # DP-class PERF rows: the double-single (compensated f32-pair)
    # fused Pallas kernel (ops/fused_ds_kernel.py) — ~2^-48 relative
    # precision per op, validated at ~1e-12 vs the golden serial-double
    # model (tests/test_ds.py, docs/NUMERICS.md). This is the TPU-native
    # answer to the reference's DP columns; the emulated-f64 rows above
    # remain the bitwise-correctness anchors.
    ("400x4000 ds64 pair-DP (fused Pallas)", 400, 4000, "ds64", "reference",
     "pallas-ds64", 13.76, "AMD R9 280X OpenCL DP (README.md:80)"),
    ("800x4000 ds64 pair-DP (fused Pallas)", 800, 4000, "ds64", "reference",
     "pallas-ds64", 27.44, "AMD R9 280X OpenCL DP (README.md:90)"),
    # the DP DISTRIBUTED story: the row-sharded pair-DP kernel on a
    # 1-device mesh — the per-chip program of a multi-chip DP run
    # (ops/fused_ds_kernel.sharded_run_steps), benchmarked against the
    # reference's published DP MPI row (26.54 s at 13 nodes,
    # mpi-runtimes.dat:76). docs/SCALING.md's predicted table carries
    # the DP multi-chip extrapolation built on this measurement.
    ("800x4000 ds64 pair-DP row-sharded (MPI-DP equiv)", 800, 4000, "ds64",
     "reference", "sharded-pallas-ds64", 26.54,
     "13x2 Opteron 6128 MPI overlap DP (README.md:88, mpi-runtimes.dat:76)"),
]


# regenerated into BENCH_RESULTS.md on every --out run so the
# methodology and physics-validation context survive table refreshes
METHODOLOGY_NOTE = """\
The headline row — 800x4000 f32, the reference's exact scene
(reference_barrier) on the local pallas backend — is owned by the
repo-root `bench.py` gate and recorded in `BENCH_rNN.json`, not
duplicated here; this table covers every OTHER published reference
configuration plus the TPU-specific tiers.

Timing method: every row carries the self-defending measurement
originally built for the headline `bench.py` gate (round-2 postmortem):
a slope-timed kernel rate from two step counts (cancels fixed per-call
tunnel overhead; two independent estimates must agree within 1.3x for
`slope_valid`), >=2 warm end-to-end runs (all recorded in
BENCH_RESULTS.jsonl as `e2e_runs_s`, best shown here), and a
`degraded_environment` flag when the best e2e rate is below half the
slope rate. The table's MLUPS column is the best END-TO-END rate (the
honest user-visible number); `slope_mlups` in the jsonl is the device's
sustained kernel rate. Rates through the tunneled chip still vary a few
percent between sessions; compare rows within one refresh, not across.

Physics validation: every row must show developed flow, not just finite
fields (`bench_suite` fails a row otherwise). Rows whose probe column
is physically unreachable within the run (flow spreads at ~the lattice
sound speed, ~0.58 columns/step: the 4000x16000 rows at the reference's
ny/2 column; the capped-step f64 DP rows) also probe a column the flow
HAS reached — `reynolds_developed` in BENCH_RESULTS.jsonl. The
4000x16000 bf16 row's central-column value is EXACTLY 0.0 (vs f32's
-1.9e-5 noise) because per-pass bf16 rounding freezes the unreached
rest state at a symmetric fixed point — diagnosed in docs/NUMERICS.md
and pinned by `test_bf16_storage_computes_in_f32`. f64 DP rows run the
XLA engine: double precision is software-emulated on TPU, so they are
correctness configs (bitwise-comparable to the serial C build), not
perf configs."""


def _defended_timing(sim, sites: int, steps: int, e2e_runs: int = 2) -> dict:
    """bench.py's two-measurement defense, sized for a 12-row suite:
    slope rate between 240- and 720-step runs (multiples of 240 =
    lcm(2T) over the temporal depths in use, so both hit the same
    zero-remainder pre-compiled runner; two independent estimates must
    agree within 1.3x), then `e2e_runs` full runs, all recorded. A best
    e2e below half the slope rate flags `degraded_environment` — the
    number is then an environment artifact, not a kernel rate."""

    def timed(n: int) -> float:
        sim.elapsed = 0.0
        sim.steps_done = 0
        sim.run(n)
        return sim.elapsed

    n1, n2 = 240, 720
    timed(n1)  # absorb one-off effects at this size
    t1s = [timed(n1) for _ in range(2)]
    t2s = [timed(n2) for _ in range(2)]
    per_step = (min(t2s) - min(t1s)) / (n2 - n1)
    slope_mlups = sites / per_step / 1e6 if per_step > 0 else 0.0
    slopes = [(t2s[0] - t1s[0]) / (n2 - n1), (t2s[1] - t1s[1]) / (n2 - n1)]
    slope_valid = bool(
        per_step > 0
        and all(s > 0 for s in slopes)
        and max(slopes) <= 1.3 * min(slopes)
    )
    e2e_times = [timed(steps) for _ in range(e2e_runs)]
    best = min(e2e_times)
    e2e_mlups = sites * steps / best / 1e6
    return {
        "runtime_s": round(best, 3),
        "mlups": round(e2e_mlups, 1),
        "e2e_runs_s": [round(t, 3) for t in e2e_times],
        "slope_mlups": round(slope_mlups, 1),
        "slope_us_per_step": round(per_step * 1e6, 2),
        "slope_valid": slope_valid,
        "degraded_environment": bool(
            slope_valid and e2e_mlups < 0.5 * slope_mlups
        ),
    }


def run_config(name, nx, ny, precision, geo, backend, steps, warmup=200):
    import jax
    import numpy as np

    from . import geometry
    from .core.spec import LatticeConfig
    from .models.engine import Simulation

    if precision == "f64":
        jax.config.update("jax_enable_x64", True)
        dtype = np.float64
    elif precision == "bf16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    elif precision == "ds64":
        # pair-DP: host-side state is float64 (the recombined pair) but
        # the device runs pure f32 — no jax x64 mode needed (and none
        # wanted: x64 poisons later Pallas compiles)
        dtype = np.float64
    else:
        dtype = np.float32

    try:
        cfg = LatticeConfig(nx=nx, ny=ny, dtype=dtype)
        walls = geometry.build(geo, nx, ny)
        sim = Simulation(cfg, walls, backend=backend)
        sim.run(min(warmup, steps))
        timing = _defended_timing(sim, nx * ny, steps)
        re = sim.reynolds()
        # physics validation: the run must show actual developed flow,
        # not just finite numbers. At very wide lattices the reference's
        # ny/2 probe column is physically unreachable within the run
        # (momentum spreads at ~the lattice sound speed: 10k steps cover
        # ~5.8k columns), so probe a column the flow has reached; the
        # jsonl records both values.
        re_dev = re
        dev_col = None
        if abs(re) < 1e-3 and ny > 2 * steps // 3:
            dev_col = min(1000, ny // 4, max(16, steps // 3))
            re_dev = sim.reynolds(dev_col)
        # on-device macroscopic extraction is part of config 3's contract
        rho, ux, uy = sim.macroscopic()
        ok = bool(
            np.isfinite(rho).all() and np.isfinite(re) and abs(re_dev) > 1e-9
        )
    finally:
        if precision == "f64":
            # x64 mode poisons later Pallas compiles (i64 grid indices);
            # scope it to this config
            jax.config.update("jax_enable_x64", False)
    out = {
        "config": name,
        "lattice": f"{nx}x{ny}",
        "precision": precision,
        "backend": backend,
        "steps": steps,
        **timing,
        "reynolds": float(re),
        "sane": ok,
    }
    if dev_col is not None:
        out["reynolds_developed_col"] = dev_col
        out["reynolds_developed"] = float(re_dev)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--quick", action="store_true", help="1000 steps per config")
    ap.add_argument("--out", default=None, help="write a markdown table here")
    ap.add_argument("--only", default=None,
                    help="comma-separated 1-based config indices, e.g. 1,2,3")
    ap.add_argument("--append", action="store_true",
                    help="append to the jsonl instead of rewriting")
    args = ap.parse_args(argv)
    steps = 1000 if args.quick else args.steps

    import jax

    from .utils.tpulock import tpu_lock

    rows = []
    if args.only is None:
        todo = CONFIGS
    else:
        todo = [CONFIGS[int(i) - 1] for i in args.only.split(",")]
    # one TPU run of this repo at a time (utils/tpulock.py); lock_ok is
    # False only after a timed-out wait — flag those rows as contended
    with tpu_lock() as lock_ok:
        for name, nx, ny, prec, geo, backend, base_rt, base_hw in todo:
            # f64 at full steps is an emulated-precision correctness config
            # — cap its step count to keep the suite bounded
            n = min(steps, 2000) if prec == "f64" else steps
            t0 = time.time()
            r = run_config(name, nx, ny, prec, geo, backend, n)
            r["wall_total_s"] = round(time.time() - t0, 1)
            if not lock_ok:
                r["tpu_lock_acquired"] = False
            if base_rt is not None:
                base_mlups = nx * ny * 10000 / base_rt / 1e6
                r["baseline_mlups"] = round(base_mlups, 1)
                r["speedup_vs_baseline"] = round(r["mlups"] / base_mlups, 2)
                r["baseline_hw"] = base_hw
            print(json.dumps(r), flush=True)
            rows.append(r)

    if args.out:
        jsonl = args.out.rsplit(".", 1)[0] + ".jsonl"
        if args.append:
            import pathlib

            prev = [
                json.loads(l)
                for l in pathlib.Path(jsonl).read_text().splitlines()
                if l.strip()
            ] if pathlib.Path(jsonl).exists() else []
            names = {r["config"] for r in rows}
            rows = [r for r in prev if r["config"] not in names] + rows
            order = {c[0]: k for k, c in enumerate(CONFIGS)}
            rows.sort(key=lambda r: order.get(r["config"], 99))
        lines = [
            "# Benchmark results (latticeboltzmann_tpu)",
            "",
            f"Device: {jax.devices()[0]}; steps per config: {steps} "
            "(f64 capped at 2000). MLUPS = NX*NY*steps/runtime/1e6, the",
            "reference's derived metric (BASELINE.md).",
            "",
            METHODOLOGY_NOTE,
            "",
            "| Config | Backend | Steps | Runtime (s) | MLUPS | vs baseline | Baseline HW |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            vs = f'{r.get("speedup_vs_baseline", "—")}x' if "speedup_vs_baseline" in r else "—"
            hw = r.get("baseline_hw", "—")
            lines.append(
                f'| {r["config"]} | {r["backend"]} | {r["steps"]} | '
                f'{r["runtime_s"]} | {r["mlups"]} | {vs} | {hw} |'
            )
        lines.append("")
        with open(args.out, "w") as fp:
            fp.write("\n".join(lines))
        with open(jsonl, "w") as fp:
            for r in rows:
                fp.write(json.dumps(r) + "\n")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
