"""Headline benchmark: 800x4000 float32 channel flow, 10,000 timesteps —
the reference's north-star row (README.md:90, R9 280X SP: 14.38 s =
2225.3 MLUPS). Prints ONE JSON line with MLUPS and the ratio vs that
baseline.

Two independent measurements defend the number against the tunnel's
failure modes (round-2 postmortem: the driver recorded 681 MLUPS for a
run that reproduces at 16,544 — same code, same chip, same Reynolds —
because a degraded tunnel session added ~24x of dispatch overhead that
best-of-2 end-to-end timing could not see):

- slope rate: per-step time from the slope between two step counts,
  which cancels any fixed per-call overhead exactly
  (scripts/anatomy.py:timed_slope; the reference's own numbers are
  overhead-free in the same sense — a single long in-process run,
  README.md:83-90).
- end-to-end rate: >=3 timed full runs, every value reported.

If the best end-to-end rate is < half the slope rate, the environment
(not the kernel) is eating the difference: the run retries, and if the
disagreement persists, the JSON carries `degraded_environment: true`
and reports the slope rate as `value` (the device's actual sustained
kernel rate), with every raw timing preserved alongside.

Usage: python bench.py [--backend auto|xla|pallas] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_MLUPS = 2225.3  # R9 280X OpenCL SP, 800x4000 (README.md:90)


def _await_tpu_tunnel(attempts: int = 5, probe_timeout: int = 240) -> None:
    """The axon tunnel sometimes goes fully down: backend init then hangs
    ~5-30 min in-process before raising UNAVAILABLE, which would eat the
    whole gate run. Probe device init in a bounded subprocess and give a
    transient outage up to ~30 min to recover; on persistent failure
    continue anyway (the in-process attempt then reports the real error)."""
    import os
    import subprocess

    if os.environ.get("PALLAS_AXON_POOL_IPS") is None:
        return  # no tunnel configured (e.g. CPU-only CI): nothing to probe
    last_err = ""
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            if proc.returncode == 0:
                if i:
                    print(f"bench: tunnel recovered on probe {i + 1}", file=sys.stderr)
                # the probe subprocess just used (and released) the tunnel;
                # transient init errors are documented for ~30-60 s after a
                # TPU process exits, so let it settle before our own init
                time.sleep(45)
                return
            last_err = proc.stderr[-1500:]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout} s"
        if i + 1 < attempts:
            print(
                f"bench: TPU tunnel probe {i + 1}/{attempts} failed; retrying in 120 s",
                file=sys.stderr, flush=True,
            )
            time.sleep(120)
    print(
        "bench: tunnel still unreachable; attempting the run anyway. "
        f"Last probe error:\n{last_err}",
        file=sys.stderr,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--nx", type=int, default=800)
    ap.add_argument("--ny", type=int, default=4000)
    ap.add_argument("--warmup", type=int, default=96)
    ap.add_argument("--e2e-runs", type=int, default=3)
    ap.add_argument("--skew", dest="skew", action="store_true", default=None,
                    help="wavefront time-skewed wall-free launches "
                         "(--no-skew forces off; default = framework default)")
    ap.add_argument("--no-skew", dest="skew", action="store_false")
    ap.add_argument("--temporal", type=int, default=None,
                    help="temporal blocking depth override (A/B runs)")
    args = ap.parse_args()

    from latticeboltzmann_tpu.utils.tpulock import tpu_lock

    # lock FIRST, probe second: the probe subprocess is itself a TPU
    # process, so probing outside the lock would contend with a locked
    # run (and misread lock contention as a tunnel outage); probing
    # inside also puts the 45 s post-probe settle after any wait
    with tpu_lock() as lock_ok:
        _await_tpu_tunnel()
        return _measure(args, lock_ok)


def _measure(args, lock_ok: bool) -> int:
    """The measured portion, run under the inter-process TPU lock so a
    leftover background benchmark of this repo can never share the chip
    with the gate run (the round-2 24x-degraded-artifact failure mode)."""
    import jax

    from latticeboltzmann_tpu import LatticeConfig, Simulation, geometry, available_backends

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if "pallas" in available_backends() and jax.default_backend() == "tpu" else "xla"

    cfg = LatticeConfig(nx=args.nx, ny=args.ny, dtype=np.float32)
    # the reference's exact scene: barrier at rows [20,220) x cols
    # [100,105) independent of lattice size (src/latticeboltzmann.c:
    # 567-573) — its published 800x4000 numbers ran this geometry
    walls = geometry.reference_barrier(cfg.nx, cfg.ny)

    sim = Simulation(cfg, walls, backend=backend, skew=args.skew,
                     temporal=args.temporal)
    sim.run(args.warmup)  # compile + warm caches; excluded from timing

    def timed(n: int) -> float:
        """Wall seconds for one n-step run (the runner takes a dynamic
        step count, so no recompilation happens here)."""
        sim.elapsed = 0.0
        sim.steps_done = 0
        sim.run(n)
        return sim.elapsed

    # --- slope rate: cancels fixed per-call cost (tunnel RPC/dispatch).
    # Step counts are multiples of 240 = lcm(2T) for every temporal
    # depth in use, so both runs take the same pre-compiled
    # zero-remainder program — a remainder-class mismatch once let a
    # first-call rem-runner compile poison t1 and produce a 9 us/step
    # "slope" the gate then believed.
    n1, n2 = 1680, 5040
    timed(n1)  # absorb any one-off compile/cache effects at this size
    t1s = [timed(n1) for _ in range(2)]
    t2s = [timed(n2) for _ in range(2)]
    per_step = (min(t2s) - min(t1s)) / (n2 - n1)
    slope_mlups = cfg.sites / per_step / 1e6 if per_step > 0 else 0.0
    # two independent slope estimates must agree: a tunnel hiccup inside
    # one short run produces an absurd one-off slope (a first-call
    # compile once yielded "9 us/step" = 353k MLUPS, which the gate then
    # believed); a genuine device rate reproduces.
    slopes = [(t2s[0] - t1s[0]) / (n2 - n1), (t2s[1] - t1s[1]) / (n2 - n1)]
    slope_valid = bool(
        per_step > 0
        and all(s > 0 for s in slopes)
        and max(slopes) <= 1.3 * min(slopes)
    )

    # --- end-to-end rate: >=3 full runs, all values recorded
    def e2e_pass() -> list[float]:
        return [timed(args.steps) for _ in range(args.e2e_runs)]

    e2e_times = e2e_pass()
    best = min(e2e_times)
    e2e_mlups = cfg.sites * args.steps / best / 1e6

    # --- pathology check: a healthy run's end-to-end rate sits within
    # ~2x of the slope rate (fixed overhead is ~25 ms vs ~2 s of work).
    # A >2x gap means the *environment* degraded mid-run; retry once,
    # then flag instead of recording a broken number as the device rate.
    degraded = False
    if slope_valid and e2e_mlups < 0.5 * slope_mlups:
        e2e_times += e2e_pass()
        best = min(e2e_times)
        e2e_mlups = cfg.sites * args.steps / best / 1e6
        degraded = e2e_mlups < 0.5 * slope_mlups

    mlups = slope_mlups if (degraded and slope_valid) else e2e_mlups

    # correctness guard: the run must be numerically sane (the reference
    # hard-faults on NaN via feenableexcept, src/latticeboltzmann.c:129)
    re = sim.reynolds()
    f = sim.state()
    ok = bool(np.isfinite(f).all() and (f >= 0).all() and np.isfinite(re))

    result = {
        "metric": f"MLUPS_{args.nx}x{args.ny}_f32_{backend}",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
        "runtime_s": round(best, 3),
        "steps": args.steps,
        "e2e_runs_s": [round(t, 3) for t in e2e_times],
        "e2e_mlups": round(e2e_mlups, 1),
        "slope_mlups": round(slope_mlups, 1),
        "slope_us_per_step": round(per_step * 1e6, 2),
        "slope_valid": slope_valid,
        "degraded_environment": degraded,
        "tpu_lock_acquired": lock_ok,
        "reynolds": float(re),
        "finite_and_positive": ok,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
