#!/usr/bin/env python
"""Benchmark plots — the framework's counterpart of the reference's
gnuplot performance scripts (perfplot.plt, perfplot-mpi.plt): renders
the bench-suite results as a MLUPS bar chart against the reference
baselines.

Usage: python scripts/perf_plot.py [BENCH_RESULTS.jsonl] [-o img/perf.png]
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="?", default="BENCH_RESULTS.jsonl")
    ap.add_argument("-o", "--out", default="img/perf.png")
    args = ap.parse_args()

    rows = [json.loads(l) for l in pathlib.Path(args.results).read_text().splitlines() if l.strip()]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = [f'{r["lattice"]}\n{r["precision"]} {r["backend"]}' for r in rows]
    ours = [r["mlups"] for r in rows]
    base = [r.get("baseline_mlups") for r in rows]

    x = range(len(rows))
    fig, ax = plt.subplots(figsize=(1.8 * len(rows) + 2, 4.5))
    ax.bar([i - 0.2 for i in x], ours, width=0.4, label="this framework (TPU v5e, 1 chip)")
    bx = [i + 0.2 for i, b in zip(x, base) if b]
    bv = [b for b in base if b]
    ax.bar(bx, bv, width=0.4, label="reference baseline (best published)")
    ax.set_xticks(list(x))
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_ylabel("MLUPS (million lattice updates / s)")
    ax.set_title("D2Q9 LBM throughput vs jodavies/latticeboltzmann baselines")
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    for i, v in zip(x, ours):
        ax.annotate(f"{v:,.0f}", (i - 0.2, v), ha="center", va="bottom", fontsize=8)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
