#!/usr/bin/env python
"""Render the committed format-comparison table from the measured JSON artifacts.

The reference publishes a per-format/per-size SpMV table (README.md:110-116,
docs/results_spmv_a100_manual.json).  This renders the tpusparse analog from
``docs/results/spmv_<g>_v5e_<mode>.json`` — every registered mode × every benchmark size
gets a measured row, or an EXPLAINED absence (the honest "why it can't run" rows the
round-2 review asked for).  Output is GitHub markdown, pasted into
docs/results/GENERIC_COMPARISON.md by the maintainer (regenerate, don't hand-edit).

    python scripts/format_table.py [--dir docs/results] [--sizes 2048,...]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import re
import sys

MODES = ["stencil5", "stencil5-bf16c", "stencil5-const", "stencil5-xla",
         "stencil5-const-xla", "csr", "dia", "dia-xla", "csr-xla", "bcoo"]

# Explained absences: (mode, size) pairs that cannot or should not run, with the reason.
# Anything not listed and not measured renders as "not measured" so gaps stay loud.
_CSRXLA_OOM = ("measured OOM: XLA tile-pads the [n,5] ELL gather operand to T(8,128) — "
               "8 GB temp at 4096², 53.7 GB at 10240² (compile logs in repo history); "
               "measured through 2560")
ABSENT = {
    # (csr, 15360) was pack-time bound for the LADDER pack (>1 h of per-row host
    # analysis); the vectorized affine pack closed it — measured row since round 4.
    ("csr", 20480): "operand > HBM: packed ELL cols+vals = 5·n·(4+4) B = 16.8 GB vs "
                    "15.75 GB usable HBM (measured OOM at pack upload)",
    ("csr-xla", 4096): _CSRXLA_OOM,
    ("csr-xla", 10240): _CSRXLA_OOM,
    ("csr-xla", 15360): "see 4096 row (OOM grows with n)",
    ("csr-xla", 20480): "see 4096 row (OOM grows with n)",
    ("bcoo", 15360): "~24 s/apply extrapolated (1.72 s at 4096², linear in nnz); "
                     "measured through 10240; CG head-to-head at 4096 in "
                     "GENERIC_COMPARISON.md",
    ("bcoo", 20480): "see 15360 row",
    ("dia-xla", 15360): "oracle role only (validates the Pallas DIA kernel); measured "
                        "through 10240",
    ("dia-xla", 20480): "oracle role only; measured through 10240",
}


def load_rows(results_dir):
    rows = {}
    for path in glob.glob(os.path.join(results_dir, "spmv_*_v5e_*.json")):
        m = re.match(r"spmv_(\d+)_v5e_(.+)\.json$", os.path.basename(path))
        if not m:
            continue
        g, mode = int(m.group(1)), m.group(2)
        with open(path) as f:
            rec = json.load(f)
        p = rec["benchmark"]["performance"]
        rows[(mode, g)] = {
            "ms": p.get("time_kernel_ms") or p["time_median_ms"],
            "gbs": p["bandwidth_gbs"],
            "gflops": p["gflops"],
            "frac_ach": p.get("roofline_fraction_achievable"),
            "dtype": p.get("dtype", "?"),
            "flags": p.get("timing_flags") or [],
            "raw": rec,
        }
    return rows


def write_csv(rows, absent, sizes, path):
    """REGENERATE the committed format-table CSV from the JSON artifacts (one row per
    measured (mode, grid) at the table sizes, plus explained-absence rows) so the CSV can
    never drift from the artifacts it summarizes — the round-3 review found exactly that
    drift between GENERIC_COMPARISON.md and the per-run appended CSV."""
    from tpusparse.bench.export import _flatten

    flat_rows = []
    for (mode, g) in sorted(rows, key=lambda k: (k[1], k[0])):
        if g not in sizes:
            continue
        flat = _flatten(rows[(mode, g)]["raw"])
        flags = rows[(mode, g)]["flags"]
        flat["benchmark.performance.timing_flags"] = ";".join(
            f.split(":")[0] for f in flags)
        flat_rows.append(flat)
    for (mode, g), reason in sorted(absent.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        if g not in sizes or (mode, g) in rows:
            continue
        flat_rows.append({
            "benchmark_type": "spmv",
            "benchmark.mode": mode,
            "benchmark.matrix.grid_size": g,
            "benchmark.absent_reason": reason,
        })
    fieldnames = []
    for r in flat_rows:
        for k in r:
            if k not in fieldnames:
                fieldnames.append(k)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames, restval="")
        w.writeheader()
        for r in flat_rows:
            w.writerow(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="docs/results")
    ap.add_argument("--sizes", default="2048,2560,4096,10240,15360,20480")
    ap.add_argument("--csv", default=None,
                    help="also REGENERATE this CSV from the artifacts (replaces the "
                         "append-mode file; measured + explained-absence rows)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = load_rows(args.dir)

    print("| mode \\ grid | " + " | ".join(f"{g}²" for g in sizes) + " |")
    print("|---" * (len(sizes) + 1) + "|")
    for mode in MODES:
        cells = []
        for g in sizes:
            r = rows.get((mode, g))
            if r is not None:
                frac = (f", {100 * r['frac_ach']:.0f}% ceil"
                        if r.get("frac_ach") and mode.startswith("stencil") else "")
                star = "†" if r["flags"] else ""
                cells.append(f"{r['ms']:.2f} ms{star} ({r['gbs']:.0f} GB/s{frac})")
            elif (mode, g) in ABSENT:
                cells.append(f"— {ABSENT[(mode, g)]}")
            else:
                cells.append("not measured")
        print(f"| {mode} | " + " | ".join(cells) + " |")
    if any(rows[k]["flags"] for k in rows if k[1] in sizes and k[0] in MODES):
        print("\n† timing-validity flags set (sub-knee working set or sub-ms kernel "
              "time): bandwidth is an on-chip figure, not an HBM roofline claim — see "
              "the artifact's performance.timing_flags.")
    if args.csv:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        write_csv(rows, ABSENT, sizes, args.csv)
        print(f"\n[csv regenerated: {args.csv}]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
