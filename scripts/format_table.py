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
    ("csr", 15360): "pack-time bound: the gather pack's per-row column-window analysis "
                    "is O(nnz) host work — measured >1 h for the 1.18B ELL slots on this "
                    "1-core host (timeout); the 9.4 GB operand itself fits. Measured "
                    "through 10240",
    ("csr", 20480): "operand > HBM: packed ELL cols+vals = 16.8 GB vs 16 GB chip "
                    "(measured OOM); pack additionally time-bound (see 15360 row)",
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
        }
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="docs/results")
    ap.add_argument("--sizes", default="2048,2560,4096,10240,15360,20480")
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
                cells.append(f"{r['ms']:.2f} ms ({r['gbs']:.0f} GB/s{frac})")
            elif (mode, g) in ABSENT:
                cells.append(f"— {ABSENT[(mode, g)]}")
            else:
                cells.append("not measured")
        print(f"| {mode} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
