#!/usr/bin/env python
"""Scaling sweeps — the reference's scripts/benchmarking/*.sh as one parameterized driver.

    python scripts/sweep.py strong [--sizes 10000,15000,20000] [--chips 1,2,4,8]
    python scripts/sweep.py weak   [--configs 1:5000,2:7071,4:10000,8:14142]
    python scripts/sweep.py spmv   [--sizes 10000,15000,20000] [--modes stencil5,csr]

Config defaults mirror the reference (benchmark_problem_sizes.sh:17-22 strong 10k/15k/20k ×
{1,2,4,8} GPUs; benchmark_weak_scaling.sh:17-22 weak ~25M unknowns/device).  Results land in
results/json/sweep_*.json; run scripts/plot_results.py afterwards.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["strong", "weak", "spmv"])
    ap.add_argument("--sizes", default=None)
    ap.add_argument("--chips", default=None)
    ap.add_argument("--configs", default=None)
    ap.add_argument("--modes", default="stencil5,csr")
    ap.add_argument("--runs", type=int, default=0)
    ap.add_argument("--outdir", default="results/json")
    args = ap.parse_args()

    import jax

    import tpusparse
    from tpusparse.cli import cg_solver_multichip, spmv_bench

    ndev = jax.device_count()
    on_cpu = jax.default_backend() == "cpu"
    runs = args.runs or (3 if on_cpu else 10)
    os.makedirs(args.outdir, exist_ok=True)

    def parse_ints(s, default):
        return [int(v) for v in (s or default).split(",")]

    rc = 0
    if args.kind == "spmv":
        sizes = parse_ints(args.sizes, "1024,2048,4096" if not on_cpu else "64,128")
        for g in sizes:
            rc |= spmv_bench.main(
                [f"gen:{g}", f"--mode={args.modes}", f"--runs={runs}", "--warmup=2",
                 f"--json={args.outdir}/sweep_spmv_{g}.json",
                 f"--csv={args.outdir}/sweep_spmv.csv"]
            )
            tpusparse.clear_caches()  # drop this grid's device operands before the next
    elif args.kind == "strong":
        sizes = parse_ints(args.sizes, "2048,4096" if not on_cpu else "64")
        chips = [n for n in parse_ints(args.chips, "1,2,4,8") if n <= ndev]
        for g in sizes:
            for n in chips:
                if g % n:
                    continue
                rc |= cg_solver_multichip.main(
                    [f"gen:{g}", f"--chips={n}", f"--runs={runs}", "--warmup=1",
                     f"--json={args.outdir}/sweep_strong_{g}_{n}chip.json",
                     f"--csv={args.outdir}/sweep_strong.csv"]
                )
                tpusparse.clear_caches()  # drop this point's device operands
    else:  # weak
        default = "1:1024,2:1448,4:2048,8:2896" if not on_cpu else "1:32,2:48,4:64,8:96"
        pairs = [(int(a), int(b)) for a, b in
                 (c.split(":") for c in (args.configs or default).split(","))]
        for n, g in pairs:
            if n > ndev:
                continue
            # round down to a multiple of n (never below n); the sharded operator pads
            # any remainder anyway — this just keeps the sweep sizes tidy
            g = max(g - g % n, n)
            rc |= cg_solver_multichip.main(
                [f"gen:{g}", f"--chips={n}", f"--runs={runs}", "--warmup=1",
                 f"--json={args.outdir}/sweep_weak_{n}chip_{g}.json",
                 f"--csv={args.outdir}/sweep_weak.csv"]
            )
            tpusparse.clear_caches()  # drop this point's device operands
    return rc


if __name__ == "__main__":
    sys.exit(main())
