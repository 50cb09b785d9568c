#!/usr/bin/env python
"""Kernel profiling wrapper — the reference's scripts/profiling/profile_kernel.sh analog
(ncu --set full per mode, :51-57).  Captures an XProf/TensorBoard trace per SpMV mode.

    python scripts/profile_kernel.py gen:4096 --mode=stencil5,stencil5-const \
        [--outdir=results/traces]

View: tensorboard --logdir <outdir>  (profile plugin), or xprof.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix", help="gen:<g> or .mtx path")
    ap.add_argument("--mode", default="stencil5")
    ap.add_argument("--outdir", default="results/traces")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tpusparse import dist, ops
    from tpusparse.bench import profiling
    from tpusparse.cli.spmv_bench import load_operand

    dist.enable_compilation_cache()
    # validate all modes before any (expensive) load or trace — spmv_bench contract
    modes = [m.strip() for m in args.mode.split(",") if m.strip()]
    for m in modes:
        if m not in ops.available_modes():
            print(f"[ERROR] unknown mode '{m}'. Available: {ops.available_modes()}",
                  file=sys.stderr)
            return 2
    mat, name = load_operand(args.matrix)
    for mode in modes:
        op = ops.get_operator(mode, mat)
        x = op.ones_b(op._run_dtype())
        op.run_device(x)  # compile outside the capture
        logdir = os.path.join(args.outdir, f"{name}_{mode}")

        def reps():
            y = x
            for _ in range(args.reps):
                y = op.run_device(y)
            return y

        profiling.profiled_run(reps, logdir=logdir)
        print(f"[OK] {mode}: trace in {logdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
