#!/usr/bin/env python
"""A/B the generic gather kernel variants (ladder vs affine) on the stencil operand.

The round-3 review flagged the ladder kernel's 33.7 ms at 10240² (18-29% of roofline) and
asked for ≥2× or a measured bound.  This measures both packs on the same operand with the
chained-slope protocol and writes one artifact per variant.

    python scripts/gather_ab.py [--grid 10240] [--runs 10] [--outdir docs/results]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=10240)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--variants", default="affine,ladder")
    ap.add_argument("--outdir", default="docs/results")
    args = ap.parse_args()

    from tpusparse.dist import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from tpusparse import formats
    from tpusparse.bench import export, metrics, stats, sysinfo
    from tpusparse.ops import _init_gather_ell

    g = args.grid
    st = formats.Stencil5(grid_size=g, planes=None, constant=(5.0, -1.0))
    info = sysinfo.get_system_info()
    results = {}
    for variant in args.variants.split(","):
        t0 = time.perf_counter()
        op = _init_gather_ell(st, variant=variant)
        print(f"[INFO] {variant}: pack+upload {time.perf_counter() - t0:.1f} s, "
              f"span={op._buffers['span']} swin={op._buffers['swin']}")
        x_dev = op.as_field(np.ones(op.num_cols, dtype=np.float32))
        bench = stats.benchmark_with_stats(
            lambda: op.run_timed_resident(x_dev)[1],
            num_runs=args.runs, warmup=args.warmup)
        y_dev, _ = op.run_timed_resident(x_dev)
        y = np.asarray(y_dev).reshape(-1)[: op.num_rows]
        del x_dev, y_dev
        kernel_ms = op.kernel_time_ms() if info["backend"] != "cpu" else bench.median_ms
        mets = metrics.calculate_spmv_metrics(
            op, kernel_ms, dtype_itemsize=4, device_kind=info["device_kind"],
            mode="csr")
        result = export.spmv_result_dict(
            mode="csr", matrix_name=f"stencil5-{g}x{g}", op=op, metrics=mets,
            stats=bench, sysinfo=info, sum_y=float(y.sum()),
            norm2_y=float(np.linalg.norm(y)), kernel_ms=kernel_ms,
            run_protocol="device-resident")
        export.print_human_spmv(result)
        print()
        path = os.path.join(args.outdir, f"spmv_{g}_v5e_csr-{variant}.json")
        export.write_json(path, result)
        print(f"[INFO] JSON written: {path}")
        results[variant] = kernel_ms
        op.free()
    if len(results) == 2:
        a, l = results.get("affine"), results.get("ladder")
        if a and l:
            print(f"[INFO] affine vs ladder at {g}²: {a:.2f} vs {l:.2f} ms "
                  f"= {l / a:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
