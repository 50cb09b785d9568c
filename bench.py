"""Driver benchmark: STENCIL5 SpMV HBM-roofline fraction on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline follows BASELINE.md: the reference's STENCIL5 kernel sustains 95% of HBM roofline
on its hardware (docs/PROFILING_ANALYSIS.md:88-97, 2364 GB/s on A100 PCIe).  The
hardware-honest cross-platform comparison is the fraction of the chip's HBM peak moved by the
values-carrying stencil SpMV (7 words/point), so:

  value       = achieved_bytes/s ÷ chip_HBM_peak
  vs_baseline = value ÷ 0.95

Timing uses chained launches (output feeds the next input) with one final sync — per-launch
dispatch latency through the remote tunnel would otherwise dominate (~0.4 ms/launch measured).
"""

import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpusparse import dist, generate

    dist.enable_compilation_cache()
    from tpusparse.bench.metrics import chip_peaks
    from tpusparse.bench.sysinfo import get_system_info
    from tpusparse.kernels.stencil5 import spmv_stencil5_pipelined

    info = get_system_info()
    on_tpu = info["backend"] != "cpu"
    g = 10240 if on_tpu else 512
    dtype = jnp.float32
    print(f"[bench] device={info['device_kind']} g={g} dtype=f32", file=sys.stderr)

    planes = generate.make_stencil5_planes_device(g, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (g, g), dtype)

    def run(v):
        return spmv_stencil5_pipelined(planes, v)

    # correctness gate before timing: checksum vs the analytical oracle
    y1 = run(jnp.ones((g, g), dtype))
    s_ref, _ = generate.stencil5_spmv_checksums(g)
    s_got = float(jnp.sum(y1.astype(jnp.float64) if not on_tpu else y1))
    rel = abs(s_got - s_ref) / abs(s_ref)
    if rel > 1e-3:
        print(f"[bench] CHECKSUM MISMATCH: {s_got} vs {s_ref}", file=sys.stderr)
        return 1
    print(f"[bench] checksum ok (rel {rel:.2e})", file=sys.stderr)

    # warmup + chained timing
    n = 50 if on_tpu else 5
    v = run(x)
    _ = float(jnp.sum(v))
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        v = x
        for _ in range(n):
            v = run(v)
        _ = float(jnp.sum(v))
        best = min(best, (time.perf_counter() - t0) / n)

    nbytes = 7 * g * g * dtype.dtype.itemsize if hasattr(dtype, "dtype") else 7 * g * g * 4
    gbs = nbytes / best / 1e9
    peak, _ = chip_peaks(info["device_kind"])
    frac = gbs / peak
    print(f"[bench] stencil5 spmv: {best * 1e3:.3f} ms, {gbs:.1f} GB/s, "
          f"{100 * frac:.1f}% of {peak:.0f} GB/s roofline", file=sys.stderr)

    print(json.dumps({
        "metric": "stencil5_spmv_hbm_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_chip_hbm_peak",
        "vs_baseline": round(frac / 0.95, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
