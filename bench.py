"""Driver benchmark.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (TPU): the repo's headline — full CG time-to-solution at 20480² (419M
unknowns, 2.1B nnz, tol 1e-6, b = ones) — vs the reference's largest published configuration
(20000² = 400M unknowns on one A100; ours is ~5% MORE work), via the values-free
constant-coefficient kernel (`stencil5-const`: the coefficient field IS constant for this
operator — measured fastest and carries zero operand HBM, docs/PERFORMANCE.md).
vs_baseline = reference_time / our_time against the published single-A100 f64 number
(531.4 ms, BASELINE.md) — >1 means faster than the reference's headline GPU.
Iteration-count parity (14) is asserted, not assumed.

Fallback (any failure, or CPU backend): STENCIL5 SpMV HBM-roofline fraction on one chip
(paired-chain slope protocol), vs the reference's 95%-of-roofline claim.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # cwd-independent import

REF_20K_MS = 531.4  # reference cg 20000², 1×A100-SXM f64 (BASELINE.md / README.md:55)
REF_ITERS = 14


def bench_cg_20k() -> dict:
    import jax
    import jax.numpy as jnp

    from tpusparse import generate, ops
    from tpusparse.formats import Stencil5
    from tpusparse.solvers import cg

    if jax.default_backend() == "cpu":
        raise RuntimeError("cg20k child must run on the accelerator, got cpu backend")
    g = 20480
    # values-free operator: no plane array at all — the whole solve footprint is the
    # three carried (g, g) f32 state fields (~5 GB with the recompute loop's in-place
    # passes); measured fastest of the 20k modes (334.4 vs 489.5 ms bf16c, round 5) and
    # structurally OOM-proof
    st = Stencil5(grid_size=g, planes=None, constant=(5.0, -1.0))
    op = ops.get_operator("stencil5-const", st)
    del st
    # shape/dtype metadata only — b is synthesized in-graph (b_is_ones), so no 1.68 GB
    # device ones buffer should be held across the solves
    b = jax.ShapeDtypeStruct((g, g), jnp.float32)
    cfg = cg.CGConfig(max_iters=100, tolerance=1e-6)

    from tpusparse.bench.stats import compute_stats

    def run_solves(operator, label, warmup=3, runs=10, recompute_ap=None):
        # the framework's own protocol (bench/stats.py, parity with the reference's
        # benchmark_stats.cu:39-89): warmups discarded, 10 timed runs, 2σ outlier
        # rejection, median of the valid runs
        times = []
        for i in range(warmup + runs):
            x, stats = cg.cg_solve(operator, b, config=cfg, b_is_ones=True,
                                   recompute_ap=recompute_ap)
            if i >= warmup:
                times.append(stats.total_time_ms)
            if not stats.converged:
                raise RuntimeError(f"CG did not converge ({label})")
            if stats.iterations != REF_ITERS:
                raise RuntimeError(
                    f"iteration-count parity broken ({label}): "
                    f"{stats.iterations} != {REF_ITERS}")
            del x
        return compute_stats(times)

    # classic 3-pass loop first (the known-good program), then the 8-words/pt
    # recompute-Ap loop; the headline is whichever measures faster, and the artifact
    # says which ran.  A recompute failure (e.g. a Mosaic regression) must not take
    # down the headline — the classic number stands.
    bstats = run_solves(op, "stencil5-const classic", recompute_ap=False)
    loop = "fused-classic"
    med_classic = bstats.median_ms
    print(f"[bench] cg 20480^2 stencil5-const f32 (classic loop): median "
          f"{med_classic:.1f} ms", file=sys.stderr)
    try:
        rstats = run_solves(op, "stencil5-const recompute", recompute_ap=True)
        print(f"[bench] cg 20480^2 stencil5-const f32 (recompute-ap loop): median "
              f"{rstats.median_ms:.1f} ms", file=sys.stderr)
        if rstats.median_ms < med_classic:
            bstats, loop = rstats, "recompute-ap"
    except Exception as e:
        print(f"[bench] recompute loop failed ({type(e).__name__}: {e}); "
              "classic headline stands", file=sys.stderr)
    med = bstats.median_ms
    print(f"[bench] cg 20480^2 stencil5-const f32: median {med:.1f} ms ({loop}), "
          f"{REF_ITERS} iterations (ref A100 f64: {REF_20K_MS} ms)", file=sys.stderr)
    # SAME-byte-model companion (round-2 review: the headline crosses byte model —
    # values-free f32 vs the A100's values-carrying f64 CSR; the bf16c kernel streams
    # comparable per-point traffic and must be reported alongside, not buried in docs)
    med_bf16c = None
    try:
        # planes synthesized ON DEVICE, DIRECTLY in bf16 (a host build would ship 8.4 GB
        # through the tunnel, and an f32 device intermediate OOMs the 16 GB chip next to
        # the solve state; 5.0/−1.0/0.0 are exact in bf16, so direct synthesis is
        # bit-identical to the cast)
        planes_bf16 = generate.make_stencil5_planes_device(g, dtype=jnp.bfloat16)
        st2 = Stencil5(grid_size=g, planes=planes_bf16, constant=(5.0, -1.0))
        op2 = ops.get_operator("stencil5-bf16c", st2)
        del st2, planes_bf16
        med_bf16c = run_solves(op2, "stencil5-bf16c").median_ms
        op2.free()
        print(f"[bench] cg 20480^2 stencil5-bf16c (values-carrying, same-traffic-class): "
              f"median {med_bf16c:.1f} ms", file=sys.stderr)
    except Exception as e:  # the headline metric must not die on the companion
        print(f"[bench] bf16c companion failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    return {
        "metric": "cg_20480sq_419M_unknowns_time_ms_stencil5-const_f32",
        "value": round(med, 1),
        # self-describing: OUR mode/dtype vs WHAT reference number (A100 f64 CSR solve)
        "unit": "ms_median_stencil5-const_f32_vs_a100_f64_csr_531.4",
        "vs_baseline": round(REF_20K_MS / med, 4),
        "mode": "stencil5-const",
        "loop": loop,
        "classic_loop_ms": round(med_classic, 1),
        "dtype": "float32",
        "iterations": REF_ITERS,
        "total_runs": bstats.total_runs,
        "valid_runs": bstats.valid_runs,
        "std_ms": round(bstats.std_ms, 2),
        **({"values_carrying_bf16c_ms": round(med_bf16c, 1),
            "vs_baseline_bf16c": round(REF_20K_MS / med_bf16c, 4)}
           if med_bf16c else {}),
    }


def bench_spmv_roofline() -> dict:
    import jax
    import jax.numpy as jnp

    from tpusparse import generate
    from tpusparse.bench.metrics import chip_peaks
    from tpusparse.bench.sysinfo import get_system_info
    from tpusparse.kernels.stencil5 import spmv_stencil5_pipelined

    info = get_system_info()
    on_tpu = info["backend"] != "cpu"
    g = 10240 if on_tpu else 512
    dtype = jnp.float32
    print(f"[bench] spmv fallback: device={info['device_kind']} g={g}", file=sys.stderr)

    planes = generate.make_stencil5_planes_device(g, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (g, g), dtype)

    def run(v):
        return spmv_stencil5_pipelined(planes, v)

    y1 = run(jnp.ones((g, g), dtype))
    s_ref, _ = generate.stencil5_spmv_checksums(g)
    s_got = float(jnp.sum(y1))  # f32 sum is exact enough for the 1e-3 gate at these sizes
    rel = abs(s_got - s_ref) / abs(s_ref)
    if rel > 1e-3:
        raise RuntimeError(f"checksum mismatch: {s_got} vs {s_ref}")

    # paired-chain slope: fixed dispatch/readback costs cancel (docs/PERFORMANCE.md protocol)
    k_lo, k_hi = (6, 24) if on_tpu else (2, 6)

    def chain(k):
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            v = x
            for _ in range(k):
                v = run(v)
            _ = float(jnp.sum(v))
            best = min(best, time.perf_counter() - t0)
        return best

    from tpusparse.bench.probes import slope_seconds

    run(x)
    _ = float(jnp.sum(run(x)))  # warm + sync
    per_apply = slope_seconds(chain(k_lo), chain(k_hi), k_lo, k_hi)
    gbs = 7 * g * g * 4 / per_apply / 1e9
    peak, _ = chip_peaks(info["device_kind"])
    frac = gbs / peak
    print(f"[bench] stencil5 spmv: {per_apply * 1e3:.3f} ms/apply (slope), {gbs:.1f} GB/s, "
          f"{100 * frac:.1f}% of {peak:.0f} GB/s roofline", file=sys.stderr)
    return {
        "metric": "stencil5_spmv_hbm_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_chip_hbm_peak",
        "vs_baseline": round(frac / 0.95, 4),
    }


def _run_cg20k_subprocess():
    """Run the 20k solve in a CHILD process: an OOM there cannot fragment/poison the device
    state the fallback needs.  The child prints one JSON line on success."""
    import os
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__), "--cg20k"],
        capture_output=True, text=True, timeout=1800,
    )
    sys.stderr.write(proc.stderr[-2000:])
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def main() -> int:
    if "--cg20k" in sys.argv:
        from tpusparse import dist

        dist.enable_compilation_cache()
        print(json.dumps(bench_cg_20k()))
        return 0

    # IMPORTANT: do NOT initialize jax (and thereby claim the TPU) in the parent before the
    # child runs — on standard TPU VMs libtpu ownership is exclusive per process.  The child
    # checks the backend itself and errors out on CPU, which lands us in the fallback.
    result = None
    try:
        result = _run_cg20k_subprocess()
    except Exception as e:  # timeout, crash, anything — fall back, don't fail
        print(f"[bench] cg20k subprocess failed ({type(e).__name__}: {e})", file=sys.stderr)
    if result is None:
        print("[bench] falling back to spmv roofline", file=sys.stderr)
        from tpusparse import dist

        dist.enable_compilation_cache()
        result = bench_spmv_roofline()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
