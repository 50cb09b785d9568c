"""Tracing / profiling integration.

Parity with the reference's observability (SURVEY.md §5.1):
  - NVTX phase ranges (CG_Solver, CG_Iteration, SpMV, Dot_Product, BLAS_AXPY,
    Halo_Exchange_MPI — cg_solver_mgpu_partitioned.cu:540-543)  →  ``jax.named_scope`` /
    ``jax.profiler.TraceAnnotation`` with the same phase names, visible in XProf/TensorBoard.
  - cudaProfilerStart/Stop around one dedicated solve excluded from stats
    (cg_solver_mgpu_stencil.cu:115-117)  →  ``profiled_run`` context manager wrapping
    ``jax.profiler.trace`` capture of a single run.
  - nsys capture recipe (README "Profiling with Nsight Systems")  →  ``capture_trace`` writes
    a TensorBoard-loadable trace directory; view with
    ``tensorboard --logdir <dir>`` (profile plugin) or xprof.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax

# Canonical phase names (keep in sync with the reference's NVTX strings so profile
# comparisons line up side by side).
PHASE_SOLVER = "CG_Solver"
PHASE_ITERATION = "CG_Iteration"
PHASE_SPMV = "SpMV"
PHASE_DOT = "Dot_Product"
PHASE_AXPY = "BLAS_AXPY"
PHASE_HALO = "Halo_Exchange"


def scope(name: str):
    """Named scope usable inside jitted code; shows up as an op-name prefix in traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def capture_trace(logdir: str = "results/traces") -> Iterator[str]:
    """Capture a device trace for everything inside the context (the nsys-capture analog).
    Yields the log directory; load it in TensorBoard's profile plugin / XProf."""
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield logdir


def profiled_run(fn, *args, logdir: str = "results/traces", **kwargs):
    """Run ``fn`` once under a trace capture, excluded from any stats — the reference's
    dedicated cudaProfilerStart/Stop run (cg_solver_mgpu_stencil.cu:111-121)."""
    with capture_trace(logdir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out


def annotate(name: str):
    """Host-side trace annotation for phase-split (stepped) timing runs."""
    return jax.profiler.TraceAnnotation(name)
