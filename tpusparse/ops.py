"""SpMV operator registry.

Parity with the reference's function-pointer vtable ``SpmvOperator {name, init, run_timed,
run_device, free}`` (include/spmv.h:125-134) and registry ``get_operator(mode)``
(src/spmv/spmv.cu:11-23).  Mode names:

  - ``"csr"``            — generic baseline (the cuSPARSE-CSR role, reference "cusparse-csr"):
                           hand Pallas windowed-ELL gather kernel (kernels/gather_ell.py);
                           falls back to the XLA gather for sparsity that defeats windowing.
  - ``"csr-xla"``        — the XLA-gather ELL formulation: the Pallas gather kernel's
                           oracle/fallback (arbitrary sparsity, slower).
  - ``"dia"``            — gather-free diagonal-offset Pallas/XLA kernel for matrices with few
                           distinct diagonals (TPU-native generic structured path).
  - ``"stencil5"``       — the showcase structure-exploiting Pallas kernel
                           (reference "stencil5-csr").
  - ``"stencil5-bf16c"`` — stencil5 with bf16 coefficient storage (bit-identical for exactly
                           representable fields, halves plane traffic).
  - ``"stencil5-xla"``   — pure-XLA shifted-pads stencil: the Pallas oracle, fusion baseline,
                           and the f64 stencil path on TPU.
  - ``"stencil5-const"`` — values-free constant-coefficient fast path (extension flagged in
                           SURVEY.md §6).
  - ``"dia-xla"``        — pure-XLA diagonal path (the DIA kernel's oracle).
  - ``"bcoo"``           — jax.experimental.sparse BCOO matvec: the independent
                           industry-reference cross-check (the AmgX role, SURVEY.md §2.7).

Operator contract: ``init(matrix-ish) -> DeviceOperator`` with
  - ``run_device(x_field) -> y_field``         (reference run_device, zero host transfer)
  - ``run_device_dot(x) -> (y, <x,y>)``        (fused SpMV+dot for CG)
  - ``run_timed(x) -> (y, ms)``                (reference run_timed: includes one H2D/D2H)
  - ``free()``                                 (drop device references)
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import formats
from .formats import CSRMatrix, Stencil5
from .kernels import stencil5 as _st5


def _default_dtype():
    # f64 kernels cannot compile on TPU (Mosaic); x64 CPU runs use f64 end to end.
    return jnp.float64 if jax.config.jax_enable_x64 and jax.default_backend() == "cpu" \
        else jnp.float32


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


@dataclasses.dataclass
class DeviceOperator:
    name: str
    num_rows: int
    num_cols: int
    nnz: int
    field_shape: tuple  # (rows, cols) 2-D view of the vector space (may include padding)
    run_device: Callable  # x_field -> y_field
    run_device_dot: Callable  # x_field -> (y_field, <x, A x>)
    grid_size: int = 0
    _buffers: Any = None
    # Explicit-operand forms: the CG solver jits over these so large device arrays enter the
    # compiled program as runtime ARGUMENTS, never as inline constants (a 2 GB inline constant
    # breaks compilation at 10k+ grids).  ``operands`` is any pytree of device arrays;
    # ``run_device_dot_op(x, operands) -> (y, <x,Ax>)``.
    operands: Any = ()
    run_device_op: Optional[Callable] = None
    run_device_dot_op: Optional[Callable] = None
    # optional fused CG pass: (beta, r, p, operands) -> (p', A·p', <p', A·p'>)
    run_fused_pupdate_op: Optional[Callable] = None
    # optional recompute-Ap CG passes (the 8-words/pt iteration, kernels/stencil5.py
    # round-5 block comment): Ap never touches HBM —
    #   run_pupdate_dot_op(beta, r, p, operands) -> (p', <p', A·p'>)          (3 words/pt)
    #   run_update_recompute_op(alpha, x, r, p, operands) -> (x', r', <r',r'>) (5 words/pt)
    run_pupdate_dot_op: Optional[Callable] = None
    run_update_recompute_op: Optional[Callable] = None

    @property
    def field_elems(self) -> int:
        return self.field_shape[0] * self.field_shape[1]

    def as_field(self, x_flat):
        """Reshape a length-num_cols vector into the operator's 2-D field, zero-padding the
        tail when the field is larger than the vector space (e.g. lane-padded DIA)."""
        x = jnp.asarray(x_flat).reshape(-1)
        if x.shape[0] > self.field_elems:
            # .at[].set silently clips out-of-range updates — that would drop the tail of x
            raise ValueError(
                f"vector of length {x.shape[0]} does not fit the operator field "
                f"{self.field_shape} ({self.field_elems} elements)"
            )
        if self.field_elems != x.shape[0]:
            x = jnp.zeros((self.field_elems,), x.dtype).at[: x.shape[0]].set(x)
        return x.reshape(self.field_shape)

    def from_field(self, x_field):
        """Flatten a field back to the length-num_rows vector (drops padding)."""
        return jnp.asarray(x_field).reshape(-1)[: self.num_rows]

    def ones_b(self, dtype):
        """The canonical b = ones right-hand side, zero in any padded tail.  Built in the
        target dtype on the host — an f64 staging upload would double the H2D bytes and the
        transient HBM footprint (OOM-relevant at 20480², see run_timed)."""
        return self.as_field(np.ones(self.num_cols, dtype=np.dtype(dtype)))

    def run_timed(self, x_flat_host: np.ndarray):
        """Reference run_timed semantics (spmv_cusparse_csr.cu:234-264): includes the H2D of x
        and D2H of y in the timed region, kernel timed on device events — here wall clock
        around a fully synchronized call."""
        t0 = time.perf_counter()
        # cast on HOST before the H2D: uploading np.ones's f64 then casting on device
        # doubles both the transfer and the transient HBM footprint — at 20480² (f32) the
        # extra 3.4 GB staging copy is the difference between fitting and OOM next to the
        # 8.4 GB plane operand
        x_host = np.asarray(x_flat_host, dtype=np.dtype(self._run_dtype()))
        y = self.run_device(self.as_field(x_host))
        y_host = np.asarray(y).reshape(-1)[: self.num_rows]
        ms = (time.perf_counter() - t0) * 1e3
        return y_host, ms

    def run_timed_resident(self, x_field_dev):
        """Device-resident timed run — the reference's ACTUAL timed region
        (spmv_cusparse_csr.cu:234-264: x is uploaded ONCE before the run loop and y read
        back once after it; the per-run cudaEvent window wraps the kernel alone).
        ``run_timed`` above is the stricter transfer-inclusive wall protocol; on tunneled
        deployments its per-run H2D+D2H dominates at large grids (~70 s/run at 20480² —
        the distribution stops saying anything about the device).  Here the timed region
        is apply + one scalar sync (~25 ms round-trip floor on this deployment,
        disclosed in docs/PERFORMANCE.md); bandwidth/GFLOPS metrics continue to come from
        the chained-slope ``kernel_time_ms`` under either protocol."""
        t0 = time.perf_counter()
        y = self.run_device(x_field_dev)
        float(jnp.sum(y))  # force completion: block_until_ready may not block here
        return y, (time.perf_counter() - t0) * 1e3

    def kernel_time_ms(self, chain: int = 24, reps: int = 3) -> float:
        """Device-only kernel time — the analog of the reference's cudaEvent window around
        the kernel alone (spmv_cusparse_csr.cu:247-253): H2D/D2H and dispatch excluded.

        Protocol: PAIRED-CHAIN DIFFERENCING.  Two chained-launch runs (output feeds the next
        input) of lengths k_lo < k_hi are timed and the per-apply time is the slope
        (t_hi − t_lo)/(k_hi − k_lo).  The subtraction cancels every fixed cost — dispatch
        and the final scalar-sync round trip (~25 ms on tunneled deployments, where
        ``block_until_ready`` may not block at all).  Naive chain-average timing charges
        fixed/chain to every apply: ~1 ms/apply of phantom time at chain=24, a 25% error on
        a 4 ms kernel (measured on v5e — see docs/PERFORMANCE.md calibration)."""
        x = self.ones_b(self._run_dtype())
        v = self.run_device(x)
        float(jnp.sum(v))  # compile + warm + sync (untimed: compile must not skew the probe)
        t0 = time.perf_counter()
        v = self.run_device(x)
        float(jnp.sum(v))
        probe_ms = (time.perf_counter() - t0) * 1e3
        del v  # 1.68 GB at 20480² — must not stay live alongside the chain's carry
        # scale the chain to the operator's speed so slow generic paths (gather/bcoo at
        # hundreds of ms per apply) don't burn minutes: keep a rep under ~1 s.
        k_hi = max(4, min(chain, int(1000 / max(probe_ms, 1.0))))
        k_lo = max(1, k_hi // 4)
        if probe_ms > 300:
            reps = min(reps, 2)

        # Chain INSIDE one jitted program when the operator has an explicit-operand form:
        # a lax.fori_loop carry is double-buffered by XLA, so the in-flight footprint is
        # operand + 2 fields regardless of k.  Host-loop chaining instead enqueues up to
        # ~10 launches ahead through the tunnel, each holding a live output buffer —
        # measured ResourceExhausted at 20480² (1.68 GB/field) where the operand itself
        # fits with 7 GB to spare.  One dispatch per chain also removes per-launch
        # dispatch noise from the slope.
        prog = self._chain_program()

        def chain_run(k):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                if prog is not None:
                    v = prog(x, self.operands, k=k)
                else:
                    v = x
                    for _ in range(k):
                        v = self.run_device(v)
                float(jnp.sum(v))
                best = min(best, time.perf_counter() - t0)
            return best

        from .bench.probes import slope_seconds

        if prog is not None:
            # compile both chain lengths before timing
            float(jnp.sum(prog(x, self.operands, k=k_lo)))
            float(jnp.sum(prog(x, self.operands, k=k_hi)))
        t_lo = chain_run(k_lo)
        t_hi = chain_run(k_hi)
        diff = t_hi - t_lo

        # CHAIN ESCALATION (round-4): for sub-ms kernels even the k_lo/k_hi pair differs
        # by less than the tunnel's readback jitter (±ms), so the slope is noise — the
        # round-3 small-grid artifacts swung 0.14 → 1.09 ms between campaigns on the same
        # kernel.  Repeat the already-compiled k_hi chain R times back-to-back (the carry
        # feeds forward, so execution is sequential on device with two live field buffers
        # and NO recompile — a fresh longer unroll would cost minutes of remote compile)
        # until the paired difference clears ~0.4 s, then difference over total applies.
        if prog is not None and diff < 0.1 and jax.default_backend() != "cpu":
            est = max(diff / (k_hi - k_lo), 1e-5)  # ≥10 µs/apply floor bounds R
            r_hi = max(4, int(-(-0.4 // (est * k_hi))))
            # cap live enqueue-ahead memory: each in-flight dispatch holds one field
            r_hi = min(r_hi, 128, max(4, int(4e9 / max(x.nbytes, 1))))
            r_lo = max(1, r_hi // 4)

            def chain_rep(r):
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    v = x
                    for _ in range(r):
                        v = prog(v, self.operands, k=k_hi)
                    float(jnp.sum(v))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_rlo = chain_rep(r_lo)
            t_rhi = chain_rep(r_hi)
            return slope_seconds(t_rlo, t_rhi, r_lo * k_hi, r_hi * k_hi) * 1e3

        # shared noise guard: a jitter-dominated negative slope falls back to the
        # (kernel-unflattering) chain average instead of exporting absurd numbers
        return slope_seconds(t_lo, t_hi, k_lo, k_hi) * 1e3

    def _chain_program(self):
        """Jitted k-apply chain (lax.fori_loop over run_device_op) — see kernel_time_ms.
        Returns None for closure-only operators (no explicit-operand form)."""
        if self.run_device_op is None:
            return None
        cached = getattr(self, "_chain_jit", None)
        if cached is None:
            import jax

            rop = self.run_device_op

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain_prog(x, operands, k):
                # STATIC unroll, not lax.fori_loop: a while-loop carry must alias the
                # loop parameter's buffer, so XLA copies the body's result back into the
                # carry slot EVERY iteration — one full extra field read+write per apply
                # (measured on v5e at 20480²: const kernel 10.4 ms/apply under fori_loop
                # vs ~5.2 expected; the copy is 2 words/pt, exactly doubling its
                # traffic).  Unrolled straight-line code lets buffer assignment
                # ping-pong two field buffers with no copy and no aliasing constraint.
                #
                # FUSION FENCE between applies: for the pure-XLA modes (*-xla) nothing
                # stops XLA from fusing apply k's elementwise work into apply k+1 —
                # the chain then under-counts per-apply HBM traffic and the slope
                # reports impossible bandwidths (round-3 artifacts showed up to 233%
                # of HBM peak at small grids).  optimization_barrier forces each
                # apply's result to materialize before the next consumes it — the
                # analog of the reference's cudaEvent-around-the-kernel boundary
                # (spmv_cusparse_csr.cu:247-253).  Pallas calls are already fusion
                # boundaries; the barrier is a no-op there.
                v = x
                for _ in range(k):
                    v = rop(v, operands)
                    v = jax.lax.optimization_barrier(v)
                return v

            object.__setattr__(self, "_chain_jit", chain_prog)
            cached = chain_prog
        return cached

    def _run_dtype(self):
        return self._buffers.get("dtype", _default_dtype()) if isinstance(
            self._buffers, dict) else _default_dtype()

    def free(self):
        """Drop ALL device references (reference op->free).  The operator is unusable after;
        re-init with get_operator.  Clearing the callables matters: the _wrap_ops closures
        hold the operands, so nulling _buffers alone would keep the device arrays alive."""
        def _freed(*_a, **_k):
            raise RuntimeError("operator was freed; re-create it with get_operator()")

        self._buffers = None
        self.operands = ()
        self.run_device = _freed
        self.run_device_dot = _freed
        self.run_device_op = _freed
        self.run_device_dot_op = _freed
        self.run_fused_pupdate_op = None
        self.run_pupdate_dot_op = None
        self.run_update_recompute_op = None
        # the chain program's closure captures the pre-free run_device_op (and through
        # it the operands) — dropping it here is what actually releases that memory
        if getattr(self, "_chain_jit", None) is not None:
            object.__setattr__(self, "_chain_jit", None)


# ---------------------------------------------------------------------------
# stencil5 (values-carrying Pallas kernel)
# ---------------------------------------------------------------------------


def _planes_device(st: Stencil5, dtype):
    """Device coefficient planes for a Stencil5.  ``planes=None`` with ``constant`` set
    synthesizes them DIRECTLY ON DEVICE (generate.make_stencil5_planes_device) — on
    tunneled deployments this replaces a multi-GB host→device upload (10.5 GB of f32
    planes at 20480²) with an in-graph broadcast, and is bit-identical to uploading the
    host generator's planes (same masks, same constants)."""
    if st.planes is None:
        if st.constant is None:
            raise ValueError("Stencil5 needs planes or constant coefficients")
        from .generate import make_stencil5_planes_device

        return make_stencil5_planes_device(st.grid_size, *st.constant, dtype=dtype)
    return jnp.asarray(st.planes, dtype)


def _init_stencil5(st: Stencil5, dtype=None, coeff_dtype=None) -> DeviceOperator:
    """``coeff_dtype`` (mode "stencil5-bf16c"): store the coefficient planes in bf16 while
    the vector state stays f32 — plane traffic halves (28 → 18 B/pt) for a measured 28%
    SpMV speedup on v5e.  For coefficient fields exactly representable in bf16 (the stencil's
    5.0 / −1.0 / 0.0 included) the results are BIT-IDENTICAL to f32 storage; for general
    fields the coefficients round to 8-bit mantissa — the caller chooses."""
    dtype = dtype or _default_dtype()
    g = st.grid_size
    planes = _planes_device(st, coeff_dtype or dtype)
    interp = _is_cpu()

    def run_device(x):
        return _st5.spmv_stencil5_pipelined(planes, x, interpret=interp)

    def run_device_dot(x):
        return _st5.spmv_stencil5_pipelined(planes, x, with_dot=True, interpret=interp)

    def run_device_op(x, operands):
        return _st5.spmv_stencil5_pipelined(operands[0], x, interpret=interp)

    def run_device_dot_op(x, operands):
        return _st5.spmv_stencil5_pipelined(operands[0], x, with_dot=True, interpret=interp)

    def run_fused_pupdate_op(beta, r, p, operands):
        """(p', A·p', <p',A·p'>) with p' = r + β·p in ONE pass — the CG top-of-iteration
        fusion (saves re-reading p' from HBM vs separate p-update + SpMV)."""
        return _st5.spmv_stencil5_pupdate_pipelined(operands[0], beta, r, p,
                                                    interpret=interp)

    return DeviceOperator(
        name="stencil5", num_rows=g * g, num_cols=g * g, nnz=st.nnz,
        field_shape=(g, g), run_device=run_device, run_device_dot=run_device_dot,
        grid_size=g, _buffers={"planes": planes, "dtype": dtype},
        operands=(planes,), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
        run_fused_pupdate_op=run_fused_pupdate_op,
    )


def _init_stencil5_xla(st: Stencil5, dtype=None) -> DeviceOperator:
    """Pure-XLA shifted-pads stencil SpMV (kernels/stencil5.spmv_stencil5_xla).  Three roles:
    the Pallas kernel's correctness oracle, the fusion baseline it is measured against, and
    the **f64 stencil path on TPU** (Mosaic has no f64; XLA emulates it)."""
    dtype = dtype or _default_dtype()
    g = st.grid_size
    planes = _planes_device(st, dtype)

    def run_device_op(x, operands):
        return _st5.spmv_stencil5_xla(operands[0], x)

    def run_device_dot_op(x, operands):
        y = run_device_op(x, operands)
        dot = jnp.sum(x * y) if x.dtype == jnp.float64 else jnp.vdot(x, y)  # see _vdot2
        return y, dot

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, (planes,))

    return DeviceOperator(
        name="stencil5-xla", num_rows=g * g, num_cols=g * g, nnz=st.nnz,
        field_shape=(g, g), run_device=run_device, run_device_dot=run_device_dot,
        grid_size=g, _buffers={"planes": planes, "dtype": dtype},
        operands=(planes,), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _init_stencil5_const(st: Stencil5, dtype=None) -> DeviceOperator:
    if st.constant is None:
        raise ValueError("stencil5-const requires uniform coefficients")
    dtype = dtype or _default_dtype()
    g = st.grid_size
    diag, offdiag = st.constant
    interp = _is_cpu()

    def run_device(x):
        return _st5.spmv_stencil5_const_pipelined(
            x, diag=diag, offdiag=offdiag, interpret=interp)

    def run_device_dot(x):
        return _st5.spmv_stencil5_const_pipelined(
            x, diag=diag, offdiag=offdiag, with_dot=True, interpret=interp)

    def run_fused_pupdate_op(beta, r, p, operands):
        """(p', A·p', <p',A·p'>) with p' = r + β·p in ONE values-free pass: 4 words/pt
        vs 2 (SpMV) + 3 (separate p-update) unfused."""
        return _st5.spmv_stencil5_const_pupdate_pipelined(
            beta, r, p, diag=diag, offdiag=offdiag, interpret=interp)

    def run_pupdate_dot_op(beta, r, p, operands):
        """Pass A of the 8-words/pt recompute-Ap iteration: (p', <p', A·p'>), A·p' never
        written to HBM (kernels/stencil5.py round-5 block comment)."""
        return _st5.spmv_stencil5_const_pupdate_dot_pipelined(
            beta, r, p, diag=diag, offdiag=offdiag, interpret=interp)

    def run_update_recompute_op(alpha, x, r, p, operands):
        """Pass B: (x', r', <r', r'>) with A·p recomputed from the p stream."""
        return _st5.cg_const_update_recompute_pipelined(
            alpha, x, r, p, diag=diag, offdiag=offdiag, interpret=interp)

    return DeviceOperator(
        name="stencil5-const", num_rows=g * g, num_cols=g * g, nnz=st.nnz,
        field_shape=(g, g), run_device=run_device, run_device_dot=run_device_dot,
        grid_size=g, _buffers={"dtype": dtype},
        operands=(), run_device_op=lambda x, _o: run_device(x),
        run_device_dot_op=lambda x, _o: run_device_dot(x),
        run_fused_pupdate_op=run_fused_pupdate_op,
        run_pupdate_dot_op=run_pupdate_dot_op,
        run_update_recompute_op=run_update_recompute_op,
    )


def _init_stencil5_const_xla(st: Stencil5, dtype=None) -> DeviceOperator:
    """Values-free constant-coefficient XLA path — the f64-at-scale operator on TPU
    (no plane array: the f64 planes alone are 4.2 GB at 10240² and the f64-emulated
    planes solve OOMs at 19.6 GB; this one fits — see kernels/stencil5.py docstring)."""
    if st.constant is None:
        raise ValueError("stencil5-const-xla requires uniform coefficients")
    dtype = dtype or _default_dtype()
    g = st.grid_size
    diag, offdiag = st.constant

    def run_device_op(x, operands):
        return _st5.spmv_stencil5_const_xla(x, diag, offdiag)

    def run_device_dot_op(x, operands):
        y = run_device_op(x, operands)
        # sum over the 2-D field, not vdot: vdot's ravel triggers the emulated-f64 flat
        # tile-padding blowup under x64-on-TPU (see solvers.cg._vdot2)
        dot = jnp.sum(x * y) if x.dtype == jnp.float64 else jnp.vdot(x, y)
        return y, dot

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, ())

    return DeviceOperator(
        name="stencil5-const-xla", num_rows=g * g, num_cols=g * g, nnz=st.nnz,
        field_shape=(g, g), run_device=run_device, run_device_dot=run_device_dot,
        grid_size=g, _buffers={"dtype": dtype},
        operands=(), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


# ---------------------------------------------------------------------------
# Generic paths
# ---------------------------------------------------------------------------


def _wrap_ops(run_device_op, run_device_dot_op, operands):
    """Build (run_device, run_device_dot) from the explicit-operand forms.

    THE invariant for every operator: device arrays enter jitted programs only as runtime
    ARGUMENTS.  A jit that closes over an operand embeds it as an inline constant in the
    compiled program, which breaks large grids (multi-GB embeddings; oversized
    remote-compile payloads).  This helper is the single place that invariant lives."""
    _apply = jax.jit(run_device_op)
    _apply_dot = jax.jit(run_device_dot_op)
    return (lambda x: _apply(x, operands)), (lambda x: _apply_dot(x, operands))


def _field_shape_for(n: int) -> tuple:
    """Factor n into a 2-D field shape with a wide-ish lane dim (vectors are 2-D on TPU).

    When n has no 128-multiple factor, the field is zero-PADDED to (ceil(n/128), 128)
    rather than degraded to (n, 1) — a lane-width-1 field is maximally hostile to the
    8×128 VPU and would silently hit real inputs (the reference's own 6561-row sample).
    The as_field/ones_b machinery zero-fills the tail; operators built on this shape must
    keep the tail zero in their outputs (see _pad_to_field)."""
    for cols in (1024, 512, 256, 128):
        if n % cols == 0:
            return (n // cols, cols)
    return (-(-n // 128), 128)


def _pad_to_field(y_flat, fshape):
    """Reshape a length-n result vector into a possibly padded field, zero tail."""
    elems = fshape[0] * fshape[1]
    n = y_flat.shape[0]
    if elems != n:
        y_flat = jnp.zeros((elems,), y_flat.dtype).at[:n].set(y_flat)
    return y_flat.reshape(fshape)


def _init_gather_ell(mat, dtype=None, variant: str = "auto") -> DeviceOperator:
    """Generic gather SpMV via the hand Pallas windowed-ELL kernel (kernels/gather_ell.py)
    — the cuSPARSE-CSR baseline role (reference src/spmv/spmv_cusparse_csr.cu:182-285) as
    a real TPU kernel: pack-time measured column windows + in-VMEM lane gathers.

    ``variant``: "auto" tries the AFFINE pack first (short residual ladder for banded
    slope-1 matrices — see gather_ell.pack_gather_ell_affine) and falls back to the
    general ladder pack when the matrix is not affine-windowable; "ladder"/"affine"
    force one.  Matrices whose measured column spans defeat windowing entirely
    (GatherPackError from both packs) fall back to the XLA gather path LOUDLY —
    same correctness, slower; see the kernel's module doc."""
    from .kernels import gather_ell as _gell

    dtype = dtype or _default_dtype()
    if dtype == jnp.float64 and not _is_cpu():
        # Mosaic cannot compile f64 Pallas kernels (TPU f64 is XLA-emulated); the pack-time
        # GatherPackError seam would not catch this — the failure surfaces at compile/run.
        # Route loudly to the XLA gather path, same contract, f64-capable.
        import sys as _sys

        print("[tpusparse] f64 Pallas gather does not compile on TPU; "
              "using the XLA gather path (csr-xla)", file=_sys.stderr)
        return _init_ell_xla(mat, dtype=dtype)
    if isinstance(mat, Stencil5):
        # O(n) plane→ELL pack — the CSR materialization alone (2.1B-entry sort at 20480²)
        # was the pack-time bottleneck for large stencil operands
        ell = formats.stencil5_to_ell(mat)
        nnz = int(np.count_nonzero(ell.val))
    else:
        csr = _as_csr(mat)
        ell = formats.csr_to_ell(csr)
        nnz = csr.nnz
    packed = kern = None
    if variant in ("auto", "affine"):
        try:
            packed = _gell.pack_gather_ell_affine(ell.col, ell.val, ell.num_cols, dtype)
            nrot = sum(1 for c in packed.rot if c is not None)
            # rot slots (exact diagonals → lane-rotation kernel path, no index traffic)
            # are recorded in the variant so artifacts say which program actually ran
            kern = f"affine+rot{nrot}" if nrot else "affine"
        except _gell.GatherPackError as e:
            if variant == "affine":
                raise
            import sys as _sys

            print(f"[tpusparse] affine gather pack declined ({e}); using the ladder pack",
                  file=_sys.stderr)
    if packed is None:
        try:
            packed = _gell.pack_gather_ell(ell.col, ell.val, ell.num_cols, dtype)
            kern = "ladder"
        except _gell.GatherPackError as e:
            import sys as _sys

            print(f"[tpusparse] gather kernel pack failed ({e}); falling back to "
                  "XLA gather", file=_sys.stderr)
            return _init_ell_xla(mat, dtype=dtype)
    meta = _gell.static_meta(packed)
    fshape = (packed.x_rows, _gell.LANES)
    interp = _is_cpu()

    if kern.startswith("affine"):
        def run_device_op(x, operands):
            w0, q, loc, vals, orow, ocol, oval = operands
            return _gell.spmv_gather_affine_arrays(w0, loc, vals, orow, ocol, oval,
                                                   x.astype(dtype), meta=meta,
                                                   interpret=interp)
    else:
        def run_device_op(x, operands):
            w0, q, loc, vals, orow, ocol, oval = operands
            return _gell.spmv_gather_ell_arrays(w0, q, loc, vals, orow, ocol, oval,
                                                x.astype(dtype), meta=meta,
                                                interpret=interp)

    def run_device_dot_op(x, operands):
        # y's tail is zero past num_rows, so the full-field vdot equals the true dot
        y = run_device_op(x, operands)
        return y, jnp.vdot(x, y)

    operands = (packed.w0, packed.q, packed.loc, packed.vals,
                packed.orow, packed.ocol, packed.oval)
    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, operands)

    return DeviceOperator(
        name="csr", num_rows=ell.num_rows, num_cols=ell.num_cols, nnz=nnz,
        field_shape=fshape, run_device=run_device, run_device_dot=run_device_dot,
        grid_size=ell.grid_size,
        _buffers={"loc": packed.loc, "val": packed.vals, "dtype": dtype,
                  "span": packed.span, "swin": packed.swin,
                  "nb": packed.nb, "width": packed.width, "gather_variant": kern},
        operands=operands, run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _init_ell_xla(mat, dtype=None, width: Optional[int] = None) -> DeviceOperator:
    """Generic gather-based path via XLA gather.  CSR/COO → padded ELL; the gather x[col]
    runs as an XLA gather — correct for arbitrary matrices, and the fallback/oracle for
    the hand Pallas gather kernel (_init_gather_ell)."""
    dtype = dtype or _default_dtype()
    if isinstance(mat, Stencil5) and width is None:
        ell = formats.stencil5_to_ell(mat)  # O(n) plane pack, no CSR intermediate
        nnz = int(np.count_nonzero(ell.val))
    else:
        csr = _as_csr(mat)
        ell = formats.csr_to_ell(csr, width)
        nnz = csr.nnz
    idx_dtype = jnp.int32 if ell.num_cols < 2 ** 31 else jnp.int64
    cols_d = jnp.asarray(ell.col, idx_dtype)
    vals_d = jnp.asarray(ell.val, dtype)
    fshape = _field_shape_for(ell.num_rows)

    def run_device_op(x, operands):
        cols, vals = operands
        y = jnp.sum(vals * x.reshape(-1)[cols], axis=1)
        return _pad_to_field(y, fshape)

    def run_device_dot_op(x, operands):
        # y's padded tail is zero, so the full-field vdot equals the length-n dot
        y = run_device_op(x, operands)
        return y, jnp.vdot(x.reshape(-1), y.reshape(-1))

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op,
                                           (cols_d, vals_d))

    return DeviceOperator(
        name="csr", num_rows=ell.num_rows, num_cols=ell.num_cols, nnz=nnz,
        field_shape=fshape, run_device=run_device, run_device_dot=run_device_dot,
        grid_size=ell.grid_size, _buffers={"col": cols_d, "val": vals_d, "dtype": dtype},
        operands=(cols_d, vals_d), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _init_dia(mat, dtype=None) -> DeviceOperator:
    """Gather-free diagonal-offset Pallas kernel (kernels/dia.py): y = Σ_d data[d]·shift(x).
    The TPU-native generic formulation for banded/structured matrices — plays the reference's
    generic-CSR kernel role (cg_solver_mgpu_partitioned.cu:40-56) without index traffic.

    The field is lane-padded to (rows128 + 2·pad_rows ... ) internally; the operator's public
    field shape is (rows128, 128) with a zero tail."""
    from .kernels import dia as _dia

    dtype = dtype or _default_dtype()
    if isinstance(mat, Stencil5):
        # direct O(n) plane→diagonal pack — no 5g²-entry host CSR intermediate
        dia = formats.stencil5_to_dia(mat)
        nnz = mat.nnz
    else:
        csr = _as_csr(mat)
        dia = formats.csr_to_dia(csr)
        nnz = csr.nnz
    data128, offsets, n, nr = _dia.pack_dia_operand(dia, dtype)
    fshape = (nr, _dia.LANES)

    def run_device_op(x, operands):
        return _dia.spmv_dia_pallas(operands[0], x.astype(dtype), offsets=offsets)

    def run_device_dot_op(x, operands):
        y = run_device_op(x, operands)
        return y, jnp.vdot(x, y)

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, (data128,))

    return DeviceOperator(
        name="dia", num_rows=n, num_cols=dia.num_cols, nnz=nnz,
        field_shape=fshape, run_device=run_device, run_device_dot=run_device_dot,
        grid_size=dia.grid_size, _buffers={"data": data128, "dtype": dtype},
        operands=(data128,), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _init_dia_xla(mat, dtype=None) -> DeviceOperator:
    """Pure-XLA diagonal-offset formulation — oracle/fallback for the Pallas DIA kernel."""
    dtype = dtype or _default_dtype()
    if isinstance(mat, Stencil5):
        dia = formats.stencil5_to_dia(mat)  # O(n) plane pack, no CSR intermediate
        nnz = mat.nnz
    else:
        csr = _as_csr(mat)
        dia = formats.csr_to_dia(csr)
        nnz = csr.nnz
    n = dia.num_rows
    data_d = jnp.asarray(dia.data, dtype)  # (ndiag, n)
    offsets = [int(o) for o in dia.offsets]
    fshape = _field_shape_for(n)

    def run_device_op(x, operands):
        (data,) = operands
        xf = x.reshape(-1)
        y = jnp.zeros((n,), dtype)
        for d, off in enumerate(offsets):
            lo = max(0, -off)
            hi = min(n, n - off)
            if hi <= lo:
                continue
            seg = data[d, lo:hi] * jax.lax.dynamic_slice_in_dim(xf, lo + off, hi - lo)
            y = y.at[lo:hi].add(seg)
        return _pad_to_field(y, fshape)

    def run_device_dot_op(x, operands):
        y = run_device_op(x, operands)
        return y, jnp.vdot(x.reshape(-1), y.reshape(-1))

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, (data_d,))

    return DeviceOperator(
        name="dia-xla", num_rows=n, num_cols=dia.num_cols, nnz=nnz,
        field_shape=fshape, run_device=run_device, run_device_dot=run_device_dot,
        grid_size=dia.grid_size, _buffers={"data": data_d, "dtype": dtype},
        operands=(data_d,), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _init_bcoo(mat, dtype=None) -> DeviceOperator:
    """jax.experimental.sparse BCOO matvec — the independent cross-check baseline
    (the AmgX comparison role, SURVEY.md §2.7)."""
    from jax.experimental import sparse as jsparse

    dtype = dtype or _default_dtype()
    csr = _as_csr(mat)
    coo = formats.csr_to_coo(csr)
    idx_dtype = jnp.int32 if max(csr.num_rows, csr.num_cols) < 2 ** 31 else jnp.int64
    indices = jnp.stack(
        [jnp.asarray(coo.row, idx_dtype), jnp.asarray(coo.col, idx_dtype)], axis=1
    )
    bcoo = jsparse.BCOO(
        (jnp.asarray(coo.val, dtype), indices), shape=(csr.num_rows, csr.num_cols)
    )
    fshape = _field_shape_for(csr.num_rows)

    def run_device_op(x, operands):
        return _pad_to_field(operands[0] @ x.reshape(-1)[: csr.num_cols], fshape)

    def run_device_dot_op(x, operands):
        y = run_device_op(x, operands)
        return y, jnp.vdot(x.reshape(-1), y.reshape(-1))

    run_device, run_device_dot = _wrap_ops(run_device_op, run_device_dot_op, (bcoo,))

    return DeviceOperator(
        name="bcoo", num_rows=csr.num_rows, num_cols=csr.num_cols, nnz=csr.nnz,
        field_shape=fshape, run_device=run_device, run_device_dot=run_device_dot,
        grid_size=csr.grid_size, _buffers={"bcoo": bcoo, "dtype": dtype},
        operands=(bcoo,), run_device_op=run_device_op,
        run_device_dot_op=run_device_dot_op,
    )


def _as_csr(mat) -> CSRMatrix:
    if isinstance(mat, CSRMatrix):
        return mat
    if isinstance(mat, formats.COOMatrix):
        return formats.coo_to_csr(mat)
    if isinstance(mat, Stencil5):
        return formats.stencil5_to_csr(mat)
    raise TypeError(f"cannot interpret {type(mat)} as a matrix")


def _as_stencil5(mat) -> Stencil5:
    if isinstance(mat, Stencil5):
        return mat
    return formats.csr_to_stencil5(_as_csr(mat))


_REGISTRY: Dict[str, Callable] = {
    "csr": lambda m, **kw: _init_gather_ell(m, **kw),
    "csr-xla": lambda m, **kw: _init_ell_xla(m, **kw),
    "ell": lambda m, **kw: _init_ell_xla(m, **kw),
    "dia": lambda m, **kw: _init_dia(m, **kw),
    "dia-xla": lambda m, **kw: _init_dia_xla(m, **kw),
    "bcoo": lambda m, **kw: _init_bcoo(m, **kw),
    "stencil5": lambda m, **kw: _init_stencil5(_as_stencil5(m), **kw),
    "stencil5-xla": lambda m, **kw: _init_stencil5_xla(_as_stencil5(m), **kw),
    "stencil5-const": lambda m, **kw: _init_stencil5_const(_as_stencil5(m), **kw),
    "stencil5-const-xla": lambda m, **kw: _init_stencil5_const_xla(_as_stencil5(m), **kw),
    "stencil5-bf16c": lambda m, **kw: _init_stencil5(
        _as_stencil5(m), coeff_dtype=jnp.bfloat16, **kw),
    # reference-compatible aliases (src/spmv/spmv.cu:12-15)
    "cusparse-csr": lambda m, **kw: _init_gather_ell(m, **kw),
    "stencil5-csr": lambda m, **kw: _init_stencil5(_as_stencil5(m), **kw),
}


def available_modes():
    return sorted(_REGISTRY)


def get_operator(mode: str, mat, dtype=None) -> DeviceOperator:
    """Build a device operator (reference get_operator + op->init in one step)."""
    if mode not in _REGISTRY:
        raise ValueError(f"unknown SpMV mode '{mode}'; available: {available_modes()}")
    return _REGISTRY[mode](mat, dtype=dtype)
