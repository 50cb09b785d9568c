"""Pallas STENCIL5 SpMV — the framework's showcase kernel.

Role parity: the reference's ``stencil5_csr_direct_kernel`` (src/spmv/spmv_stencil_csr_direct.cu:
76-123) computes CSR offsets and column indices *arithmetically* from grid coordinates so that no
``col_idx`` array is ever read — 48 B/row instead of CSR's 88 B/row.  The TPU-native formulation
goes further: the vector x is a (g, g) field, the matrix is five (g, g) coefficient planes
[N, W, C, E, S], and SpMV is five shifted FMAs.  The reference's per-thread
``if interior / else boundary`` divergence (its correctness trap) disappears entirely: boundary
coefficients are zeros in the planes, so one uniform vector code path is correct everywhere.

Blocking: 1-D grid over row-slabs of ``block_rows`` grid rows.  Per step the kernel fetches
  - the (5, block_rows, g) plane slab,
  - the matching (block_rows, g) slab of x,
  - two single (1, g) rows of x — the north neighbor of the slab's first row and the south
    neighbor of its last row — via clamped index maps (no padded copy of x is ever made),
  - two (1, g) halo rows (used only by the sharded solver; zeros on a single chip).
W/E neighbors are intra-row lane shifts inside the slab.

The fused variant also accumulates the dot product <x, A·x-block> across the sequential TPU grid
into a (1, 1) scalar output — this is what lets the CG loop run SpMV + <p, Ap> in one HBM pass
(the reference needs a separate cublasDdot pass, cg_solver_mgpu_partitioned.cu:567-583).

f64 note: Mosaic/TPU cannot compile f64 kernels (verified on hardware); f64 parity runs use the
XLA reference path (`spmv_stencil5_xla`) or interpret mode on CPU.  This mirrors the survey's
plan (SURVEY.md §7 "hard parts": f64 on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import C, E, N, S, W
from ._compat import x64_off_for_32bit


def _auto_interpret(interpret: bool) -> bool:
    # Pallas TPU kernels only run compiled on TPU; the CPU backend uses interpret mode.
    return interpret or jax.default_backend() == "cpu"


def _pick_block_rows(g: int, vmem_budget_bytes: int = 5_500_000, itemsize: int = 4) -> int:
    """Choose a row-slab height: ~5 plane rows + 1 x row + 1 y row per grid row in VMEM,
    double-buffered by the pipeline; keep one buffer set under the budget, multiple of 8.

    The 5.5 MB budget is measured, not guessed: one buffer set × 2 (pipeline) + the two 8-row
    neighbor windows must fit the 16 MB VMEM scoped limit — bg=24 at g=10240 overflows by
    ~0.3 MB, bg=16 fits and runs ~13% faster than bg=8 on v5e."""
    per_row = 7 * g * itemsize
    bg = max(8, min(256, vmem_budget_bytes // max(per_row, 1)))
    return int(bg - (bg % 8)) or 8


def _pick_block_rows_const(g: int) -> int:
    """Slab height for the VALUES-FREE kernel: no planes stream, so the budget is set by
    the x/y slabs + pipeline double-buffering + the neighbor windows alone.  Measured
    boundary on v5e (slope protocol, f32): bg·g = 491K elements compiles everywhere
    tested (48×10240, 32×15360, 24×20480), 655K hits the 16 MB scoped-VMEM wall
    (64×10240, 32×20480).  The larger slabs are 10-22% faster than the 7-word chooser's
    picks — the const kernel was paying the values kernel's plane budget for planes it
    doesn't have."""
    bg = max(8, min(256, 500_000 // max(g, 1)))
    return int(bg - (bg % 8)) or 8


def _stencil5_kernel(planes_ref, xm_ref, xtop_ref, xbot_ref, hprev_ref, hnext_ref,
                     y_ref, *maybe_dot_ref, with_dot: bool, nrows_total: int = 0,
                     block_rows: int = 0, row_in_win: int = 0):
    dot_ref = maybe_dot_ref[0] if maybe_dot_ref else None
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    xm = xm_ref[:]
    bg = xm.shape[0]

    # Zero the padded tail of a non-divisible final block: its rows are never written back,
    # but their garbage (NaN in interpret mode) must not leak into neighbor shifts or the dot.
    lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + i * block_rows
    # jnp.where, not multiply: 0·NaN = NaN would leak interpret-mode pad garbage.
    xm = jnp.where(lrow < nrows_total, xm, jnp.zeros_like(xm))

    # North neighbors: row r of the slab needs x row (r0 + r - 1).
    # First slab row comes from xtop (clamped window fetch) or, on the sharded path, the halo.
    top_row = jnp.where(i == 0, hprev_ref[:], xtop_ref[row_in_win : row_in_win + 1, :])
    xn = jnp.concatenate([top_row, xm[:-1, :]], axis=0)
    # South neighbors: last slab row needs x row (r0 + bg), from xbot or the next-shard halo.
    bot_row = jnp.where(i == ni - 1, hnext_ref[:], xbot_ref[0:1, :])
    xs = jnp.concatenate([xm[1:, :], bot_row], axis=0)
    # When the final block is padded (nrows % bg != 0), the band's last valid row sits mid-
    # block: pin its south neighbor to the halo row there, not at the padded block end.
    xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
    # West/East: intra-row lane shifts; the duplicated edge column is masked by the zero
    # boundary coefficient in the W/E planes.
    xw = jnp.concatenate([xm[:, :1], xm[:, :-1]], axis=1)
    xe = jnp.concatenate([xm[:, 1:], xm[:, -1:]], axis=1)

    y = (
        planes_ref[C] * xm
        + planes_ref[W] * xw
        + planes_ref[E] * xe
        + planes_ref[N] * xn
        + planes_ref[S] * xs
    )
    y_ref[:] = y

    if with_dot:
        # Mask rows past the true grid edge (padded final block) out of the reduction.
        # jnp.where (not multiply-by-mask) so NaN garbage in padded plane rows cannot leak.
        part = jnp.sum(jnp.where(lrow < nrows_total, xm * y, jnp.zeros_like(y)))

        @pl.when(i == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

        dot_ref[0, 0] += part.astype(dot_ref.dtype)


# Mosaic requires block sublane dims divisible by 8 (or equal to the array dim), so the
# single neighbor rows are fetched as 8-row windows; the kernel slices out the row it needs.
_ROWWIN = 8


def _build_specs(nrows: int, ncols: int, bg: int):
    nblocks = pl.cdiv(nrows, bg)
    planes_spec = pl.BlockSpec((5, bg, ncols), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    xm_spec = pl.BlockSpec((bg, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if nrows < _ROWWIN or bg % _ROWWIN or bg == nrows:
        # Tiny grid or single block: the window fetches are unused (halos cover both ends)
        # or the grid is a single block; point them at block 0 with the xm blocking.
        xtop_spec = pl.BlockSpec((bg, ncols), lambda i: (0, 0), memory_space=pltpu.VMEM)
        xbot_spec = xtop_spec
        row_in_win = 0
    else:
        nwin = pl.cdiv(nrows, _ROWWIN)
        # Window containing row (i*bg - 1): its last row.  Clamped for i == 0 (unused: the
        # kernel selects the halo row there instead).
        xtop_spec = pl.BlockSpec(
            (_ROWWIN, ncols),
            lambda i: (jnp.maximum(i * (bg // _ROWWIN) - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        # Window starting at row (i+1)*bg: its first row.  Clamped for the last block (unused).
        xbot_spec = pl.BlockSpec(
            (_ROWWIN, ncols),
            lambda i: (jnp.minimum((i + 1) * (bg // _ROWWIN), nwin - 1), 0),
            memory_space=pltpu.VMEM,
        )
        row_in_win = _ROWWIN - 1
    halo_spec = pl.BlockSpec((1, ncols), lambda i: (0, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((bg, ncols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return nblocks, row_in_win, planes_spec, xm_spec, xtop_spec, xbot_spec, halo_spec, y_spec


@functools.partial(
    jax.jit, static_argnames=("block_rows", "with_dot", "interpret")
)
def spmv_stencil5_pallas(planes, x, halo_prev=None, halo_next=None, *, block_rows: int = 0,
                         with_dot: bool = False, interpret: bool = False):
    """y = A·x for a 5-point stencil operand.

    Args:
      planes: (5, rows, g) coefficient planes [N, W, C, E, S].  ``rows == g`` on a single chip;
        on the sharded path ``rows`` is the local row-band height.
      x: (rows, g) field.
      halo_prev/halo_next: (1, g) neighbor-shard boundary rows (sharded path), else None.
      with_dot: additionally return <x, A·x> accumulated on device (fused CG dot).
    Returns y (rows, g), or (y, dot) when with_dot.
    """
    interpret = _auto_interpret(interpret)
    rows, g = x.shape
    assert planes.shape == (5, rows, g), (planes.shape, x.shape)
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), x.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), x.dtype)
    bg = block_rows or _pick_block_rows(g, itemsize=x.dtype.itemsize)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    if bg % _ROWWIN and bg != rows:
        # multi-block with a non-×8 slab would hit _build_specs' single-block branch whose
        # neighbor windows always point at block 0 — silently wrong results.  Round down.
        bg = max(_ROWWIN, bg - bg % _ROWWIN)
    (nblocks, row_in_win, planes_spec, xm_spec, xtop_spec, xbot_spec, halo_spec,
     y_spec) = _build_specs(rows, g, bg)

    kernel = functools.partial(
        _stencil5_kernel, with_dot=with_dot, nrows_total=rows, block_rows=bg,
        row_in_win=row_in_win,
    )
    out_shape = [jax.ShapeDtypeStruct((rows, g), x.dtype)]
    out_specs = [y_spec]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct(
            (1, 1), jnp.float32 if x.dtype != jnp.float64 else x.dtype))
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))

    flops = 9 * rows * g  # 5 mul + 4 add per point
    bytes_accessed = (5 + 1 + 1) * rows * g * x.dtype.itemsize
    with x64_off_for_32bit(planes, x):
        result = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[planes_spec, xm_spec, xtop_spec, xbot_spec, halo_spec, halo_spec],
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(planes, x, x, x, halo_prev, halo_next)
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result


def _stencil5_const_kernel(xm_ref, xtop_ref, xbot_ref, hprev_ref, hnext_ref, y_ref,
                           *maybe_dot_ref,
                           diag: float, offdiag: float, local_rows: int,
                           block_rows: int, gcols: int,
                           with_dot: bool, row_in_win: int = 0):
    """Constant-coefficient fast path: no planes in memory at all (16 B/row in f64 terms —
    the extension flagged in SURVEY.md §6).  Boundary masking via iota row/col indices."""
    dot_ref = maybe_dot_ref[0] if maybe_dot_ref else None
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    xm = xm_ref[:]
    bg = xm.shape[0]
    dtype = xm.dtype

    # Zero the padded tail of a non-divisible final block (see _stencil5_kernel).
    lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + i * block_rows
    xm = jnp.where(lrow < local_rows, xm, jnp.zeros_like(xm))

    top_row = jnp.where(i == 0, hprev_ref[:], xtop_ref[row_in_win : row_in_win + 1, :])
    bot_row = jnp.where(i == ni - 1, hnext_ref[:], xbot_ref[0:1, :])
    xn = jnp.concatenate([top_row, xm[:-1, :]], axis=0)
    xs = jnp.concatenate([xm[1:, :], bot_row], axis=0)
    # Padded final block: the last valid row's south neighbor is the halo row (see
    # _stencil5_kernel).
    xs = jnp.where(lrow == local_rows - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
    xw = jnp.concatenate([xm[:, :1], xm[:, :-1]], axis=1)
    xe = jnp.concatenate([xm[:, 1:], xm[:, -1:]], axis=1)

    # No N/S masks needed: the true top/bottom grid boundaries always arrive as zero halo
    # rows (ppermute zero-fills edge shards; the single-chip caller passes zeros), so the
    # Dirichlet boundary is data, not control flow.  This also makes the kernel agnostic to
    # its global row offset (unlike the reference's mgpu kernel which threads row_offset,
    # spmv_stencil_csr_direct.cu:144-189).  W/E boundaries are lane masks.
    gcol = jax.lax.broadcasted_iota(jnp.int32, (bg, gcols), 1)
    mask_w = (gcol > 0).astype(dtype)
    mask_e = (gcol < gcols - 1).astype(dtype)

    y = diag * xm + offdiag * (xn + xs + mask_w * xw + mask_e * xe)
    y_ref[:] = y

    if with_dot:
        part = jnp.sum(jnp.where(lrow < local_rows, xm * y, jnp.zeros_like(y)))

        @pl.when(i == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

        dot_ref[0, 0] += part.astype(dot_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("diag", "offdiag", "block_rows", "with_dot", "interpret"),
)
def spmv_stencil5_const_pallas(x, halo_prev=None, halo_next=None, *, diag: float = 5.0,
                               offdiag: float = -1.0, block_rows: int = 0,
                               with_dot: bool = False, interpret: bool = False):
    """Values-free constant-coefficient stencil SpMV: y = diag·x + offdiag·Σ neighbors.

    Row-offset agnostic: the global top/bottom grid boundaries always arrive as zero halo
    rows, so no row_offset/total-rows parameters exist (boundary is data, not control flow)."""
    interpret = _auto_interpret(interpret)
    rows, g = x.shape
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), x.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), x.dtype)
    bg = block_rows or _pick_block_rows_const(g)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    if bg % _ROWWIN and bg != rows:
        bg = max(_ROWWIN, bg - bg % _ROWWIN)  # see spmv_stencil5_pallas: window-spec trap
    (nblocks, row_in_win, _, xm_spec, xtop_spec, xbot_spec, halo_spec,
     y_spec) = _build_specs(rows, g, bg)
    kernel = functools.partial(
        _stencil5_const_kernel,
        diag=diag, offdiag=offdiag, local_rows=rows, block_rows=bg,
        gcols=g, with_dot=with_dot, row_in_win=row_in_win,
    )
    out_shape = [jax.ShapeDtypeStruct((rows, g), x.dtype)]
    out_specs = [y_spec]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct(
            (1, 1), jnp.float32 if x.dtype != jnp.float64 else x.dtype))
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
    with x64_off_for_32bit(x):
        result = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[xm_spec, xtop_spec, xbot_spec, halo_spec, halo_spec],
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=9 * rows * g,
            bytes_accessed=2 * rows * g * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, halo_prev, halo_next)
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result


@functools.partial(jax.jit, static_argnames=())
def spmv_stencil5_xla(planes, x, halo_prev=None, halo_next=None):
    """Pure-XLA reference formulation (shifted pads).  Serves as (a) the correctness oracle for
    the Pallas kernel, (b) the f64 path on TPU (Mosaic has no f64), and (c) a fusion baseline
    to measure the Pallas kernel against."""
    rows, g = x.shape
    top = halo_prev if halo_prev is not None else jnp.zeros((1, g), x.dtype)
    bot = halo_next if halo_next is not None else jnp.zeros((1, g), x.dtype)
    xn = jnp.concatenate([top, x[:-1, :]], axis=0)
    xs = jnp.concatenate([x[1:, :], bot], axis=0)
    zcol = jnp.zeros((rows, 1), x.dtype)
    xw = jnp.concatenate([zcol, x[:, :-1]], axis=1)
    xe = jnp.concatenate([x[:, 1:], zcol], axis=1)
    return (
        planes[C] * x + planes[W] * xw + planes[E] * xe + planes[N] * xn + planes[S] * xs
    )


def spmv_stencil5_const_xla(x, diag, offdiag, halo_prev=None, halo_next=None):
    """Values-free constant-coefficient XLA stencil: the f64-AT-SCALE path on TPU.

    The f64 planes of ``spmv_stencil5_xla`` cost 5·n·8 B (4.2 GB at 10240²) and XLA's
    f64 emulation roughly doubles live temps — measured 19.6 GB at 10240², over this
    chip's 15.75 GB HBM.  The constant-coefficient operator carries no plane array at
    all, so the full-f64 solve fits.  Boundary handling is the zero pads themselves:
    the shifted concats insert zero at every grid edge, which IS the Dirichlet matrix."""
    rows, g = x.shape
    top = halo_prev if halo_prev is not None else jnp.zeros((1, g), x.dtype)
    bot = halo_next if halo_next is not None else jnp.zeros((1, g), x.dtype)
    xn = jnp.concatenate([top, x[:-1, :]], axis=0)
    xs = jnp.concatenate([x[1:, :], bot], axis=0)
    zcol = jnp.zeros((rows, 1), x.dtype)
    xw = jnp.concatenate([zcol, x[:, :-1]], axis=1)
    xe = jnp.concatenate([x[:, 1:], zcol], axis=1)
    return diag * x + offdiag * (xw + xe + xn + xs)


# ---------------------------------------------------------------------------
# Pipelined variant: delay-by-one software pipeline.
#
# The simple kernel fetches two 8-row neighbor windows per slab (16/bg extra x words per
# point).  This variant instead computes slab j = i-1 at grid step i: the slab's own rows were
# fetched at step i-1 and carried in VMEM scratch, its north neighbor row is the slab-(i-2)
# last row (also carried), and its south neighbor row is the first row of the slab being
# fetched right now.  x is then read exactly once — 7 words/point total, the same byte model
# as the reference's 48 B/row (PROFILING_ANALYSIS.md "Arithmetic Intensity").
# ---------------------------------------------------------------------------


def _stencil5_pipe_kernel(planes_ref, xm_ref, hprev_ref, hnext_ref, y_ref, *maybe_dot,
                          with_dot: bool, nrows_total: int, block_rows: int):
    # refs after y_ref: ([dot_ref,] prev_xm_ref, prev_last_ref) — scratch always trails outputs
    if with_dot:
        dot_ref, prev_xm_ref, prev_last_ref = maybe_dot
    else:
        dot_ref = None
        prev_xm_ref, prev_last_ref = maybe_dot
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1  # number of real slabs
    bg = block_rows

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        xm = prev_xm_ref[:]
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        xm = jnp.where(lrow < nrows_total, xm, jnp.zeros_like(xm))

        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        xn = jnp.concatenate([top_row, xm[:-1, :]], axis=0)
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], xm_ref[0:1, :])
        xs = jnp.concatenate([xm[1:, :], bot_row], axis=0)
        xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
        xw = jnp.concatenate([xm[:, :1], xm[:, :-1]], axis=1)
        xe = jnp.concatenate([xm[:, 1:], xm[:, -1:]], axis=1)

        y = (
            planes_ref[C] * xm
            + planes_ref[W] * xw
            + planes_ref[E] * xe
            + planes_ref[N] * xn
            + planes_ref[S] * xs
        )
        y_ref[:] = y

        if with_dot:
            part = jnp.sum(jnp.where(lrow < nrows_total, xm * y, jnp.zeros_like(y)))

            @pl.when(j == 0)
            def _():
                dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

            dot_ref[0, 0] += part.astype(dot_ref.dtype)

    # Carry state for the next step: slab (i-1)'s last row becomes the "two-back" row, and the
    # just-fetched slab i becomes "one-back".  Skipped on the flush-only final step.
    @pl.when(i < ni)
    def _carry():
        @pl.when(i >= 1)
        def _():
            prev_last_ref[:] = prev_xm_ref[bg - 1 : bg, :]

        prev_xm_ref[:] = xm_ref[:]


@functools.partial(
    jax.jit, static_argnames=("block_rows", "with_dot", "interpret")
)
def spmv_stencil5_pipelined(planes, x, halo_prev=None, halo_next=None, *,
                            block_rows: int = 0, with_dot: bool = False,
                            interpret: bool = False):
    """Pipelined STENCIL5 SpMV: exact 7-words/point HBM traffic (see module comment above).
    Semantics identical to ``spmv_stencil5_pallas``."""
    interpret = _auto_interpret(interpret)
    rows, g = x.shape
    assert planes.shape == (5, rows, g)
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), x.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), x.dtype)
    bg = block_rows or _pick_block_rows(g, itemsize=x.dtype.itemsize)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        # single slab: nothing to pipeline
        return spmv_stencil5_pallas(
            planes, x, halo_prev, halo_next, block_rows=bg, with_dot=with_dot,
            interpret=interpret,
        )
    nsteps = ni + 1

    planes_spec = pl.BlockSpec(
        (5, bg, g), lambda i: (0, jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    xm_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_pipe_kernel, with_dot=with_dot, nrows_total=rows, block_rows=bg
    )
    out_shape = [jax.ShapeDtypeStruct((rows, g), x.dtype)]
    out_specs = [y_spec]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct(
            (1, 1), jnp.float32 if x.dtype != jnp.float64 else x.dtype))
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
    with x64_off_for_32bit(planes, x):
        result = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[planes_spec, xm_spec, halo_spec, halo_spec],
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((bg, g), x.dtype),  # prev_xm
            pltpu.VMEM((1, g), x.dtype),  # prev_last (slab i-2's last row)
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * rows * g,
            bytes_accessed=7 * rows * g * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, x, halo_prev, halo_next)
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result


# ---------------------------------------------------------------------------
# Fused p-update + SpMV: computes p' = r + β·p IN the same pass that computes A·p' and
# <p', A·p'>.  Saves re-reading p' from HBM (one full read+write of the field per CG
# iteration vs the separate p_update kernel): per-iteration traffic drops from
# planes + [r,p read, p' write] + [p' read, Ap write] to planes + [r,p read, p' write,
# Ap write].  The first CG iteration (no β yet) is the degenerate β=0, p=0 case: p' = r.
# ---------------------------------------------------------------------------


def _stencil5_pupd_pipe_kernel(beta_ref, planes_ref, rm_ref, pm_ref, hprev_ref, hnext_ref,
                               pnew_ref, y_ref, dot_ref, prev_r_ref, prev_p_ref,
                               prev_last_ref, *, nrows_total: int, block_rows: int):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1
    bg = block_rows
    beta = beta_ref[0, 0]

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        rm = prev_r_ref[:]
        pm = prev_p_ref[:]
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        pnew = rm + beta * pm
        pnew = jnp.where(lrow < nrows_total, pnew, jnp.zeros_like(pnew))

        # north neighbor: slab j-1's last p' row (carried); halo row at the band edge
        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        # south neighbor: slab j+1's first p' row, computed from the just-fetched slabs
        bot_next = rm_ref[0:1, :] + beta * pm_ref[0:1, :]
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], bot_next)
        xn = jnp.concatenate([top_row, pnew[:-1, :]], axis=0)
        xs = jnp.concatenate([pnew[1:, :], bot_row], axis=0)
        xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
        xw = jnp.concatenate([pnew[:, :1], pnew[:, :-1]], axis=1)
        xe = jnp.concatenate([pnew[:, 1:], pnew[:, -1:]], axis=1)

        y = (
            planes_ref[C] * pnew
            + planes_ref[W] * xw
            + planes_ref[E] * xe
            + planes_ref[N] * xn
            + planes_ref[S] * xs
        )
        pnew_ref[:] = pnew
        y_ref[:] = y

        part = jnp.sum(jnp.where(lrow < nrows_total, pnew * y, jnp.zeros_like(y)))

        @pl.when(j == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

        dot_ref[0, 0] += part.astype(dot_ref.dtype)

        # carry THIS slab's last p' row for slab j+1's north neighbor
        prev_last_ref[:] = pnew[bg - 1 : bg, :]

    @pl.when(i < ni)
    def _carry():
        prev_r_ref[:] = rm_ref[:]
        prev_p_ref[:] = pm_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def spmv_stencil5_pupdate_pipelined(planes, beta, r, p, halo_prev=None, halo_next=None, *,
                                    block_rows: int = 0, interpret: bool = False):
    """(p', A·p', <p', A·p'>) where p' = r + β·p — the fused CG top-of-iteration pass.

    β = 0 with p = 0 gives the first iteration (p' = r).  Halo rows are the NEIGHBOR's p'
    boundary rows (or zeros at the grid edge); the single-chip caller passes None."""
    interpret = _auto_interpret(interpret)
    rows, g = r.shape
    assert planes.shape == (5, rows, g)
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), r.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), r.dtype)
    bg = block_rows or _pick_block_rows(g, itemsize=r.dtype.itemsize)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        # single slab: no pipeline to build; fall back to the separate passes
        pnew = r + jnp.asarray(beta, r.dtype) * p
        y, pap = spmv_stencil5_pallas(planes, pnew, halo_prev, halo_next, with_dot=True,
                                      interpret=interpret)
        return pnew, y, pap
    nsteps = ni + 1
    b2 = jnp.asarray(beta, r.dtype).reshape(1, 1)

    planes_spec = pl.BlockSpec(
        (5, bg, g), lambda i: (0, jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    field_in_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_pupd_pipe_kernel, nrows_total=rows, block_rows=bg
    )
    acc = jnp.float32 if r.dtype != jnp.float64 else jnp.float64
    with x64_off_for_32bit(planes, r, p):
        pnew, y, dot = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                planes_spec, field_in_spec, field_in_spec, halo_spec, halo_spec,
            ],
            out_specs=[out_spec, out_spec,
                       pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((1, 1), acc),
            ],
            scratch_shapes=[
                pltpu.VMEM((bg, g), r.dtype),  # prev_r
                pltpu.VMEM((bg, g), r.dtype),  # prev_p
                pltpu.VMEM((1, g), r.dtype),  # previous slab's last p' row
            ],
            cost_estimate=pl.CostEstimate(
                flops=11 * rows * g,
                bytes_accessed=(planes.dtype.itemsize * 5 + 4 * r.dtype.itemsize)
                * rows * g,
                transcendentals=0,
            ),
            interpret=interpret,
        )(b2, planes, r, p, halo_prev, halo_next)
    return pnew, y, dot[0, 0]

# ---------------------------------------------------------------------------
# Values-free pipelined variants.
#
# The simple const kernel (`spmv_stencil5_const_pallas`) fetches two 8-row neighbor
# windows per slab: 2 + 16/bg words/point.  At the headline sizes the overfetch is the
# dominant inefficiency of the whole solve — bg=24 at 20480² pays 2.67 words/pt where the
# true byte floor is 2 (x read + y write; the reference's "values-free" analog would be
# 16 B/row in f64 terms, SURVEY.md §6).  The delay-by-one pipeline below reaches the exact
# floor with the same carry discipline as `_stencil5_pipe_kernel`.
# ---------------------------------------------------------------------------


def _pick_block_rows_const_pipe(g: int) -> int:
    """Slab height for the pipelined values-free kernel.  The scoped-VMEM wall is MEASURED,
    not derived: Mosaic's stack accounting charges ≈6.8 slab-equivalents per step (2× double-
    buffered x-in + 2× y-out + carried scratch + compute temps), and on v5e bg·g = 589,824
    elements (144×4096) compiles at 16.00 MB while 593,920 (232×2560) overflows by 58 KB.
    492K elements/slab keeps the proven headline picks (24×20480, 48×10240 — the 418 ms
    20480² solve) while staying ~17% under the wall at every g."""
    bg = max(8, min(256, 492_000 // max(g, 1)))
    return int(bg - (bg % 8)) or 8


def _stencil5_const_pipe_kernel(xm_ref, hprev_ref, hnext_ref, y_ref, *maybe_dot,
                                diag: float, offdiag: float, nrows_total: int,
                                block_rows: int, gcols: int, with_dot: bool):
    # scratch refs trail outputs: ([dot_ref,] prev_xm_ref, prev_last_ref)
    if with_dot:
        dot_ref, prev_xm_ref, prev_last_ref = maybe_dot
    else:
        dot_ref = None
        prev_xm_ref, prev_last_ref = maybe_dot
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1
    bg = block_rows

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        xm = prev_xm_ref[:]
        dtype = xm.dtype
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        xm = jnp.where(lrow < nrows_total, xm, jnp.zeros_like(xm))

        # north: slab j-1's last row (carried); halo row at the band edge
        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        # south: slab j+1's first row — the slab being fetched right now
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], xm_ref[0:1, :])
        xn = jnp.concatenate([top_row, xm[:-1, :]], axis=0)
        xs = jnp.concatenate([xm[1:, :], bot_row], axis=0)
        xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
        xw = jnp.concatenate([xm[:, :1], xm[:, :-1]], axis=1)
        xe = jnp.concatenate([xm[:, 1:], xm[:, -1:]], axis=1)

        # W/E grid edges are lane masks; N/S edges arrive as zero halo rows (boundary is
        # data — see _stencil5_const_kernel)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (bg, gcols), 1)
        mask_w = (gcol > 0).astype(dtype)
        mask_e = (gcol < gcols - 1).astype(dtype)

        y = diag * xm + offdiag * (xn + xs + mask_w * xw + mask_e * xe)
        y_ref[:] = y

        if with_dot:
            part = jnp.sum(jnp.where(lrow < nrows_total, xm * y, jnp.zeros_like(y)))

            @pl.when(j == 0)
            def _():
                dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

            dot_ref[0, 0] += part.astype(dot_ref.dtype)

    @pl.when(i < ni)
    def _carry():
        @pl.when(i >= 1)
        def _():
            prev_last_ref[:] = prev_xm_ref[bg - 1 : bg, :]

        prev_xm_ref[:] = xm_ref[:]


@functools.partial(
    jax.jit, static_argnames=("diag", "offdiag", "block_rows", "with_dot", "interpret")
)
def spmv_stencil5_const_pipelined(x, halo_prev=None, halo_next=None, *, diag: float = 5.0,
                                  offdiag: float = -1.0, block_rows: int = 0,
                                  with_dot: bool = False, interpret: bool = False):
    """Pipelined values-free stencil SpMV: exact 2-words/point HBM traffic (x read +
    y write, zero operand bytes).  Semantics identical to ``spmv_stencil5_const_pallas``."""
    interpret = _auto_interpret(interpret)
    rows, g = x.shape
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), x.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), x.dtype)
    bg = block_rows or _pick_block_rows_const_pipe(g)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        # single slab: nothing to pipeline
        return spmv_stencil5_const_pallas(
            x, halo_prev, halo_next, diag=diag, offdiag=offdiag, block_rows=bg,
            with_dot=with_dot, interpret=interpret,
        )
    nsteps = ni + 1

    xm_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_const_pipe_kernel, diag=diag, offdiag=offdiag, nrows_total=rows,
        block_rows=bg, gcols=g, with_dot=with_dot,
    )
    out_shape = [jax.ShapeDtypeStruct((rows, g), x.dtype)]
    out_specs = [y_spec]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct(
            (1, 1), jnp.float32 if x.dtype != jnp.float64 else x.dtype))
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
    with x64_off_for_32bit(x):
        result = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[xm_spec, halo_spec, halo_spec],
            out_specs=out_specs if with_dot else out_specs[0],
            out_shape=out_shape if with_dot else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((bg, g), x.dtype),  # prev_xm
                pltpu.VMEM((1, g), x.dtype),  # slab i-2's last row
            ],
            cost_estimate=pl.CostEstimate(
                flops=9 * rows * g,
                bytes_accessed=2 * rows * g * x.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x, halo_prev, halo_next)
    if with_dot:
        y, dot = result
        return y, dot[0, 0]
    return result


# ---------------------------------------------------------------------------
# Recompute-Ap CG passes (round 5): the 8-words/pt iteration.
#
# The default const CG iteration moves 11 words/pt (spmv+dot 2, fused x/r update 6,
# p-update 3).  Ap is itself one word to write and one to read back — but for the
# values-free stencil Ap is CHEAP TO RECOMPUTE: any pass already streaming p can form
# A·p from the slab + its two boundary rows for free (VPU work against an HBM-bound
# budget).  So the iteration restructures into exactly two passes and Ap never touches
# HBM:
#
#   pass A  (p', <p',Ap'>) = pupdate_dot(β, r, p)   — reads r, p; writes p'       (3 words)
#   pass B  (x', r', <r',r'>) = update_recompute(α, x, r, p')
#           with A·p' recomputed from the p' stream — reads x, r, p'; writes x', r' (5 words)
#
# 8 words/pt/iter.  Ap' is computed twice (once per pass, bit-identically: same slab
# shapes, same FMA order); the algorithm's algebra is unchanged — this is the classic
# recompute-vs-materialize trade taken in the direction a bandwidth-bound chip wants.
# Round-3's fused pupdate pass (4 words REPLACING 5 but with a 2R+2W mix) measured
# slower than its byte model; these passes keep read-heavier mixes (2R:1W and 3R:2W)
# and are judged by measurement, not the model (see docs/PERFORMANCE.md round-5 audit).
# ---------------------------------------------------------------------------


def _stencil5_const_pupd_dot_pipe_kernel(beta_ref, rm_ref, pm_ref, hprev_ref, hnext_ref,
                                         pnew_ref, dot_ref, prev_r_ref, prev_p_ref,
                                         prev_last_ref, *, diag: float, offdiag: float,
                                         nrows_total: int, block_rows: int, gcols: int):
    """Pass A: p' = r + β·p and <p', A·p'> — A·p' formed in registers, never stored."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1
    bg = block_rows
    beta = beta_ref[0, 0]

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        rm = prev_r_ref[:]
        pm = prev_p_ref[:]
        dtype = rm.dtype
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        pnew = rm + beta * pm
        pnew = jnp.where(lrow < nrows_total, pnew, jnp.zeros_like(pnew))

        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        bot_next = rm_ref[0:1, :] + beta * pm_ref[0:1, :]
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], bot_next)
        xn = jnp.concatenate([top_row, pnew[:-1, :]], axis=0)
        xs = jnp.concatenate([pnew[1:, :], bot_row], axis=0)
        xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
        xw = jnp.concatenate([pnew[:, :1], pnew[:, :-1]], axis=1)
        xe = jnp.concatenate([pnew[:, 1:], pnew[:, -1:]], axis=1)

        gcol = jax.lax.broadcasted_iota(jnp.int32, (bg, gcols), 1)
        mask_w = (gcol > 0).astype(dtype)
        mask_e = (gcol < gcols - 1).astype(dtype)

        y = diag * pnew + offdiag * (xn + xs + mask_w * xw + mask_e * xe)
        pnew_ref[:] = pnew

        part = jnp.sum(jnp.where(lrow < nrows_total, pnew * y, jnp.zeros_like(y)))

        @pl.when(j == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

        dot_ref[0, 0] += part.astype(dot_ref.dtype)

        # carry THIS slab's last p' row for slab j+1's north neighbor
        prev_last_ref[:] = pnew[bg - 1 : bg, :]

    @pl.when(i < ni)
    def _carry():
        prev_r_ref[:] = rm_ref[:]
        prev_p_ref[:] = pm_ref[:]


@functools.partial(
    jax.jit, static_argnames=("diag", "offdiag", "block_rows", "interpret")
)
def spmv_stencil5_const_pupdate_dot_pipelined(beta, r, p, halo_prev=None, halo_next=None,
                                              *, diag: float = 5.0, offdiag: float = -1.0,
                                              block_rows: int = 0,
                                              interpret: bool = False):
    """(p', <p', A·p'>) where p' = r + β·p — pass A of the 8-words/pt recompute CG
    iteration (3 words/pt: r, p read; p' write; A·p' lives only in registers).
    β = 0 with p = 0 gives the first iteration (p' = r)."""
    interpret = _auto_interpret(interpret)
    rows, g = r.shape
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), r.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), r.dtype)
    # pass A streams 2 in + 1 out (double-buffered) + 2 carried scratch slabs — the
    # same VMEM class as the materializing pupd kernel, whose 320K chooser is the
    # measured compile boundary under the default 16 MB scoped limit.  An explicit
    # CompilerParams(vmem_limit_bytes=...) is NOT usable here: this deployment's
    # remote-compile path hangs on it (measured round 5: >20 min vs 0.9 s without).
    bg = block_rows or _pick_block_rows_const_pupd(g)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        pnew = r + jnp.asarray(beta, r.dtype) * p
        y, pap = spmv_stencil5_const_pallas(pnew, halo_prev, halo_next, diag=diag,
                                            offdiag=offdiag, with_dot=True,
                                            interpret=interpret)
        return pnew, pap
    nsteps = ni + 1
    b2 = jnp.asarray(beta, r.dtype).reshape(1, 1)

    field_in_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_const_pupd_dot_pipe_kernel, diag=diag, offdiag=offdiag,
        nrows_total=rows, block_rows=bg, gcols=g,
    )
    acc = jnp.float32 if r.dtype != jnp.float64 else jnp.float64
    with x64_off_for_32bit(r, p):
        pnew, dot = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                field_in_spec, field_in_spec, halo_spec, halo_spec,
            ],
            out_specs=[out_spec,
                       pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((1, 1), acc),
            ],
            scratch_shapes=[
                pltpu.VMEM((bg, g), r.dtype),  # prev_r
                pltpu.VMEM((bg, g), r.dtype),  # prev_p
                pltpu.VMEM((1, g), r.dtype),  # previous slab's last p' row
            ],
            # p' writes INTO p's buffer (input 2 → output 0): p is dead after this pass
            # in the CG iteration, and the in-place write is what lets the while-loop
            # carry alias instead of copying the Pallas output back into the carry slot
            # — measured 3.8 ms/iter of phantom copy traffic at 10240² without it
            # (audit closure 57% → the three carried fields re-copied each iteration).
            # Safe under the delay-by-one pipeline: slab j's write happens at step j+1
            # while reads have advanced to slab j+1/j+2 (≥1-slab gap throughout).
            input_output_aliases={2: 0},
            cost_estimate=pl.CostEstimate(
                flops=11 * rows * g,
                bytes_accessed=3 * rows * g * r.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(b2, r, p, halo_prev, halo_next)
    return pnew, dot[0, 0]


def _pick_block_rows_const_upd_recomp(g: int) -> int:
    """Slab height for pass B (update + recomputed A·p): 3 inputs + 2 outputs double-
    buffered + 3 carried scratch slabs ≈ 13 slab-equivalents of bg·g f32 per step —
    224K elements/slab keeps the footprint in the materializing-pupd kernel's measured
    compile envelope under the default 16 MB scoped-VMEM limit (raising the limit via
    CompilerParams hangs this deployment's remote compiler — see pass A's chooser)."""
    bg = max(8, min(256, 224_000 // max(g, 1)))
    return int(bg - (bg % 8)) or 8


def _stencil5_const_upd_recomp_pipe_kernel(alpha_ref, xm_ref, rm_ref, pm_ref, hprev_ref,
                                           hnext_ref, xout_ref, rout_ref, rr_ref,
                                           prev_x_ref, prev_r_ref, prev_p_ref,
                                           prev_last_ref, *, diag: float, offdiag: float,
                                           nrows_total: int, block_rows: int, gcols: int):
    """Pass B: x' = x + α·p, r' = r − α·(A·p), <r', r'> — A·p recomputed from the p
    stream (delay-by-one pipeline supplies p's neighbor rows), never read from HBM."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1
    bg = block_rows
    alpha = alpha_ref[0, 0]

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        xm = prev_x_ref[:]
        rm = prev_r_ref[:]
        pm = prev_p_ref[:]
        dtype = pm.dtype
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        pm = jnp.where(lrow < nrows_total, pm, jnp.zeros_like(pm))

        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], pm_ref[0:1, :])
        pn = jnp.concatenate([top_row, pm[:-1, :]], axis=0)
        ps = jnp.concatenate([pm[1:, :], bot_row], axis=0)
        ps = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, ps.shape), ps)
        pw = jnp.concatenate([pm[:, :1], pm[:, :-1]], axis=1)
        pe = jnp.concatenate([pm[:, 1:], pm[:, -1:]], axis=1)

        gcol = jax.lax.broadcasted_iota(jnp.int32, (bg, gcols), 1)
        mask_w = (gcol > 0).astype(dtype)
        mask_e = (gcol < gcols - 1).astype(dtype)

        ap = diag * pm + offdiag * (pn + ps + mask_w * pw + mask_e * pe)
        xout_ref[:] = xm + alpha * pm
        rnew = rm - alpha * ap
        rout_ref[:] = rnew

        part = jnp.sum(jnp.where(lrow < nrows_total, rnew * rnew, jnp.zeros_like(rnew)))

        @pl.when(j == 0)
        def _():
            rr_ref[0, 0] = jnp.zeros((), rr_ref.dtype)

        rr_ref[0, 0] += part.astype(rr_ref.dtype)

    # carry: slab i-1's last p row becomes the two-back north row, just-fetched slabs
    # become one-back (same discipline as _stencil5_const_pipe_kernel)
    @pl.when(i < ni)
    def _carry():
        @pl.when(i >= 1)
        def _():
            prev_last_ref[:] = prev_p_ref[bg - 1 : bg, :]

        prev_x_ref[:] = xm_ref[:]
        prev_r_ref[:] = rm_ref[:]
        prev_p_ref[:] = pm_ref[:]


@functools.partial(
    jax.jit, static_argnames=("diag", "offdiag", "block_rows", "interpret")
)
def cg_const_update_recompute_pipelined(alpha, x, r, p, halo_prev=None, halo_next=None,
                                        *, diag: float = 5.0, offdiag: float = -1.0,
                                        block_rows: int = 0, interpret: bool = False):
    """(x', r', <r', r'>) with x' = x + α·p and r' = r − α·A·p — pass B of the
    8-words/pt recompute CG iteration (5 words/pt: x, r, p read; x', r' write; A·p
    recomputed in registers from the p stream the pass is already reading).

    Halo rows are the NEIGHBOR's p boundary rows (or zeros at the grid edge)."""
    interpret = _auto_interpret(interpret)
    rows, g = r.shape
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), r.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), r.dtype)
    bg = block_rows or _pick_block_rows_const_upd_recomp(g)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        a = jnp.asarray(alpha, r.dtype)
        ap = spmv_stencil5_const_pallas(p, halo_prev, halo_next, diag=diag,
                                        offdiag=offdiag, interpret=interpret)
        xnew = x + a * p
        rnew = r - a * ap
        return xnew, rnew, jnp.vdot(rnew, rnew)
    nsteps = ni + 1
    a2 = jnp.asarray(alpha, r.dtype).reshape(1, 1)

    field_in_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_const_upd_recomp_pipe_kernel, diag=diag, offdiag=offdiag,
        nrows_total=rows, block_rows=bg, gcols=g,
    )
    acc = jnp.float32 if r.dtype != jnp.float64 else jnp.float64
    with x64_off_for_32bit(x, r, p):
        xnew, rnew, rr = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                field_in_spec, field_in_spec, field_in_spec, halo_spec, halo_spec,
            ],
            out_specs=[out_spec, out_spec,
                       pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((1, 1), acc),
            ],
            scratch_shapes=[
                pltpu.VMEM((bg, g), r.dtype),  # prev_x
                pltpu.VMEM((bg, g), r.dtype),  # prev_r
                pltpu.VMEM((bg, g), r.dtype),  # prev_p
                pltpu.VMEM((1, g), r.dtype),  # slab i-2's last p row
            ],
            # x' and r' write INTO x's and r's buffers (inputs 1, 2 → outputs 0, 1):
            # both are dead after this pass in the CG iteration — see pass A's aliasing
            # note (the while-carry copy elision this enables is the measured win).
            input_output_aliases={1: 0, 2: 1},
            cost_estimate=pl.CostEstimate(
                flops=13 * rows * g,
                bytes_accessed=5 * rows * g * r.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(a2, x, r, p, halo_prev, halo_next)
    return xnew, rnew, rr[0, 0]


def _pick_block_rows_const_pupd(g: int) -> int:
    """Slab height for the FUSED values-free pass: 2 in (r, p) + 2 out (p', A·p') double-
    buffered + 2 carried scratch slabs = 10 slabs of bg·g f32 per step; 320K elements/slab
    stays under the scoped-VMEM wall (measured on v5e: 32×10240 and 16×20480 compile)."""
    bg = max(8, min(256, 320_000 // max(g, 1)))
    return int(bg - (bg % 8)) or 8


def _stencil5_const_pupd_pipe_kernel(beta_ref, rm_ref, pm_ref, hprev_ref, hnext_ref,
                                     pnew_ref, y_ref, dot_ref, prev_r_ref, prev_p_ref,
                                     prev_last_ref, *, diag: float, offdiag: float,
                                     nrows_total: int, block_rows: int, gcols: int):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    ni = nsteps - 1
    bg = block_rows
    beta = beta_ref[0, 0]

    @pl.when(i >= 1)
    def _compute():
        j = i - 1
        rm = prev_r_ref[:]
        pm = prev_p_ref[:]
        dtype = rm.dtype
        lrow = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) + j * bg
        pnew = rm + beta * pm
        pnew = jnp.where(lrow < nrows_total, pnew, jnp.zeros_like(pnew))

        top_row = jnp.where(j == 0, hprev_ref[:], prev_last_ref[:])
        # south: slab j+1's first p' row, computed from the slabs being fetched right now
        bot_next = rm_ref[0:1, :] + beta * pm_ref[0:1, :]
        bot_row = jnp.where(j == ni - 1, hnext_ref[:], bot_next)
        xn = jnp.concatenate([top_row, pnew[:-1, :]], axis=0)
        xs = jnp.concatenate([pnew[1:, :], bot_row], axis=0)
        xs = jnp.where(lrow == nrows_total - 1, jnp.broadcast_to(bot_row, xs.shape), xs)
        xw = jnp.concatenate([pnew[:, :1], pnew[:, :-1]], axis=1)
        xe = jnp.concatenate([pnew[:, 1:], pnew[:, -1:]], axis=1)

        gcol = jax.lax.broadcasted_iota(jnp.int32, (bg, gcols), 1)
        mask_w = (gcol > 0).astype(dtype)
        mask_e = (gcol < gcols - 1).astype(dtype)

        y = diag * pnew + offdiag * (xn + xs + mask_w * xw + mask_e * xe)
        pnew_ref[:] = pnew
        y_ref[:] = y

        part = jnp.sum(jnp.where(lrow < nrows_total, pnew * y, jnp.zeros_like(y)))

        @pl.when(j == 0)
        def _():
            dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

        dot_ref[0, 0] += part.astype(dot_ref.dtype)

        # carry THIS slab's last p' row for slab j+1's north neighbor
        prev_last_ref[:] = pnew[bg - 1 : bg, :]

    @pl.when(i < ni)
    def _carry():
        prev_r_ref[:] = rm_ref[:]
        prev_p_ref[:] = pm_ref[:]


@functools.partial(
    jax.jit, static_argnames=("diag", "offdiag", "block_rows", "interpret")
)
def spmv_stencil5_const_pupdate_pipelined(beta, r, p, halo_prev=None, halo_next=None, *,
                                          diag: float = 5.0, offdiag: float = -1.0,
                                          block_rows: int = 0, interpret: bool = False):
    """(p', A·p', <p', A·p'>) where p' = r + β·p — the fused values-free CG
    top-of-iteration pass: 4 words/point (r, p read; p', A·p' write) vs 2+ (SpMV) + 3
    (separate p-update) = 5+ unfused.  β = 0 with p = 0 gives the first iteration."""
    interpret = _auto_interpret(interpret)
    rows, g = r.shape
    if halo_prev is None:
        halo_prev = jnp.zeros((1, g), r.dtype)
    if halo_next is None:
        halo_next = jnp.zeros((1, g), r.dtype)
    bg = block_rows or _pick_block_rows_const_pupd(g)
    bg = min(bg, max(8, rows - rows % 8) if rows >= 8 else rows)
    ni = pl.cdiv(rows, bg)
    if ni < 2:
        pnew = r + jnp.asarray(beta, r.dtype) * p
        y, pap = spmv_stencil5_const_pallas(pnew, halo_prev, halo_next, diag=diag,
                                            offdiag=offdiag, with_dot=True,
                                            interpret=interpret)
        return pnew, y, pap
    nsteps = ni + 1
    b2 = jnp.asarray(beta, r.dtype).reshape(1, 1)

    field_in_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.minimum(i, ni - 1), 0), memory_space=pltpu.VMEM
    )
    halo_spec = pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (bg, g), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _stencil5_const_pupd_pipe_kernel, diag=diag, offdiag=offdiag, nrows_total=rows,
        block_rows=bg, gcols=g,
    )
    acc = jnp.float32 if r.dtype != jnp.float64 else jnp.float64
    with x64_off_for_32bit(r, p):
        pnew, y, dot = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                field_in_spec, field_in_spec, halo_spec, halo_spec,
            ],
            out_specs=[out_spec, out_spec,
                       pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((rows, g), r.dtype),
                jax.ShapeDtypeStruct((1, 1), acc),
            ],
            scratch_shapes=[
                pltpu.VMEM((bg, g), r.dtype),  # prev_r
                pltpu.VMEM((bg, g), r.dtype),  # prev_p
                pltpu.VMEM((1, g), r.dtype),  # previous slab's last p' row
            ],
            cost_estimate=pl.CostEstimate(
                flops=11 * rows * g,
                bytes_accessed=4 * rows * g * r.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(b2, r, p, halo_prev, halo_next)
    return pnew, y, dot[0, 0]
