"""Pallas generic gather SpMV — the hand-written cuSPARSE-baseline-role kernel.

Role parity: the reference's generic baseline is cuSPARSE CSR SpMV
(src/spmv/spmv_cusparse_csr.cu:182-285) — arbitrary sparsity through explicit column
indices.  On TPU an arbitrary ``x[col[k]]`` gather has no fast native form: Mosaic
vectorizes gathers only along the 128-lane minor dimension (``take_along_axis`` axis=-1;
verified on v5e — sublane-direction gathers do not compile).  This kernel builds a full
generic gather out of that one primitive:

  1. PACK TIME (host, numpy): rows → ELL slots (sorted CSR keeps per-slot columns
     banded-ish for real matrices, arbitrary in general).  For every (row-block, slot,
     subtile of 1024 rows) the pack measures the column WINDOW actually touched and
     localizes indices to it.  This is the TPU analog of sliced-ELLPACK / cuSPARSE's
     adaptive binning: locality is MEASURED per matrix, never assumed.
  2. KERNEL: per row block, one async DMA per slot pulls that slot's x window
     (HBM → VMEM).  Per 1024-row subtile the local index decomposes into
     (sublane = loc >> 7, lane = loc & 127); the kernel broadcasts each of the subtile's
     ``span`` window rows across sublanes, lane-gathers with ``take_along_axis``, and
     select-accumulates where the sublane matches.  ``span`` is a pack-time constant
     (max over subtiles): 2-10 for banded matrices, larger for wilder sparsity.

Matrices whose measured spans exceed ``span_limit`` (columns scattered beyond any
windowing) raise ``GatherPackError`` — callers fall back to the XLA gather path loudly.
That failure mode is honest: SpMV with truly random column structure is gather-latency
bound on every architecture; the windowed kernel covers the sparsity classes the
reference's benchmark suite (and cuSPARSE's fast paths) actually exercise.

Design space explored (measured on v5e, g=2048-10240; kept for the next optimizer):
  - dynamic per-subtile ladder bounds (fori_loop over the measured span): 13× SLOWER —
    Mosaic's dynamic loops defeat unrolling/pipelining; the static ladder stays.
  - affine per-sublane windows (window row = q + output_sublane, so one (8, 128) block
    slice replaces broadcast+select and span drops ~9 → 2): the required dynamic
    UNALIGNED 8-row VMEM slice CRASHES the TPU worker outright (same failure class as
    misaligned DMAs; single-row dynamic slices — what this kernel uses — are safe).
    Rebuilding the block from 8 single-row slices costs back most of the win (~1.8×
    projected), not worth the baseline kernel's stability.
  - The kernel is select-ladder (VPU) bound at large g: 33.7 ms at 10240² vs ~10 ms of
    pure traffic.  That is the honest cost of gather on a lane machine — exactly the
    gap the STENCIL5 structure-exploiting formulation exists to avoid.
  - AFFINE variant (round 4): per-slot windows anchored analytically for slope-1
    matrices cut the ladder to dspan≈2 — 33.7 → 22.3 ms at 10240² (measured A/B).
  - ROT slots (round 4, on top of affine): a slot whose real entries are an EXACT
    diagonal (col = row + c) needs no gather at all — lane = (l+c)&127 is a constant
    rotation (pltpu.roll, one VPU op) and the sublane step is a static slice + one
    select at the wrap column.  The slot's per-entry index plane also drops out of HBM
    traffic.  This is the pack-time structure measurement taken to its limit: cuSPARSE's
    adaptive binning analog discovering that a "generic" matrix is secretly DIA, slot by
    slot, while arbitrary slots in the same matrix keep the ladder.
  - ROT measured (round 5, after the even-grid probe fix): 10240² 22.27 → 14.85 ms,
    15360² 30.08 ms, 20480² 60.85 ms (the row the ladder could never fit — vals-only
    operand 8.4 GB).  Cumulative over the round-3 ladder: 2.27× at 10240².  The
    remaining gap to the byte floor is the per-(block, slot) x-window DMA overfetch
    (swin·128 window elements per slot vs one x read — ~5.3× the field at 10240², all
    counted in the honest byte model), not VPU work.
  - MXU ONE-HOT formulation (the round-4 review's remaining candidate): REJECTED by
    arithmetic, not taste.  Expressing the per-(subtile, slot) window gather as a matmul
    g = M·vec(win) needs a (1024 × swin·128) selection matrix M; M IS the index
    information in dense one-hot form — ≥2 MB per (subtile, slot) in bf16 where the
    packed loc plane is 4 KB, a ≥500× INDEX-TRAFFIC inflation that must stream from HBM
    (generating M on-VPU from loc is the same compare/select work as the ladder it
    would replace).  The kernel is HBM-bound; multiplying its dominant traffic term by
    500× cannot win.  An implicit (structured) M needs the columns to follow a known
    pattern — exactly the structure the affine/rot packs already exploit with ZERO
    index traffic.  The MXU helps matmul-shaped reuse; a gather has none.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import x64_off_for_32bit

LANES = 128
SUBTILE_ROWS = 8 * LANES  # 1024 rows = one (8, 128) vector tile per subtile


def _auto_interpret(interpret: bool) -> bool:
    return interpret or jax.default_backend() == "cpu"


class GatherPackError(ValueError):
    """Raised when a matrix's measured column spans defeat windowing (see module doc)."""


@dataclasses.dataclass
class GatherEllOperand:
    """Device-resident packed operand (all jnp arrays except static ints)."""

    w0: jax.Array      # (nb*W,) int32 — per (block, slot) window start row (sublane units)
    q: jax.Array       # (nb, W, nsub) int32 — per-subtile offset within the slot window
    spans: jax.Array   # (nb, W, nsub) int32 — per-subtile sublane spans (pack-time
                       # diagnostics only; the kernel ladder is static — see _gather_kernel)
    loc: jax.Array     # (nb, W, nsub, 8, 128) int32 — window-local column indices
    vals: jax.Array    # (nb, W, nsub, 8, 128) dtype — ELL values
    # overflow: the rare entries beyond the percentile-chosen kernel span (e.g. the
    # boundary subtiles of a stencil where a slot's diagonal jumps by ~g) — handled by
    # one XLA scatter-add pass instead of taxing EVERY subtile with a worst-case ladder
    orow: jax.Array    # (n_ovf,) int32
    ocol: jax.Array    # (n_ovf,) int32
    oval: jax.Array    # (n_ovf,) dtype
    num_rows: int
    num_cols: int
    width: int         # W: ELL slots
    nb: int            # row blocks
    nsub: int          # subtiles per block
    swin: int          # slot-window rows in VMEM (static, multiple of 8)
    span: int          # kernel select-ladder passes (percentile span, static)
    x_rows: int        # required x field rows (covers every window's reach)
    # affine pack only: per-slot diagonal offsets — c where the slot is an exact diagonal
    # (col = row + c, lane gather = constant rotation), None where it needs the ladder.
    # () for ladder-pack operands.  Static: part of the kernel program, not a buffer.
    rot: tuple = ()


def pack_gather_ell(ell_col: np.ndarray, ell_val: np.ndarray, num_cols: int, dtype,
                    *, block_subtiles: int = 32, span_limit: int = 64,
                    swin_limit: int = 4096, overflow_frac: float = 0.005,
                    max_overflow_frac: float = 0.2) -> GatherEllOperand:
    """Host-side pack: ELL (n, W) col/val → windowed operand (see module doc).

    ``block_subtiles`` subtiles of 1024 rows per grid block (default 32 → 32768-row
    blocks: large enough to amortize the per-block window DMAs, small enough that the
    per-slot windows of banded matrices stay a few hundred sublanes).

    The kernel's select-ladder span is chosen as the smallest count covering
    ≥ 1 − ``overflow_frac`` of all entries (capped at ``span_limit``); the remainder —
    e.g. the boundary subtiles of a stencil where a slot's diagonal jumps by ~grid-width —
    is split out as an OVERFLOW COO list handled by one XLA scatter-add pass.  A static
    global-max ladder instead would tax every subtile at the worst subtile's span
    (measured: span 40 at g=4096 where 99.5% of subtiles need ≤ 10).  If even covering
    1 − ``max_overflow_frac`` of entries needs more than ``span_limit`` passes, the
    matrix defeats windowing and GatherPackError is raised (→ XLA gather fallback)."""
    n, width = ell_col.shape
    if width == 0 or n == 0:
        # n == 0 must be guarded alongside width == 0: the block-tail padding below
        # indexes ell_col[n - 1], which on an empty array is ell_col[-1] → IndexError
        raise GatherPackError("empty matrix (no rows or ELL width 0)")
    rb = block_subtiles * SUBTILE_ROWS
    nb = -(-n // rb)
    nsub = block_subtiles
    n_pad = nb * rb
    if num_cols >= 2 ** 31 - 1:
        raise GatherPackError("int32 column indices required (num_cols < 2^31)")

    col = np.empty((n_pad, width), np.int32)
    col[:n] = ell_col
    val = np.zeros((n_pad, width), np.float32 if dtype != jnp.float64 else np.float64)
    val[:n] = ell_val
    if n_pad > n:
        # padded rows: point at the last real row's columns with zero values — keeps the
        # tail subtiles' windows degenerate instead of exploding the span
        col[n:] = ell_col[n - 1]

    # per (block, slot, subtile): measured window anchored at the subtile's min column
    colb = col.reshape(nb, nsub, SUBTILE_ROWS, width)
    q_abs = (colb.min(axis=2) // LANES).astype(np.int32)  # (nb, nsub, width)
    locb = colb - (q_abs * LANES)[:, :, None, :]          # window-local, ≥ 0
    sub_b = locb >> 7                                     # sublane of each entry

    # percentile span: smallest ladder covering ≥ 1 − overflow_frac of REAL entries
    # (block-padding rows are span-1 by construction and must not dilute the histogram —
    # a small scattered matrix padded to one 32768-row block would look 90% windowable)
    counts = np.bincount(sub_b.reshape(n_pad, width)[:n].ravel(), minlength=1)
    cum = np.cumsum(counts) / max(n * width, 1)
    span = int(np.searchsorted(cum, 1.0 - overflow_frac) + 1)
    if span > span_limit:
        cov_at_limit = cum[span_limit - 1] if span_limit <= len(cum) else 1.0
        if 1.0 - cov_at_limit > max_overflow_frac:
            raise GatherPackError(
                f"windowing at span {span_limit} still leaves "
                f"{100 * (1 - cov_at_limit):.1f}% of entries as overflow: column "
                "structure defeats windowing — use the XLA gather path")
        span = span_limit

    ovf_mask = sub_b >= span
    if ovf_mask.any():
        bidx, tidx, ridx, _k = np.nonzero(ovf_mask)
        orow = ((bidx * nsub + tidx) * SUBTILE_ROWS + ridx).astype(np.int32)
        ocol = colb[ovf_mask].astype(np.int32)
        oval = val.reshape(nb, nsub, SUBTILE_ROWS, width)[ovf_mask]
        keep = (oval != 0) & (orow < n)
        orow, ocol, oval = orow[keep], ocol[keep], oval[keep]
        # neutralize in the ELL: zero value, in-window index
        val.reshape(nb, nsub, SUBTILE_ROWS, width)[ovf_mask] = 0
        locb[ovf_mask] = 0
    else:
        orow = np.zeros((0,), np.int32)
        ocol = np.zeros((0,), np.int32)
        oval = np.zeros((0,), val.dtype)

    w0 = q_abs.min(axis=1)  # (nb, width): block window start per slot
    q_rel_btk = q_abs - w0[:, None, :]
    swin = int(q_rel_btk.max() + span)
    swin += (-swin) % 8  # DMA row-count alignment (8-row hardware requirement)
    if swin > swin_limit:
        raise GatherPackError(
            f"slot window of {swin} sublanes exceeds the window limit {swin_limit}")
    # the REAL VMEM footprint, not just the per-slot window: xw scratch (width slots) +
    # the double-buffered loc/vals blocks + the y block.  Over budget → fall back (the
    # Mosaic compile would otherwise fail AFTER the loud-fallback seam has passed).
    itemsize = 8 if dtype == jnp.float64 else 4
    vmem = (width * swin * LANES * itemsize                      # xw scratch
            + 2 * width * nsub * 8 * LANES * (4 + itemsize)      # loc + vals, 2 buffers
            + 2 * nsub * 8 * LANES * itemsize)                   # y, 2 buffers
    if vmem > 12 * 2 ** 20:
        raise GatherPackError(
            f"packed operand needs ~{vmem / 2**20:.1f} MB of VMEM (width {width}, "
            f"window {swin} sublanes) — over the ~12 MB budget; use the XLA gather path")

    # (nb, nsub, width) → kernel-facing (nb, width, nsub, ...)
    q_rel = np.transpose(q_rel_btk, (0, 2, 1)).astype(np.int32)
    spans = np.transpose(np.minimum(sub_b.max(axis=2) + 1, span), (0, 2, 1)) \
        .astype(np.int32)
    loc = np.transpose(locb, (0, 3, 1, 2)).reshape(nb, width, nsub, 8, LANES)
    valt = np.transpose(val.reshape(nb, nsub, SUBTILE_ROWS, width), (0, 3, 1, 2))
    valt = valt.reshape(nb, width, nsub, 8, LANES)
    w0_flat = w0.reshape(-1)  # (nb*width,) row-major (b, k)

    x_rows = int((w0 + swin).max()) if nb else 0
    x_rows = max(x_rows, -(-num_cols // LANES), nb * rb // LANES)

    return GatherEllOperand(
        w0=jnp.asarray(w0_flat, jnp.int32),
        q=jnp.asarray(q_rel, jnp.int32),
        spans=jnp.asarray(spans),
        loc=jnp.asarray(loc.astype(np.int32)),
        vals=jnp.asarray(valt, dtype),
        orow=jnp.asarray(orow), ocol=jnp.asarray(ocol), oval=jnp.asarray(oval, dtype),
        num_rows=n, num_cols=num_cols, width=width, nb=nb, nsub=nsub,
        swin=swin, span=span, x_rows=x_rows,
    )


def _gather_kernel(w0_ref, loc_ref, vals_ref, q_ref, x_hbm, y_ref, xw, sems, *,
                   width: int, nsub: int, swin: int, span: int):
    b = pl.program_id(0)
    # one window DMA per slot, all in flight before the first wait
    for k in range(width):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(w0_ref[b * width + k], swin), :], xw.at[k], sems.at[k]
        ).start()
    for k in range(width):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(w0_ref[b * width + k], swin), :], xw.at[k], sems.at[k]
        ).wait()

    # keep the f64 accumulator on the CPU/interpret f64 path; f32 otherwise
    acc_dtype = jnp.float64 if y_ref.dtype == jnp.float64 else jnp.float32

    def subtile(t, _):
        acc = jnp.zeros((8, LANES), acc_dtype)
        for k in range(width):
            loc = loc_ref[0, k, t]          # (8, 128) window-local indices
            v = vals_ref[0, k, t]
            q = q_ref[0, k, t]
            sub = jax.lax.shift_right_logical(loc, jnp.asarray(7, loc.dtype))
            lane = jax.lax.bitwise_and(loc, jnp.asarray(127, loc.dtype))
            # STATIC select-gather ladder over the global max span.  Measured on v5e
            # (g=2048): a dynamic per-subtile fori_loop bound (span_ref) ran 13× SLOWER —
            # Mosaic's dynamic loops defeat unrolling/pipelining — so every subtile pays
            # the static worst case and the VPU eats the unused passes.
            g = jnp.zeros((8, LANES), xw.dtype)
            for s in range(span):
                row = xw[k, pl.ds(q + s, 1), :]                  # (1, 128) window row
                rowb = jnp.broadcast_to(row, (8, LANES))
                got = jnp.take_along_axis(rowb, lane, axis=1)
                g = jnp.where(sub == s, got, g)
            acc = acc + (v * g).astype(acc_dtype)
        y_ref[pl.ds(t * 8, 8), :] = acc.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nsub, subtile, 0)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _spmv_gather_jit(w0, loc, vals, q, x128, *, meta, interpret):
    width, nb, nsub, swin, span = meta
    kernel = functools.partial(_gather_kernel, width=width, nsub=nsub, swin=swin,
                               span=span)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, width, nsub, 8, LANES), lambda b, w0r: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, nsub, 8, LANES), lambda b, w0r: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, nsub), lambda b, w0r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual window DMA
        ],
        out_specs=pl.BlockSpec((nsub * 8, LANES), lambda b, w0r: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((width, swin, LANES), x128.dtype),
            pltpu.SemaphoreType.DMA((width,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * nsub * 8, LANES), x128.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * nsub * 8 * LANES * width,
            bytes_accessed=(loc.size + vals.size + 2 * nb * nsub * 8 * LANES)
            * x128.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(w0, loc, vals, q, x128)


def static_meta(op: GatherEllOperand) -> tuple:
    """The hashable static description a caller threads through jit boundaries."""
    return (op.width, op.nb, op.nsub, op.swin, op.span, op.x_rows, op.num_rows, op.rot)


def spmv_gather_ell_arrays(w0, q, loc, vals, orow, ocol, oval, x128, *,
                           meta: tuple, interpret: bool = False):
    """y = A·x from the packed ARRAYS (the jit-argument form the operator registry needs:
    device operands enter compiled programs as runtime arguments, never closures).

    ``meta`` is ``static_meta(op)``.  ``x128`` is the (x_rows, 128) lane layout with a
    zero tail; returns y in the same layout, zero past the matrix rows."""
    interpret = _auto_interpret(interpret)
    width, nb, nsub, swin, span, x_rows, num_rows = meta[:7]  # rot (meta[7]) unused here
    assert x128.shape == (x_rows, LANES), (x128.shape, x_rows)
    with x64_off_for_32bit(vals, x128):
        y = _spmv_gather_jit(w0, loc, vals, q, x128,
                             meta=(width, nb, nsub, swin, span), interpret=interpret)
    y = y.astype(x128.dtype)
    if orow.shape[0]:
        # overflow pass: the <0.5% of entries beyond the kernel's window span, as one
        # XLA gather + scatter-add over the flat vectors (see pack_gather_ell)
        contrib = (oval.astype(x128.dtype) * x128.reshape(-1)[ocol])
        y = y.reshape(-1).at[orow].add(contrib).reshape(y.shape)
    out_rows = y.shape[0]
    if out_rows < x_rows:
        y = jnp.concatenate(
            [y, jnp.zeros((x_rows - out_rows, LANES), y.dtype)], axis=0)
    elif out_rows > x_rows:
        y = y[:x_rows]
    # rows past num_rows are padded ELL rows (zero values ⇒ zero output), but keep the
    # zero-tail contract explicit against future pack changes
    if num_rows < x_rows * LANES:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (x_rows, LANES), 0) * LANES \
            + jax.lax.broadcasted_iota(jnp.int32, (x_rows, LANES), 1)
        y = jnp.where(row_ids < num_rows, y, jnp.zeros_like(y))
    return y


def spmv_gather_ell(op: GatherEllOperand, x128, *, interpret: bool = False):
    """Convenience wrapper over the packed-operand dataclass (tests, one-off use)."""
    return spmv_gather_ell_arrays(op.w0, op.q, op.loc, op.vals,
                                  op.orow, op.ocol, op.oval, x128,
                                  meta=static_meta(op), interpret=interpret)


# ---------------------------------------------------------------------------
# AFFINE windowed variant (round-4 optimizer)
# ---------------------------------------------------------------------------
#
# The ladder kernel above pays `span` select-gather passes per (subtile, slot) because a
# subtile's columns can sit anywhere in a span-sublane window.  But for the matrices the
# benchmark actually exercises (banded, slope ≈ 1: column ≈ row + offset), the window row a
# row needs ADVANCES WITH THE ROW — the residual d = x_sublane − output_sublane − base is
# 2-3 values wide where the absolute window is 9-10.  This variant exploits that:
#
#   pack:   per (block, slot) anchor base_k = min over real entries of
#           a = (col >> 7) − block_local_sublane; per entry d = a − base_k and
#           lane = col & 127, encoded loc = d·128 + lane.  d beyond the percentile ladder
#           (or negative — block-0 backward reaches whose window would start above x) goes
#           to the same overflow COO list.  Inert entries (ELL padding, neutralized
#           overflow) get the sentinel d = 255: never selected by any ladder pass, so
#           uninitialized window rows can never leak through a 0·NaN.
#   kernel: ONE window DMA per (block, slot) starting at EXACTLY base_k (HBM row starts
#           need no alignment; row counts do — swin is a multiple of 8).  The subtile loop
#           is statically unrolled, so the (16, 128) window view per subtile comes from two
#           ALIGNED static 8-row slices, and the ladder runs over the D residual values:
#           static (8, 128) value slices at rows δ..δ+8 — relayout shifts, no dynamic
#           sublane slicing anywhere (the documented crash class, module doc "design space").
#
# Ops per (subtile, slot): 2 slices + concat + D·(slice+gather+select) ≈ 3 + 3D versus
# 3·span for the ladder — ~2.5-3× fewer VPU passes at the stencil's D = 2-3, span = 9-10.
# ops._init_gather_ell packs BOTH and picks affine when its measured D ≤ AFFINE_DSPAN_MAX.

AFFINE_DSPAN_MAX = 8    # ladder length cap: δ + 8 row-slices must fit the 16-row view
_AFFINE_SENTINEL = 255  # d value no ladder pass matches (inert entries)


def pack_gather_ell_affine(ell_col: np.ndarray, ell_val: np.ndarray, num_cols: int,
                           dtype, *, block_subtiles: int = 32,
                           overflow_frac: float = 0.005,
                           max_overflow_frac: float = 0.02) -> GatherEllOperand:
    """Affine-windowed pack (see block comment).  Raises GatherPackError when the matrix
    is not affine-windowable (residual span beyond AFFINE_DSPAN_MAX, or too many
    overflow entries) — callers fall back to the ladder pack."""
    n, width = ell_col.shape
    if width == 0 or n == 0:
        raise GatherPackError("empty matrix (no rows or ELL width 0)")
    if num_cols >= 2 ** 31 - 1:
        raise GatherPackError("int32 column indices required (num_cols < 2^31)")
    rb = block_subtiles * SUBTILE_ROWS
    nb = -(-n // rb)
    nsub = block_subtiles
    n_pad = nb * rb

    # int32 throughout (num_cols < 2^31 guard above): at 15360² the (n_pad, width)
    # intermediates are 1.18e9 entries each — int64 measured 116 GB peak RSS / 19 min on
    # this host, int32 + eager frees halve both
    col = np.empty((n_pad, width), np.int32)
    col[:n] = ell_col
    val = np.zeros((n_pad, width), np.float32 if dtype != jnp.float64 else np.float64)
    val[:n] = ell_val
    if n_pad > n:
        col[n:] = ell_col[n - 1]
    real = np.zeros((n_pad, width), bool)
    real[:n] = ell_val != 0  # zero-val slots are inert: exclude from anchors/histograms

    # ROT detection: a slot whose real entries (almost) all satisfy col − row = c is an
    # exact diagonal — its lane gather is a CONSTANT LANE ROTATION (lane = (l+c)&127) plus
    # a static sublane step at the wrap column.  The kernel then replaces the
    # take_along_axis ladder (the measured VPU bottleneck: 2 gathers + 2 selects per slot)
    # with 2 static slices + 2 pltpu.rolls + 1 select, and the slot's per-entry index
    # plane drops out of HBM traffic entirely.  Entries off the diagonal (e.g. clipped
    # boundary rows) route to the existing COO overflow pass.
    rows_idx = np.arange(n, dtype=np.int64)
    rot = []
    rot_mism = {}  # slot → (n,) bool mask of real entries off the modal diagonal
    for k in range(width):
        rk = real[:n, k]
        ridx = np.flatnonzero(rk)
        c = None
        if ridx.size:
            diffs = col[:n, k].astype(np.int64) - rows_idx
            # MODAL diagonal over an even SAMPLE of real entries — NOT a single probe
            # row.  A single median-row probe (the round-4 bug) lands deterministically
            # on a left-edge boundary row for even g (n/2 = g·(g/2) ⇒ j = 0), where the
            # sorted-ELL slot assignment shifts by one — three of the stencil's five
            # slots then read a bogus diagonal, 99.9% "mismatch", and the whole pack
            # declined to the ladder at every benchmark size.  Boundary rows are a
            # vanishing fraction of any even sample, so the sample mode is the true
            # interior diagonal.
            sample = diffs[ridx[:: max(1, ridx.size // 10001)]]
            cand_vals, cand_counts = np.unique(sample, return_counts=True)
            cand = int(cand_vals[np.argmax(cand_counts)])
            mism = rk & (diffs != cand)
            n_mism = int(mism.sum())
            # the analytic rot base (block_start + c>>7) clips at 0 in the first
            # ceil(−(c>>7)/(rb>>7)) blocks when c < 0; every real slot entry there
            # mismatches the static pattern and must overflow — count that cost up front
            # and DEMOTE the slot to the ladder path when it isn't negligible (small
            # matrices), instead of blowing the pack's overflow budget
            if cand < 0:
                nclip = -(-(-(cand >> 7)) // (rb >> 7))
                n_mism += int(rk[: min(nclip * rb, n)].sum())
            if n_mism <= 0.005 * ridx.size:
                c = cand
                rot_mism[k] = mism
            del diffs, mism
        rot.append(c)
    rot = tuple(rot)
    ladder_cols = [k for k in range(width) if rot[k] is None]

    # a = x_sublane − block-local output sublane, per entry
    blocal = ((np.arange(n_pad, dtype=np.int64) % rb) >> 7).astype(np.int32)  # (n_pad,)
    a = (col >> 7) - blocal[:, None]                          # (n_pad, width)
    ab = a.reshape(nb, rb, width)
    realb = real.reshape(nb, rb, width)
    # per (block, slot) anchor over REAL entries; window start must be a legal x row
    a_masked = np.where(realb, ab, np.iinfo(np.int32).max)
    base = a_masked.min(axis=1)                    # (nb, width)
    del a_masked
    base = np.clip(base, 0, None)                  # negative window starts are illegal:
    # rot slots get the ANALYTIC base (block_start + c>>7): the kernel's static rot
    # pattern d(l) = (l+cm)>>7 holds exactly against it; blocks where the analytic base
    # clips at 0 (top-boundary back-reach) overflow out below, like negative windows do
    block_start_sub = np.arange(nb, dtype=np.int64) * (rb >> 7)
    for k, c in enumerate(rot):
        if c is not None:
            base[:, k] = np.maximum(block_start_sub + (c >> 7), 0).astype(base.dtype)
    d = ab - base[:, None, :]                      # their entries overflow out below
    del a, ab

    dr = d.reshape(n_pad, width)
    total = max(int(real.sum()), 1)
    ovf_mask = np.zeros((n_pad, width), bool)
    l_out = (np.arange(n_pad, dtype=np.int64) & 127)
    for k, c in enumerate(rot):
        if c is None:
            continue
        cm = c % 128
        exp = ((l_out + cm) >> 7).astype(dr.dtype)
        ovf_mask[:, k] = real[:, k] & (dr[:, k] != exp)
        ovf_mask[:n, k] |= rot_mism[k]
    del l_out

    # ladder slots: residual-span length from the d histogram of their real entries
    # (d < 0 counts as overflow)
    if ladder_cols:
        real_l = real[:, ladder_cols]
        d_real = dr[:, ladder_cols][real_l]
        pos = d_real[d_real >= 0]
        del d_real
        pos_size = pos.size
        counts = np.bincount(pos, minlength=1) if pos_size else np.zeros(1, np.int64)
        del pos
        dspan = int(np.searchsorted(np.cumsum(counts),
                                    (1.0 - overflow_frac) * total) + 1) \
            if pos_size else 1
        if dspan > AFFINE_DSPAN_MAX:
            cov = (np.cumsum(counts)[AFFINE_DSPAN_MAX - 1] / total
                   if AFFINE_DSPAN_MAX <= len(counts) else 1.0)
            if 1.0 - cov > max_overflow_frac:
                raise GatherPackError(
                    f"affine residual span {dspan} > {AFFINE_DSPAN_MAX} and capping "
                    f"leaves {100 * (1 - cov):.1f}% overflow — matrix is not "
                    "affine-windowable")
            dspan = AFFINE_DSPAN_MAX
        ovf_mask[:, ladder_cols] |= real_l & ((dr[:, ladder_cols] < 0)
                                              | (dr[:, ladder_cols] >= dspan))
        del real_l
    else:
        dspan = 1

    ovf_frac_actual = ovf_mask.sum() / total
    if ovf_frac_actual > max_overflow_frac:
        raise GatherPackError(
            f"affine overflow {100 * ovf_frac_actual:.1f}% > "
            f"{100 * max_overflow_frac:.0f}% — matrix is not affine-windowable")
    if ovf_mask.any():
        ridx, _k = np.nonzero(ovf_mask)
        orow = ridx.astype(np.int32)
        ocol = col[ovf_mask].astype(np.int32)
        oval = val[ovf_mask]
        keep = orow < n
        orow, ocol, oval = orow[keep], ocol[keep], oval[keep]
        val[ovf_mask] = 0
    else:
        orow = np.zeros((0,), np.int32)
        ocol = np.zeros((0,), np.int32)
        oval = np.zeros((0,), val.dtype)

    inert = (val == 0)
    dfin = np.where(inert.reshape(nb, rb, width), _AFFINE_SENTINEL,
                    np.clip(d, 0, dspan - 1))
    lane = np.where(inert, 0, col & 127)

    # kernel-facing loc: LADDER slots only — rot slots never read per-entry indices, so
    # their index planes are dropped from the operand (and from HBM traffic) entirely
    if ladder_cols:
        loc = (dfin.reshape(n_pad, width)[:, ladder_cols] * LANES
               + lane[:, ladder_cols]).astype(np.int32)
        locb = np.transpose(
            loc.reshape(nb, nsub, SUBTILE_ROWS, len(ladder_cols)), (0, 3, 1, 2))
        locb = locb.reshape(nb, len(ladder_cols), nsub, 8, LANES)
    else:
        locb = np.zeros((1, 1, 1, 8, LANES), np.int32)  # constant-index dummy block
    valt = np.transpose(val.reshape(nb, nsub, SUBTILE_ROWS, width), (0, 3, 1, 2))
    valt = valt.reshape(nb, width, nsub, 8, LANES)

    swin = 8 * nsub + 16  # t·8 + 16 must be readable for the last subtile
    itemsize = 8 if dtype == jnp.float64 else 4
    vmem = (width * swin * LANES * itemsize
            + 2 * max(len(ladder_cols), 1) * nsub * 8 * LANES * 4
            + 2 * width * nsub * 8 * LANES * itemsize
            + 2 * nsub * 8 * LANES * itemsize)
    if vmem > 12 * 2 ** 20:
        raise GatherPackError(
            f"affine operand needs ~{vmem / 2**20:.1f} MB of VMEM — over budget")

    x_rows = int(base.max() + swin) if nb else 0
    x_rows = max(x_rows, -(-num_cols // LANES), n_pad // LANES)

    return GatherEllOperand(
        w0=jnp.asarray(base.reshape(-1), jnp.int32),
        q=jnp.zeros((nb, width, nsub), jnp.int32),  # unused by the affine kernel
        spans=jnp.full((nb, width, nsub), dspan, jnp.int32),
        loc=jnp.asarray(locb),
        vals=jnp.asarray(valt, dtype),
        orow=jnp.asarray(orow), ocol=jnp.asarray(ocol), oval=jnp.asarray(oval, dtype),
        num_rows=n, num_cols=num_cols, width=width, nb=nb, nsub=nsub,
        swin=swin, span=dspan, x_rows=x_rows, rot=rot,
    )


def _affine_kernel(ws_ref, loc_ref, vals_ref, x_hbm, y_ref, xw, sems, *,
                   width: int, nsub: int, swin: int, dspan: int, rot: tuple):
    b = pl.program_id(0)
    for k in range(width):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws_ref[b * width + k], swin), :], xw.at[k], sems.at[k]
        ).start()
    for k in range(width):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(ws_ref[b * width + k], swin), :], xw.at[k], sems.at[k]
        ).wait()

    # loc carries LADDER slots only (rot slots read no per-entry indices)
    lpos = {k: i for i, k in enumerate(k for k in range(width) if rot[k] is None)}
    acc_dtype = jnp.float64 if y_ref.dtype == jnp.float64 else jnp.float32
    # STATIC subtile unroll: window views become aligned static slices — no dynamic
    # sublane slicing (the crash class documented in the module "design space" notes)
    for t in range(nsub):
        acc = jnp.zeros((8, LANES), acc_dtype)
        for k in range(width):
            v = vals_ref[0, k, t]
            win16 = xw[k, t * 8:t * 8 + 16, :]  # (16, 128) static aligned view
            if rot[k] is not None:
                # ROT slot: exact diagonal — gather g[r,l] = win16[(l+cm)>>7 + r,
                # (l+cm)&127] is a static lane rotation + a sublane step at the wrap
                # column.  pltpu.roll(x, s)[.., l] = x[.., (l−s)%128], so s = 128−cm.
                cm = rot[k] % LANES
                if cm == 0:
                    g = jax.lax.slice(win16, (0, 0), (8, LANES))
                else:
                    s = LANES - cm
                    r0 = pltpu.roll(jax.lax.slice(win16, (0, 0), (8, LANES)),
                                    shift=s, axis=1)
                    r1 = pltpu.roll(jax.lax.slice(win16, (1, 0), (9, LANES)),
                                    shift=s, axis=1)
                    wrap = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1) >= s
                    g = jnp.where(wrap, r1, r0)
            else:
                loc = loc_ref[0, lpos[k], t]
                d = jax.lax.shift_right_logical(loc, jnp.asarray(7, loc.dtype))
                lane = jax.lax.bitwise_and(loc, jnp.asarray(127, loc.dtype))
                g = jnp.zeros((8, LANES), xw.dtype)
                for s in range(dspan):
                    rows = jax.lax.slice(win16, (s, 0), (s + 8, LANES))  # value shift
                    got = jnp.take_along_axis(rows, lane, axis=1)
                    g = jnp.where(d == s, got, g)
            acc = acc + (v * g).astype(acc_dtype)
        y_ref[pl.ds(t * 8, 8), :] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _spmv_affine_jit(ws, loc, vals, x128, *, meta, interpret):
    width, nb, nsub, swin, dspan, rot = meta
    n_ladder = sum(1 for c in rot if c is None)
    if n_ladder:
        loc_spec = pl.BlockSpec((1, n_ladder, nsub, 8, LANES),
                                lambda b, wsr: (b, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # all slots rot: loc is a (1,1,1,8,128) dummy, same block every grid step
        loc_spec = pl.BlockSpec((1, 1, 1, 8, LANES), lambda b, wsr: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    kernel = functools.partial(_affine_kernel, width=width, nsub=nsub, swin=swin,
                               dspan=dspan, rot=rot)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            loc_spec,
            pl.BlockSpec((1, width, nsub, 8, LANES), lambda b, wsr: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual window DMA
        ],
        out_specs=pl.BlockSpec((nsub * 8, LANES), lambda b, wsr: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((width, swin, LANES), x128.dtype),
            pltpu.SemaphoreType.DMA((width,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * nsub * 8, LANES), x128.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * nsub * 8 * LANES * width,
            bytes_accessed=(loc.size + vals.size + 2 * nb * nsub * 8 * LANES)
            * x128.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ws, loc, vals, x128)


def spmv_gather_affine_arrays(ws, loc, vals, orow, ocol, oval, x128, *,
                              meta: tuple, interpret: bool = False):
    """Affine-variant apply; same contract as spmv_gather_ell_arrays."""
    interpret = _auto_interpret(interpret)
    width, nb, nsub, swin, dspan, x_rows, num_rows = meta[:7]
    rot = meta[7] if len(meta) > 7 and meta[7] else (None,) * width
    assert x128.shape == (x_rows, LANES), (x128.shape, x_rows)
    with x64_off_for_32bit(vals, x128):
        y = _spmv_affine_jit(ws, loc, vals, x128,
                             meta=(width, nb, nsub, swin, dspan, rot),
                             interpret=interpret)
    y = y.astype(x128.dtype)
    if orow.shape[0]:
        contrib = (oval.astype(x128.dtype) * x128.reshape(-1)[ocol])
        y = y.reshape(-1).at[orow].add(contrib).reshape(y.shape)
    out_rows = y.shape[0]
    if out_rows < x_rows:
        y = jnp.concatenate(
            [y, jnp.zeros((x_rows - out_rows, LANES), y.dtype)], axis=0)
    elif out_rows > x_rows:
        y = y[:x_rows]
    if num_rows < x_rows * LANES:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (x_rows, LANES), 0) * LANES \
            + jax.lax.broadcasted_iota(jnp.int32, (x_rows, LANES), 1)
        y = jnp.where(row_ids < num_rows, y, jnp.zeros_like(y))
    return y


def spmv_gather_affine(op: GatherEllOperand, x128, *, interpret: bool = False):
    """Convenience wrapper over the affine packed operand (tests, one-off use)."""
    return spmv_gather_affine_arrays(op.w0, op.loc, op.vals,
                                     op.orow, op.ocol, op.oval, x128,
                                     meta=static_meta(op), interpret=interpret)
