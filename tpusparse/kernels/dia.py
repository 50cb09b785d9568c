"""Pallas DIA (diagonal-offset) SpMV — the generic structured-matrix kernel.

Role parity: the reference keeps a textbook one-thread-per-row CSR kernel as its generic path
(``csr_spmv_kernel``, cg_solver_mgpu_partitioned.cu:40-56).  Arbitrary ``x[col_idx[k]]``
gathers are hostile to TPU vector memory (SURVEY.md §7 "gather-free SpMV"), so the TPU-native
generic formulation is diagonal-offset storage: any matrix whose nonzeros live on a bounded set
of diagonals (all banded/stencil/fixture matrices) becomes

    y[i] = Σ_d data[d, i] · x[i + off_d]

and each diagonal is a *static* shift — no index traffic, no gather.

Kernel design: x is viewed as (rows128, 128) lanes.  Per row-block the kernel DMAs one HBM
window of x covering [block_start + min_off, block_end + max_off] into VMEM scratch, then each
diagonal's shifted read decomposes statically into sublane shift q = off // 128 and lane shift
s = off % 128: a two-slice lane concat.  The ``data`` planes stream through the normal Pallas
pipeline.  Bytes/point ≈ (ndiag + 2) words — the same byte model as the reference's DIA column
in spmv_metrics.

The caller pads x by ``pad_rows`` zero rows on both sides (ops.py does this), which turns all
out-of-range diagonal reads into zeros — boundary handling as data, like the stencil kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import x64_off_for_32bit

LANES = 128


def _auto_interpret(interpret: bool) -> bool:
    return interpret or jax.default_backend() == "cpu"


def plan_dia(offsets):
    """Static planning: per-diagonal (q, s) decomposition relative to the window start."""
    offsets = [int(o) for o in offsets]
    qs = [(o // LANES, o % LANES) for o in offsets]  # floor div: s in [0, 128)
    min_q = min(q for q, _ in qs)
    max_q = max(q for q, _ in qs)
    # window rows needed per block of bnr y-rows: bnr + (max_q - min_q) + 1 (for lane spill)
    return qs, min_q, max_q


def _win_rows(bnr: int, min_q: int, max_q: int) -> int:
    """VMEM x-window height per block.  MUST be a multiple of 8: a DMA whose sublane count is
    not 8-aligned faults the TPU (verified on v5e — the worker process crashes outright).
    Unaligned *start* offsets are fine; only the row count needs alignment."""
    need = bnr + (max_q - min_q) + 1
    return need + (-need) % 8


def _dia_kernel(data_ref, x_hbm, y_ref, win_ref, sem, *, offsets_qs, min_q, max_q,
                bnr: int, pad_rows: int):
    i = pl.program_id(0)
    # DMA the x window for this block: padded-x rows [i*bnr + pad_rows + min_q, ... + win_rows)
    win_rows = _win_rows(bnr, min_q, max_q)
    w0 = i * bnr + pad_rows + min_q
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, win_rows), :], win_ref, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((bnr, LANES), y_ref.dtype)
    for d, (q, s) in enumerate(offsets_qs):
        qrel = q - min_q
        a = win_ref[qrel : qrel + bnr, :]
        if s == 0:
            seg = a
        else:
            b = win_ref[qrel + 1 : qrel + 1 + bnr, :]
            seg = jnp.concatenate([a[:, s:], b[:, :s]], axis=1)
        acc = acc + data_ref[d] * seg
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block_rows128", "interpret"))
def spmv_dia_pallas(data128, x128, *, offsets: tuple, block_rows128: int = 0,
                    interpret: bool = False):
    """y = A·x for diagonal-offset storage.

    Args:
      data128: (ndiag, rows128, 128) — data[d] reshaped to lanes, zero where the diagonal
        exits the matrix.
      x128: (rows128, 128) — x reshaped to lanes.  Zero-padding for off-grid diagonal reads
        (and for the final partial block's window) is added internally.
      offsets: static tuple of diagonal offsets (must match data128's first axis).
    Returns y as (rows128, 128).
    """
    interpret = _auto_interpret(interpret)
    ndiag, nr, lanes = data128.shape
    assert lanes == LANES and len(offsets) == ndiag
    assert x128.shape == (nr, LANES), (x128.shape, nr)
    qs, min_q, max_q = plan_dia(offsets)
    bnr = block_rows128 or max(8, min(512, (1 << 20) // (max(ndiag, 1) * LANES * 4)))
    bnr = min(bnr, nr if nr < 8 else nr - nr % 8 if nr % 8 else nr)
    if bnr % 8 and nr >= 8:
        bnr -= bnr % 8
    win_rows = _win_rows(bnr, min_q, max_q)
    # Zero-pad so every block's window DMA stays in range: the top needs |min_q| rows; the
    # bottom must cover the LAST block's full (8-aligned) window:
    #   last w0 + win_rows = (nblocks-1)*bnr + pad_rows + min_q + win_rows
    #   ≤ pad_rows + nr + pad_bottom.
    nblocks = -(-nr // bnr)
    pad_rows = max(-min_q, max_q + 1, 1)
    pad_bottom = max((nblocks - 1) * bnr + min_q + win_rows - nr, 1)
    x_padded128 = jnp.concatenate(
        [
            jnp.zeros((pad_rows, LANES), x128.dtype),
            x128,
            jnp.zeros((pad_bottom, LANES), x128.dtype),
        ],
        axis=0,
    )

    kernel = functools.partial(
        _dia_kernel, offsets_qs=qs, min_q=min_q, max_q=max_q, bnr=bnr, pad_rows=pad_rows
    )
    with x64_off_for_32bit(data128, x_padded128):
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(nr, bnr),),
        in_specs=[
            pl.BlockSpec((ndiag, bnr, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual window DMA
        ],
        out_specs=pl.BlockSpec((bnr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nr, LANES), x_padded128.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANES), x_padded128.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * nr * LANES,
            bytes_accessed=(ndiag + 2) * nr * LANES * x_padded128.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(data128, x_padded128)


def pack_dia_operand(dia, dtype):
    """Host-side packing: DIAMatrix → (data128, offsets, n, rows128).  Rows are padded to a
    multiple of 128 lanes; data beyond n is zero."""
    import numpy as np

    n = dia.num_rows
    nr = -(-n // LANES)
    data = np.zeros((dia.ndiag, nr * LANES), dtype=np.float64)
    data[:, :n] = dia.data
    data128 = data.reshape(dia.ndiag, nr, LANES)
    return (
        jnp.asarray(data128, dtype),
        tuple(int(o) for o in dia.offsets),
        n,
        nr,
    )


def x_to_lanes(x_flat, nr: int):
    """Reshape a flat x (length ≤ nr·128) into the (nr, 128) lane layout, zero tail."""
    n = x_flat.shape[0]
    total = nr * LANES
    if n == total:
        return x_flat.reshape(nr, LANES)
    xp = jnp.zeros((total,), x_flat.dtype).at[:n].set(x_flat)
    return xp.reshape(nr, LANES)
