"""Pallas DIA kernel: gather-free generic structured SpMV (kernels/dia.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse import formats, generate, ops
from tpusparse.kernels import dia as dia_k

from . import fixtures

# f64 Pallas kernels cannot compile on TPU (Mosaic) — these tests exercise the f64 path and
# are meaningful only where it exists (the CPU/x64 suite; SURVEY.md §7 "f64 on TPU")
_f64_kernels = pytest.mark.skipif(
    __import__("jax").default_backend() != "cpu",
    reason="f64 Pallas kernels are CPU/interpret-only (Mosaic has no f64)",
)



def _dia_spmv(csr, x, block_rows128=8):
    dia = formats.csr_to_dia(csr)
    data128, offsets, n, nr = dia_k.pack_dia_operand(dia, jnp.float64)
    xp = dia_k.x_to_lanes(jnp.asarray(x), nr)
    y = dia_k.spmv_dia_pallas(
        data128, xp, offsets=offsets, block_rows128=block_rows128, interpret=True
    )
    return np.asarray(y).reshape(-1)[:n]


@pytest.mark.parametrize(
    "make",
    [
        lambda: fixtures.identity(40),
        lambda: fixtures.tridiagonal(300),
        lambda: fixtures.banded(257, 5),
        lambda: fixtures.diagonal(np.arange(1.0, 130.0)),
        lambda: fixtures.spd_stencil_csr(13),
        lambda: fixtures.spd_stencil_csr(24),
    ],
)
def test_dia_pallas_matches_dense(make):
    csr = make()
    x = np.random.RandomState(1).randn(csr.num_cols)
    y_ref = csr.to_dense() @ x
    np.testing.assert_allclose(_dia_spmv(csr, x), y_ref, rtol=1e-12, atol=1e-12)


def test_dia_pallas_large_offsets():
    """Offsets beyond one 128-lane row exercise the multi-row window decomposition."""
    n = 600
    rows = np.concatenate([np.arange(n), np.arange(n - 300)]).astype(np.int64)
    cols = np.concatenate([np.arange(n), np.arange(300, n)]).astype(np.int64)
    vals = np.concatenate([np.full(n, 2.0), np.full(n - 300, -0.5)])
    csr = formats.coo_to_csr(formats.COOMatrix(n, n, rows, cols, vals))
    x = np.random.RandomState(2).randn(n)
    np.testing.assert_allclose(_dia_spmv(csr, x), csr.to_dense() @ x, rtol=1e-12)


@_f64_kernels
def test_dia_operator_through_registry():
    st = generate.make_stencil5(17)
    csr = formats.stencil5_to_csr(st)
    op = ops.get_operator("dia", csr, dtype=jnp.float64)
    x = np.random.RandomState(3).randn(op.num_cols)
    y, _ = op.run_timed(x)
    np.testing.assert_allclose(y, csr.to_dense() @ x, rtol=1e-12, atol=1e-12)
    # padded field round-trip
    xf = op.as_field(x)
    assert xf.shape == op.field_shape
    np.testing.assert_allclose(np.asarray(op.from_field(xf)), x)
    # fused dot
    yf, dot = op.run_device_dot(op.as_field(x).astype(jnp.float64))
    np.testing.assert_allclose(float(dot), float(x @ (csr.to_dense() @ x)), rtol=1e-12)


@_f64_kernels
def test_dia_xla_matches_pallas():
    csr = fixtures.banded(200, 3)
    x = np.random.RandomState(4).randn(200)
    op1 = ops.get_operator("dia", csr, dtype=jnp.float64)
    op2 = ops.get_operator("dia-xla", csr, dtype=jnp.float64)
    y1, _ = op1.run_timed(x)
    y2, _ = op2.run_timed(x)
    np.testing.assert_allclose(y1, y2, rtol=1e-13)
