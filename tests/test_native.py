"""Native C++ I/O core (csrc/mtxio.cpp) — parity with the numpy fallbacks.

Mirrors the reference's build-the-real-sources testing approach (SURVEY.md §4): the tests
exercise the actual shared library, and the suite still passes (via fallbacks) when the
library cannot be built."""

import numpy as np
import pytest

from tpusparse import formats, generate, io_mtx, native

from . import fixtures

needs_native = pytest.mark.skipif(not native.available(), reason="libmtxio.so not built")


@needs_native
def test_native_read_matches_python(tmp_path):
    g = 11
    p = str(tmp_path / "s.mtx")
    generate._write_stencil5_python(p, g, 5.0, -1.0)
    rows, cols, r, c, v, grid = native.read_mtx(p)
    assert (rows, cols, grid) == (g * g, g * g, g)
    csr_native = formats.coo_to_csr(
        formats.COOMatrix(rows, cols, r, c, v, grid)
    )
    expected = formats.stencil5_to_csr(generate.make_stencil5(g)).to_dense()
    np.testing.assert_allclose(csr_native.to_dense(), expected, atol=0)


@needs_native
def test_native_writer_matches_python_writer(tmp_path):
    g = 9
    p1 = str(tmp_path / "native.mtx")
    p2 = str(tmp_path / "python.mtx")
    nnz1 = native.write_stencil5_mtx(p1, g, 5.0, -1.0)
    nnz2 = generate._write_stencil5_python(p2, g, 5.0, -1.0)
    assert nnz1 == nnz2 == generate.stencil5_nnz(g)
    d1 = formats.coo_to_csr(io_mtx.load_matrix_market(p1)).to_dense()
    d2 = formats.coo_to_csr(io_mtx.load_matrix_market(p2)).to_dense()
    np.testing.assert_allclose(d1, d2, atol=0)


@needs_native
def test_native_csr_build_matches_numpy():
    csr_any = fixtures.random_sparse(60, 0.08)
    coo = formats.csr_to_coo(csr_any)
    rp, ci, v = native.coo_to_csr_sorted(coo.num_rows, coo.row, coo.col, coo.val)
    np.testing.assert_array_equal(rp, csr_any.row_ptr)
    np.testing.assert_array_equal(ci, csr_any.col_idx)
    np.testing.assert_allclose(v, csr_any.val, atol=0)


@needs_native
def test_native_parses_scientific_notation(tmp_path):
    p = str(tmp_path / "sci.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("2 2 3\n1 1 1.5e-3\n1 2 -2.25E+2\n2 2 7\n")
    rows, cols, r, c, v, grid = native.read_mtx(p)
    np.testing.assert_allclose(v, [1.5e-3, -225.0, 7.0], rtol=0)
    assert list(r) == [0, 0, 1] and list(c) == [0, 1, 1]


@needs_native
def test_native_header_error_on_garbage(tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("garbage\n")
    with pytest.raises(ValueError):
        native.read_mtx(p)


def test_native_parse_f64_exact_roundtrip(tmp_path):
    """The native parser must agree with strtod bit-for-bit on %.17g output — long mantissas
    (including leading-zero-heavy fractions) must NOT take a truncating fast path."""
    if not native.available():
        pytest.skip("native extension not built")
    rng = np.random.RandomState(7)
    vals = np.concatenate([
        rng.randn(500) * 10.0 ** rng.randint(-12, 12, 500),  # wide exponent range
        rng.rand(500) * 1e-3,                                # leading-zero fractions
        np.array([5.0, -1.0, 0.0007504511958064573, 1e300, -1e-300]),
    ])
    n = len(vals)
    p = str(tmp_path / "rt.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{n} {n} {n}\n")
        for i, v in enumerate(vals):
            f.write(f"{i + 1} {i + 1} {v:.17g}\n")
    rows, cols, r, c, v, grid = native.read_mtx(p)
    assert np.array_equal(v, vals), "native parse differs from written values"


def test_native_rejects_surplus_entries(tmp_path):
    """A file with MORE data lines than the header promises must fail on the native path
    exactly like the numpy fallback does."""
    if not native.available():
        pytest.skip("native extension not built")
    p = str(tmp_path / "surplus.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("2 2 1\n")
        f.write("1 1 1.0\n")
        f.write("2 2 2.0\n")
    with pytest.raises(ValueError):
        native.read_mtx(p)
