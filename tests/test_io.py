"""Matrix Market I/O: round-trips, header parsing, symmetric expansion, generator parity."""

import numpy as np
import pytest

from tpusparse import formats, generate, io_mtx

from . import fixtures


def test_stencil_writer_reader_roundtrip(tmp_path):
    g = 9
    p = str(tmp_path / "s.mtx")
    nnz = generate.write_matrix_market_stencil5(p, g)
    assert nnz == generate.stencil5_nnz(g)
    coo = io_mtx.load_matrix_market(p)
    assert coo.grid_size == g
    assert coo.nnz == nnz
    csr = formats.coo_to_csr(coo)
    expected = formats.stencil5_to_csr(generate.make_stencil5(g)).to_dense()
    np.testing.assert_allclose(csr.to_dense(), expected, atol=0)


def test_general_write_read_roundtrip(tmp_path):
    csr = fixtures.random_sparse(30, 0.1)
    p = str(tmp_path / "m.mtx")
    io_mtx.write_matrix_market(p, formats.csr_to_coo(csr))
    coo = io_mtx.load_matrix_market(p)
    np.testing.assert_allclose(formats.coo_to_csr(coo).to_dense(), csr.to_dense(), atol=0)


def test_symmetric_expansion(tmp_path):
    """Symmetric files store the lower triangle; the reader expands them
    (reference read_matrix_symtogen, io.cu:189-310)."""
    csr = fixtures.spd_stencil_csr(4)
    coo = formats.csr_to_coo(csr)
    sel = coo.row >= coo.col
    p = str(tmp_path / "sym.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write(f"{csr.num_rows} {csr.num_cols} {int(sel.sum())}\n")
        for r, c, v in zip(coo.row[sel] + 1, coo.col[sel] + 1, coo.val[sel]):
            f.write(f"{r} {c} {v}\n")
    loaded = io_mtx.load_matrix_market(p)
    np.testing.assert_allclose(
        formats.coo_to_csr(loaded).to_dense(), csr.to_dense(), atol=0
    )


def test_reader_rejects_bad_banner(tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("not a matrix\n1 1 1\n1 1 1.0\n")
    with pytest.raises(ValueError):
        io_mtx.load_matrix_market(p)


def test_reader_rejects_truncated_file(tmp_path):
    p = str(tmp_path / "trunc.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n3 3 5\n1 1 1.0\n")
    with pytest.raises(ValueError):
        io_mtx.load_matrix_market(p)


def test_grid_size_comment_optional(tmp_path):
    p = str(tmp_path / "plain.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("% a random comment\n2 2 2\n1 1 3.0\n2 2 4.0\n")
    coo = io_mtx.load_matrix_market(p)
    assert coo.grid_size == 0
    assert coo.nnz == 2


def test_checksum_oracle_against_dense():
    """Analytical y = A·ones checksums (reference oracle pattern,
    test_wrapper_basic.cpp:115-121)."""
    for g in (1, 2, 3, 5, 81):
        s, n2 = generate.stencil5_spmv_checksums(g)
        dense = fixtures.spd_stencil_csr(g).to_dense() if g <= 16 else None
        if dense is not None:
            y = dense @ np.ones(g * g)
            assert np.isclose(s, y.sum())
            assert np.isclose(n2, np.linalg.norm(y))
        else:
            # large-g: verify via the plane formulation instead of dense
            st = generate.make_stencil5(g)
            y = st.planes.sum(axis=0)  # A·ones pointwise
            assert np.isclose(s, y.sum())
            assert np.isclose(n2, np.linalg.norm(y.ravel()))
