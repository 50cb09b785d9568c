"""Format containers and converters: round-trips and dense-oracle equivalence."""

import numpy as np
import pytest

from tpusparse import formats, generate
from tpusparse.formats import COOMatrix, coo_to_csr, csr_to_coo, csr_to_dia, csr_to_ell

from . import fixtures


@pytest.mark.parametrize(
    "make",
    [
        lambda: fixtures.identity(17),
        lambda: fixtures.diagonal([1, 2, 3, 4, 5]),
        lambda: fixtures.tridiagonal(33),
        lambda: fixtures.upper_triangular(12),
        lambda: fixtures.banded(29, 3),
        lambda: fixtures.random_sparse(40, 0.07),
        lambda: fixtures.spd_stencil_csr(9),
    ],
)
def test_converters_match_dense(make):
    csr = make()
    dense = csr.to_dense()
    x = np.random.RandomState(0).randn(csr.num_cols)
    y = dense @ x

    coo = csr_to_coo(csr)
    dense2 = coo_to_csr(coo).to_dense()
    np.testing.assert_allclose(dense2, dense, atol=0)

    ell = csr_to_ell(csr)
    y_ell = (ell.val * x[ell.col]).sum(axis=1)
    np.testing.assert_allclose(y_ell, y, rtol=1e-13, atol=1e-13)

    dia = csr_to_dia(csr)
    y_dia = np.zeros(csr.num_rows)
    idx = np.arange(csr.num_rows, dtype=np.int64)
    for d, off in enumerate(dia.offsets):
        ok = (idx + off >= 0) & (idx + off < csr.num_cols)
        y_dia[ok] += dia.data[d, ok] * x[idx[ok] + off]
    np.testing.assert_allclose(y_dia, y, rtol=1e-13, atol=1e-13)


def test_csr_rows_sorted_by_column():
    """The reference's sorted-row invariant (spmv_cusparse_csr.cu:139-157)."""
    csr = fixtures.random_sparse(50, 0.1)
    for i in range(csr.num_rows):
        lo, hi = csr.row_ptr[i], csr.row_ptr[i + 1]
        cols = csr.col_idx[lo:hi]
        assert np.all(np.diff(cols) > 0)


def test_stencil5_roundtrip():
    st = generate.make_stencil5(7)
    csr = formats.stencil5_to_csr(st)
    assert csr.nnz == generate.stencil5_nnz(7)
    st2 = formats.csr_to_stencil5(csr)
    np.testing.assert_array_equal(st2.planes, st.planes)
    assert st2.constant == (5.0, -1.0)
    assert st2.grid_size == 7


def test_stencil5_rejects_non_stencil():
    csr = fixtures.tridiagonal(9)  # 9 = 3*3 square but has wrapping W/E entries
    with pytest.raises(ValueError):
        formats.csr_to_stencil5(csr, grid_size=3)


def test_stencil5_nonconstant_coefficients():
    st = generate.make_stencil5(6)
    st.planes[2, 3, 3] = 17.0  # perturb one diagonal entry
    csr = formats.stencil5_to_csr(st)
    st2 = formats.csr_to_stencil5(csr)
    assert st2.constant is None
    np.testing.assert_array_equal(st2.planes, st.planes)


def test_int64_indices():
    csr = fixtures.identity(4)
    assert csr.row_ptr.dtype == np.int64
    assert csr.col_idx.dtype == np.int64


def test_coo_validate_rejects_out_of_range():
    with pytest.raises(ValueError):
        COOMatrix(2, 2, np.array([0, 5]), np.array([0, 1]), np.ones(2)).validate()


def test_stencil5_to_dia_matches_csr_path():
    """Direct O(n) plane→DIA pack ≡ the O(nnz) stencil5→CSR→DIA path (values and layout),
    for constant-coefficient, planes-carrying, and non-constant operands."""
    from tpusparse import formats, generate

    rng = np.random.RandomState(7)
    for g, variant in [(2, "const"), (5, "planes"), (8, "random"), (13, "const")]:
        if variant == "const":
            st = formats.Stencil5(grid_size=g, planes=None, constant=(5.0, -1.0))
            st_csr = generate.make_stencil5(g)  # host planes for the CSR path
        elif variant == "planes":
            st = generate.make_stencil5(g)
            st_csr = st
        else:
            st = generate.make_stencil5(g)
            pl = np.array(st.planes)
            mask = pl != 0.0
            pl[mask] = rng.randn(mask.sum())
            st = formats.Stencil5(grid_size=g, planes=pl, constant=None)
            st_csr = st
        d1 = formats.stencil5_to_dia(st)
        d2 = formats.csr_to_dia(formats.stencil5_to_csr(st_csr))
        np.testing.assert_array_equal(d1.offsets, d2.offsets)
        np.testing.assert_allclose(d1.data, d2.data, rtol=0, atol=0)
        assert d1.num_rows == d2.num_rows == g * g


def test_stencil5_to_dia_g1_degenerate():
    from tpusparse import formats, generate

    st = generate.make_stencil5(1)
    d = formats.stencil5_to_dia(st)
    assert d.num_rows == 1 and float(d.data[d.offsets.tolist().index(0)][0]) == 5.0


def test_stencil5_to_ell_matches_csr_path():
    """Direct O(n) plane→ELL pack ≡ csr_to_ell(stencil5_to_csr(...)) bit-for-bit,
    including the window-friendly pad policy, for constant and zero-carrying planes."""
    from tpusparse import formats, generate

    rng = np.random.RandomState(11)
    cases = []
    for g in (1, 2, 3, 5, 8, 13):
        cases.append(generate.make_stencil5(g))
    st = generate.make_stencil5(6)
    pl = np.array(st.planes)
    nzpos = np.argwhere(pl != 0.0)
    drop = nzpos[rng.choice(len(nzpos), size=len(nzpos) // 4, replace=False)]
    pl[tuple(drop.T)] = 0.0  # interior zeros: rows shrink below width 5
    cases.append(formats.Stencil5(grid_size=6, planes=pl, constant=None))
    for st in cases:
        e1 = formats.stencil5_to_ell(st)
        e2 = formats.csr_to_ell(formats.stencil5_to_csr(st))
        assert e1.width == e2.width, (st.grid_size, e1.width, e2.width)
        np.testing.assert_array_equal(e1.col, e2.col)
        np.testing.assert_allclose(e1.val, e2.val, rtol=0, atol=0)


def test_stencil5_const_to_ell_analytic_matches_general():
    """The planes-free analytic ELL (gen:<g> CLI path) ≡ the general masked path
    bit-for-bit: same columns, values, width, and boundary pad policy."""
    from tpusparse import formats, generate

    for g in (3, 4, 7, 16, 33):
        st_free = formats.Stencil5(grid_size=g, planes=None, constant=(5.0, -1.0))
        e1 = formats.stencil5_to_ell(st_free)  # analytic fast path
        e2 = formats.stencil5_to_ell(generate.make_stencil5(g, dtype=np.float32))
        assert e1.width == e2.width == 5
        np.testing.assert_array_equal(e1.col, e2.col)
        np.testing.assert_allclose(e1.val, e2.val, rtol=0, atol=0)
        assert e1.val.dtype == e2.val.dtype == np.float32
    # degenerate coefficients / tiny grids take the general path (same results)
    for g, const in ((2, (5.0, -1.0)), (1, (5.0, -1.0)), (4, (5.0, 0.0))):
        st_free = formats.Stencil5(grid_size=g, planes=None, constant=const)
        e1 = formats.stencil5_to_ell(st_free)
        e2 = formats.csr_to_ell(
            formats.stencil5_to_csr(generate.make_stencil5(g, *const,
                                                           dtype=np.float32)))
        assert e1.width == e2.width
        np.testing.assert_array_equal(e1.col, e2.col)
        np.testing.assert_allclose(e1.val, e2.val, rtol=0, atol=0)
