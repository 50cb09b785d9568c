"""Programmatic matrix fixtures with known analytical structure.

Parity with the reference's fixture library (tests/helpers/matrix_fixtures.{hpp,cpp}:
identity, scaled diagonal, tridiagonal (-1, 2, -1), upper-triangular, 5-point stencil, banded,
random-sparse (seeded), unbalanced-rows — SURVEY.md §4 item 3)."""

from __future__ import annotations

import numpy as np

from tpusparse.formats import COOMatrix, coo_to_csr


def identity(n: int):
    i = np.arange(n, dtype=np.int64)
    return coo_to_csr(COOMatrix(n, n, i, i, np.ones(n)))


def diagonal(values):
    values = np.asarray(values, dtype=np.float64)
    n = values.shape[0]
    i = np.arange(n, dtype=np.int64)
    return coo_to_csr(COOMatrix(n, n, i, i, values))


def tridiagonal(n: int, lo=-1.0, mid=2.0, hi=-1.0):
    r = [np.arange(n), np.arange(1, n), np.arange(n - 1)]
    c = [np.arange(n), np.arange(n - 1), np.arange(1, n)]
    v = [np.full(n, mid), np.full(n - 1, lo), np.full(n - 1, hi)]
    return coo_to_csr(
        COOMatrix(
            n, n,
            np.concatenate(r).astype(np.int64),
            np.concatenate(c).astype(np.int64),
            np.concatenate(v),
        )
    )


def upper_triangular(n: int, seed=7):
    rs = np.random.RandomState(seed)
    rows, cols = np.triu_indices(n)
    vals = rs.randn(rows.shape[0])
    return coo_to_csr(COOMatrix(n, n, rows.astype(np.int64), cols.astype(np.int64), vals))


def banded(n: int, bandwidth: int, seed=11):
    rs = np.random.RandomState(seed)
    rows, cols, vals = [], [], []
    for off in range(-bandwidth, bandwidth + 1):
        idx = np.arange(max(0, -off), min(n, n - off), dtype=np.int64)
        rows.append(idx)
        cols.append(idx + off)
        vals.append(rs.randn(idx.shape[0]))
    return coo_to_csr(
        COOMatrix(n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals))
    )


def random_sparse(n: int, density=0.05, seed=42):
    rs = np.random.RandomState(seed)
    nnz = max(1, int(n * n * density))
    rows = rs.randint(0, n, nnz).astype(np.int64)
    cols = rs.randint(0, n, nnz).astype(np.int64)
    # dedupe (keep first) to keep the dense oracle simple
    keys = rows * n + cols
    _, first = np.unique(keys, return_index=True)
    vals = rs.randn(first.shape[0])
    return coo_to_csr(COOMatrix(n, n, rows[first], cols[first], vals))


def ill_conditioned(n: int, cond: float = 1e12):
    """SPD diagonal with geometrically spaced eigenvalues spanning ``cond`` — the
    reference's ill-conditioned generator role (matrix_fixtures.hpp:38-141): stresses CG
    convergence behavior and the metrics' finite-tolerance assumptions.  κ(A) == cond
    exactly; the analytical solve of A x = ones is x_i = 1/d_i."""
    return diagonal(np.logspace(0.0, -np.log10(cond), n))


def dense_block(n: int, block: int, block_start: int = 0, seed=13):
    """Identity plus one dense ``block``×``block`` sub-block (reference dense-block
    fixture): the worst case for ELL width (block rows carry ``block`` nnz while the
    rest carry 1) and for the gather kernel's measured column windows."""
    rs = np.random.RandomState(seed)
    i = np.arange(n, dtype=np.int64)
    rows = [i]
    cols = [i]
    vals = [np.ones(n)]
    b0, b1 = block_start, block_start + block
    assert b1 <= n
    br, bc = np.meshgrid(np.arange(b0, b1), np.arange(b0, b1), indexing="ij")
    off_diag = br.ravel() != bc.ravel()  # keep the identity's diagonal unduplicated
    rows.append(br.ravel()[off_diag].astype(np.int64))
    cols.append(bc.ravel()[off_diag].astype(np.int64))
    vals.append(rs.randn(int(off_diag.sum())))
    return coo_to_csr(
        COOMatrix(n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals))
    )


def unbalanced_rows(n: int, heavy_every: int = 37, heavy_nnz: int = 40, seed=17):
    """Mostly 1-nnz rows with periodic HEAVY rows of ``heavy_nnz`` scattered nonzeros
    (reference unbalanced-rows fixture): the ELL pad ratio goes to ~heavy_nnz× and the
    per-subtile measured spans diverge wildly — exactly the shape that stresses the
    gather kernel's percentile-span/overflow machinery."""
    rs = np.random.RandomState(seed)
    i = np.arange(n, dtype=np.int64)
    rows = [i]
    cols = [i]
    vals = [np.ones(n)]
    for r in range(0, n, heavy_every):
        c = np.unique(rs.randint(0, n, heavy_nnz))
        c = c[c != r]
        rows.append(np.full(len(c), r, np.int64))
        cols.append(c.astype(np.int64))
        vals.append(rs.randn(len(c)))
    return coo_to_csr(
        COOMatrix(n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(vals))
    )


def ninepoint(g: int, diag: float = 8.0, offdiag: float = -1.0):
    """9-point stencil on a g×g grid (adds the 4 diagonal neighbors the 5-point lacks —
    reference 9-point fixture, matrix_fixtures.cpp:118-180).  SPD for diag > 8·|offdiag|
    is not guaranteed, but diag=8, offdiag=-1 is weakly diagonally dominant and the
    expected checksum Σ_r (diag + offdiag·#neighbors(r)) is analytic.  NOT
    stencil5-extractable: exercises the generic (gather/DIA) paths with 9 diagonals."""
    rows, cols, vals = [], [], []
    i, j = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    r = (i * g + j).ravel()
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ii, jj = i + di, j + dj
            ok = ((ii >= 0) & (ii < g) & (jj >= 0) & (jj < g)).ravel()
            rows.append(r[ok])
            cols.append((ii * g + jj).ravel()[ok])
            vals.append(np.full(int(ok.sum()),
                                diag if (di == 0 and dj == 0) else offdiag))
    return coo_to_csr(
        COOMatrix(g * g, g * g,
                  np.concatenate(rows).astype(np.int64),
                  np.concatenate(cols).astype(np.int64), np.concatenate(vals))
    )


def ninepoint_checksum(g: int, diag: float = 8.0, offdiag: float = -1.0) -> float:
    """Analytic Sum(A · ones) for the 9-point stencil: per row diag + offdiag·#neighbors;
    neighbor counts are 3/5/8 for corner/edge/interior points."""
    corners, edges, interior = 4, 4 * (g - 2), (g - 2) * (g - 2)
    return (g * g * diag
            + offdiag * (corners * 3 + edges * 5 + interior * 8))


def spd_stencil_csr(g: int, diag=5.0, offdiag=-1.0):
    from tpusparse.formats import stencil5_to_csr
    from tpusparse.generate import make_stencil5

    return stencil5_to_csr(make_stencil5(g, diag, offdiag))
