"""ctypes bindings for the native C++ I/O core (csrc/mtxio.cpp).

The reference implements its entire host layer (Matrix Market parsing, the stencil writer, the
COO→sorted-CSR build) in C (src/io/io.cu, src/spmv/spmv_cusparse_csr.cu:62-170) because parsing
10⁹ ASCII lines in a slow language is a real bottleneck at 20k×20k.  The same role is played
here by ``csrc/mtxio.cpp`` (build: ``make -C csrc``); every caller degrades gracefully to the
numpy implementations when the shared library has not been built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "csrc", "libmtxio.so")


def _try_build() -> bool:
    """Build the shared library in place on first use (``make -C csrc``).  Opt out with
    TPUSPARSE_NO_NATIVE_BUILD=1; all callers fall back to numpy implementations on failure."""
    if os.environ.get("TPUSPARSE_NO_NATIVE_BUILD") == "1":
        return False
    import subprocess

    csrc = os.path.dirname(os.path.abspath(_lib_path()))
    if not os.path.exists(os.path.join(csrc, "mtxio.cpp")):
        return False
    try:
        subprocess.run(
            ["make", "-C", csrc, "libmtxio.so"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    src = os.path.join(os.path.dirname(path), "mtxio.cpp")
    stale = (
        os.path.exists(path) and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(path)
    )
    if (not os.path.exists(path) or stale) and not _try_build():
        if stale:
            return None  # refuse to load a .so older than its source
        return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # int64 mtx_count(const char* path, int64* rows, int64* cols, int64* nnz, int64* grid)
    lib.mtx_read_header.restype = ctypes.c_int
    lib.mtx_read_header.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int64)] * 4
    lib.mtx_read_entries.restype = ctypes.c_int64
    lib.mtx_read_entries.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.mtx_write_stencil5.restype = ctypes.c_int64
    lib.mtx_write_stencil5.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_double,
    ]
    lib.coo_to_csr_sorted.restype = ctypes.c_int
    lib.coo_to_csr_sorted.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_mtx(path: str):
    """Fast path reader: returns (rows, cols, r, c, v, grid) with 0-based indices."""
    lib = _load()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    grid = ctypes.c_int64()
    rc = lib.mtx_read_header(
        path.encode(), ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(nnz),
        ctypes.byref(grid),
    )
    if rc != 0:
        raise ValueError(f"{path}: native header parse failed (rc={rc})")
    n = nnz.value
    r = np.empty(n, dtype=np.int64)
    c = np.empty(n, dtype=np.int64)
    v = np.empty(n, dtype=np.float64)
    got = lib.mtx_read_entries(path.encode(), n, r, c, v)
    if got != n:
        raise ValueError(f"{path}: header promises {n} entries, native reader found {got}")
    return rows.value, cols.value, r, c, v, grid.value


def write_stencil5_mtx(path: str, grid_size: int, diag: float, offdiag: float) -> int:
    lib = _load()
    nnz = lib.mtx_write_stencil5(path.encode(), grid_size, diag, offdiag)
    if nnz < 0:
        raise IOError(f"native stencil writer failed for {path}")
    return int(nnz)


def coo_to_csr_sorted(num_rows: int, r, c, v):
    """Native COO→CSR with per-row column sort.  Returns (row_ptr, col_idx, val)."""
    lib = _load()
    nnz = r.shape[0]
    row_ptr = np.zeros(num_rows + 1, dtype=np.int64)
    col_idx = np.empty(nnz, dtype=np.int64)
    val = np.empty(nnz, dtype=np.float64)
    rc = lib.coo_to_csr_sorted(
        num_rows, nnz,
        np.ascontiguousarray(r, np.int64),
        np.ascontiguousarray(c, np.int64),
        np.ascontiguousarray(v, np.float64),
        row_ptr, col_idx, val,
    )
    if rc != 0:
        raise ValueError(f"native coo_to_csr failed (rc={rc})")
    return row_ptr, col_idx, val
