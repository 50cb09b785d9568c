"""Matrix Market I/O.

Parity with the reference's reader (src/io/io.cu:73-310):
  - header sniffing distinguishes ``general`` vs ``symmetric`` (read_matrix_type, io.cu:32-62)
  - a ``% STENCIL_GRID_SIZE <g>`` comment is parsed into ``grid_size`` (io.cu:130-132)
  - entries are 1-based on disk, converted to 0-based in memory (io.cu:153-166)
  - symmetric files store the lower triangle; we expand to the full matrix
    (read_matrix_symtogen, io.cu:189-310)

The hot path (parsing ~10⁹ ASCII lines for big grids) is the one place the reference's C
implementation genuinely matters, so the same role is played here by the native C++ extension in
csrc/ (used automatically when built); the numpy fallback below is correct but slower.
"""

from __future__ import annotations

import numpy as np

from . import native
from .formats import COOMatrix


def read_matrix_type(path: str) -> str:
    """Return 'general' or 'symmetric' from the banner (reference io.cu:32-62)."""
    with open(path, "r") as f:
        banner = f.readline()
    if not banner.startswith("%%MatrixMarket"):
        raise ValueError(f"{path}: missing MatrixMarket banner")
    toks = banner.lower().split()
    if "matrix" not in toks or "coordinate" not in toks:
        raise ValueError(f"{path}: only 'matrix coordinate' files are supported")
    # 'complex' files would silently drop imaginary parts and 'pattern' files have no value
    # column — reject loudly instead of loading a wrong matrix (reference supports real only)
    if not ("real" in toks or "integer" in toks):
        raise ValueError(f"{path}: unsupported field type in banner (need real/integer): "
                         f"{banner.strip()}")
    if "symmetric" in toks:
        return "symmetric"
    if "general" in toks:
        return "general"
    raise ValueError(f"{path}: unsupported symmetry qualifier in banner: {banner.strip()}")


def _read_header(f):
    """Consume comment lines, extracting STENCIL_GRID_SIZE; return (rows, cols, nnz, grid)."""
    grid_size = 0
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF before size line")
        if line.startswith("%"):
            if "STENCIL_GRID_SIZE" in line:
                grid_size = int(line.split()[-1])
            continue
        parts = line.split()
        if len(parts) != 3:
            raise ValueError(f"malformed size line: {line.strip()}")
        return int(parts[0]), int(parts[1]), int(parts[2]), grid_size


def load_matrix_market(path: str) -> COOMatrix:
    """Load a .mtx file into COO (reference load_matrix_market, io.cu:73-93).

    Symmetric files are expanded: every off-diagonal (i, j) also yields (j, i)
    (reference read_matrix_symtogen io.cu:189-310 builds full CSR; we expand in COO and let
    coo_to_csr sort)."""
    kind = read_matrix_type(path)
    if native.available():
        rows, cols, r, c, v, grid = native.read_mtx(path)
    else:
        with open(path, "r") as f:
            f.readline()  # banner
            rows, cols, nnz, grid = _read_header(f)
            data = np.loadtxt(f, dtype=np.float64, ndmin=2, comments="%")
        if data.size == 0:
            data = np.zeros((0, 3))
        if data.shape[0] != nnz:
            raise ValueError(f"{path}: header promises {nnz} entries, found {data.shape[0]}")
        r = data[:, 0].astype(np.int64) - 1
        c = data[:, 1].astype(np.int64) - 1
        v = data[:, 2].astype(np.float64)
    if kind == "symmetric":
        off = r != c
        r, c = np.concatenate([r, c[off]]), np.concatenate([c, r[off]])
        v = np.concatenate([v, v[off]])
    coo = COOMatrix(num_rows=rows, num_cols=cols, row=r, col=c, val=v, grid_size=grid)
    coo.validate()
    return coo


def write_matrix_market(path: str, coo: COOMatrix) -> None:
    """Write a general COO matrix, 1-based, with the STENCIL_GRID_SIZE comment when known."""
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if coo.grid_size:
            f.write(f"% STENCIL_GRID_SIZE {coo.grid_size}\n")
        f.write(f"{coo.num_rows} {coo.num_cols} {coo.nnz}\n")
        for chunk in range(0, coo.nnz, 1 << 20):
            sl = slice(chunk, min(chunk + (1 << 20), coo.nnz))
            lines = [
                f"{rr} {cc} {vv:.17g}\n"
                for rr, cc, vv in zip(
                    (coo.row[sl] + 1).tolist(), (coo.col[sl] + 1).tolist(),
                    coo.val[sl].tolist(),
                )
            ]
            f.write("".join(lines))
