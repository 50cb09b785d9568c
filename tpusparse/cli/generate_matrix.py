"""Stencil matrix generator CLI.

Parity with the reference's ``generate_matrix`` (src/matrix/generate_matrix.cu:35-44):

    python -m tpusparse.cli.generate_matrix <grid_dim> <output.mtx> [--diag D] [--offdiag O]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="generate_matrix", description=__doc__)
    p.add_argument("grid_dim", type=int)
    p.add_argument("output")
    p.add_argument("--diag", type=float, default=5.0)
    p.add_argument("--offdiag", type=float, default=-1.0)
    args = p.parse_args(argv)
    if args.grid_dim < 1:
        print("[ERROR] grid_dim must be >= 1", file=sys.stderr)
        return 2
    from .. import generate

    t0 = time.perf_counter()
    nnz = generate.write_matrix_market_stencil5(
        args.output, args.grid_dim, args.diag, args.offdiag
    )
    dt = time.perf_counter() - t0
    n = args.grid_dim * args.grid_dim
    print(f"[OK] wrote {args.output}: {n}x{n}, nnz={nnz} ({dt:.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
