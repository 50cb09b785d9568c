"""Shared kernel-wrapper compatibility helpers."""

from __future__ import annotations

import contextlib

import jax


def x64_off_for_32bit(*arrays):
    """Context that traces a Pallas call with x64 disabled when every operand is ≤32-bit.

    Mosaic on this stack fails to legalize even pure-f32 kernels when the surrounding trace
    runs in x64 mode (index/scalar types widen to 64-bit; verified on v5e: a trivial f32
    kernel fails with 'failed to legalize operation func.return' and compiles cleanly with
    x64 off).  64-bit operands (the CPU/interpret f64 suite) keep the ambient mode."""
    if jax.config.jax_enable_x64 and all(a.dtype.itemsize <= 4 for a in arrays):
        return jax.enable_x64(False)
    return contextlib.nullcontext()
