"""Test utilities — parity with the reference's helper library
(tests/helpers/cuda_test_utils.{hpp,cpp}, SURVEY.md §4 item 4):

  - input vector patterns ONES/ZEROS/INCREMENTAL/ALTERNATING/RANDOM_UNIFORM/RANDOM_NORMAL/
    SPARSE_RANDOM (hpp:35-43)
  - tolerance tiers strict(1e-12/1e-14) / standard(1e-10/1e-12) / relaxed(1e-8/1e-10) (:48-59)
  - detailed vector comparison with failed-element reporting (:84-96)
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np


class Pattern(enum.Enum):
    ONES = "ones"
    ZEROS = "zeros"
    INCREMENTAL = "incremental"
    ALTERNATING = "alternating"
    RANDOM_UNIFORM = "random_uniform"
    RANDOM_NORMAL = "random_normal"
    SPARSE_RANDOM = "sparse_random"


def make_input(n: int, pattern: Pattern, seed: int = 42, sparsity: float = 0.9) -> np.ndarray:
    rs = np.random.RandomState(seed)
    if pattern is Pattern.ONES:
        return np.ones(n)
    if pattern is Pattern.ZEROS:
        return np.zeros(n)
    if pattern is Pattern.INCREMENTAL:
        return np.arange(1.0, n + 1.0)
    if pattern is Pattern.ALTERNATING:
        return np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    if pattern is Pattern.RANDOM_UNIFORM:
        return rs.uniform(-1.0, 1.0, n)
    if pattern is Pattern.RANDOM_NORMAL:
        return rs.randn(n)
    if pattern is Pattern.SPARSE_RANDOM:
        v = rs.randn(n)
        v[rs.uniform(size=n) < sparsity] = 0.0
        return v
    raise ValueError(pattern)


# (rtol, atol) tiers — reference cuda_test_utils.hpp:48-59
TOLERANCE_TIERS = {
    "strict": (1e-12, 1e-14),
    "standard": (1e-10, 1e-12),
    "relaxed": (1e-8, 1e-10),
    "f32": (2e-5, 2e-6),
}


@dataclasses.dataclass
class CompareResult:
    passed: bool
    max_abs_err: float
    max_rel_err: float
    num_failed: int
    first_failures: list  # [(index, got, expected), ...] up to 5


def compare_vectors(got, expected, tier: str = "standard") -> CompareResult:
    """Detailed comparison with failed-element reporting (reference :84-96)."""
    rtol, atol = TOLERANCE_TIERS[tier]
    got = np.asarray(got, np.float64).ravel()
    expected = np.asarray(expected, np.float64).ravel()
    assert got.shape == expected.shape
    abs_err = np.abs(got - expected)
    # rel error is undefined where expected == 0: report 0 there (abs_err still judges it)
    denom = np.where(expected != 0, np.abs(expected), np.inf)
    rel_err = abs_err / denom
    ok = abs_err <= atol + rtol * np.abs(expected)
    failed = np.flatnonzero(~ok)
    return CompareResult(
        passed=failed.size == 0,
        max_abs_err=float(abs_err.max()) if abs_err.size else 0.0,
        max_rel_err=float(rel_err.max()) if rel_err.size else 0.0,
        num_failed=int(failed.size),
        first_failures=[
            (int(i), float(got[i]), float(expected[i])) for i in failed[:5]
        ],
    )
