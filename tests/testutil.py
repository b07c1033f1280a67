"""Shared test assertion helpers.

Counterpart of the reference's internal/testutil (helpers.go:25-39):
symmetry and finiteness assertions plus tolerance constants.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SYMMETRY_TOL = 1e-12
DEFAULT_DC_TOL = 1e-3


def assert_symmetric(arr, tol: float = DEFAULT_SYMMETRY_TOL, msg: str = ""):
    """Assert arr equals its reverse within tol (helpers.go:25-37)."""
    arr = np.asarray(arr)
    err = np.max(np.abs(arr - arr[::-1])) if len(arr) else 0.0
    assert err <= tol, f"array not symmetric (max err {err:.3e}) {msg}"


def assert_no_nan_or_inf(arr, msg: str = ""):
    """Assert every element is finite (helpers.go:39)."""
    arr = np.asarray(arr)
    assert np.all(np.isfinite(arr)), f"array contains NaN/Inf {msg}"
