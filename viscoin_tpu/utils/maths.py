"""Math utilities (reference: viscoin/utils/maths.py)."""

from __future__ import annotations

import numpy as np


def normalize(arr: np.ndarray, axis: int | None = None) -> np.ndarray:
    """Min-max normalize to [0, 1] (whole array, or per-axis).

    Constant slices map to 0 instead of NaN (the reference divides by zero
    here, viscoin/utils/maths.py:6-13 — fixed, like its other bugs)."""
    mn = arr.min(axis=axis, keepdims=True)
    mx = arr.max(axis=axis, keepdims=True)
    rng = mx - mn
    rng = np.where(rng == 0, 1, rng)
    return (arr - mn) / rng
