"""Math utilities (reference: viscoin/utils/maths.py)."""

from __future__ import annotations

import numpy as np


def normalize(arr: np.ndarray, axis: int | None = None) -> np.ndarray:
    """Min-max normalize to [0, 1] (whole array, or per-axis)."""
    mn = arr.min(axis=axis, keepdims=True)
    mx = arr.max(axis=axis, keepdims=True)
    return (arr - mn) / (mx - mn)
