"""Metrics (reference: viscoin/utils/metrics.py)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_matching(original, rebuilt) -> float:
    """Fraction of rows whose best cosine match is their own pair — compared
    BY VALUE, like the reference (metrics.py:34), so ties count as matches."""
    assert original.shape == rebuilt.shape and original.ndim == 2

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    sims = norm(original) @ norm(rebuilt).T  # (n, n)
    highest = jnp.max(sims, axis=1)
    diagonal = jnp.diagonal(sims)
    return float(jnp.mean((highest == diagonal).astype(jnp.float32)))
