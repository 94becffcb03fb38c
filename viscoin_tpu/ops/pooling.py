"""2x2/stride-2 max pooling with an index-mask backward.

XLA differentiates ``reduce_window`` max pooling with ``select-and-scatter``,
which re-reads the full-resolution forward activation and runs a windowed
scatter — measured 8 ms/step across the VGG pools of the LPIPS backward on
v5e (the largest non-conv op in the train-step profile). For the 2x2
non-overlapping pools of VGG16 the backward is expressible exactly as
elementwise selection: save a 2-bit argmax index per output pixel in the
forward (as u8), and in the backward route the cotangent to the argmax
position with a broadcast compare — no scatter, no re-read of the
activations, and the whole backward fuses into neighboring elementwise work.

Tie-breaking: the FIRST maximum in row-major window order wins (like
torch.nn.functional.max_pool2d and XLA's select-and-scatter with GE-select).

Reference context: the LPIPS VGG backbone (viscoin/training/losses.py:104-122
uses pip lpips' VGG16) — pooling semantics are torch MaxPool2d(2, 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool_candidates(x: jax.Array):
    """The 4 window candidates in row-major order, each (B, H/2, W/2, C)."""
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
        f"max_pool_2x2 requires even spatial dims, got {x.shape}"
    )
    return (
        x[:, 0::2, 0::2, :],
        x[:, 0::2, 1::2, :],
        x[:, 1::2, 0::2, :],
        x[:, 1::2, 1::2, :],
    )


@jax.custom_vjp
def max_pool_2x2(x: jax.Array) -> jax.Array:
    """Max pool with window 2x2, stride 2, VALID padding (NHWC, even H/W)."""
    c = _pool_candidates(x)
    return jnp.maximum(jnp.maximum(c[0], c[1]), jnp.maximum(c[2], c[3]))


def _fwd(x: jax.Array):
    c = _pool_candidates(x)
    m = c[0]
    idx = jnp.zeros(m.shape, jnp.uint8)
    for k in (1, 2, 3):
        upd = c[k] > m  # strict: ties keep the earlier (row-major) index
        m = jnp.where(upd, c[k], m)
        idx = jnp.where(upd, jnp.uint8(k), idx)
    return m, idx


def _bwd(idx, g):
    B, H2, W2, C = idx.shape
    H, W = 2 * H2, 2 * W2
    # Expand g and idx back to the input grid (pure broadcasts, no scatter):
    # out[b, 2i+a, 2j+b2, c] = g[b, i, j, c] * (idx[b, i, j, c] == a*2 + b2).
    g_up = jnp.broadcast_to(
        g[:, :, None, :, None, :], (B, H // 2, 2, W // 2, 2, C)
    ).reshape(B, H, W, C)
    idx_up = jnp.broadcast_to(
        idx[:, :, None, :, None, :], (B, H // 2, 2, W // 2, 2, C)
    ).reshape(B, H, W, C)
    row_par = (jax.lax.broadcasted_iota(jnp.uint8, (1, H, 1, 1), 1) % 2) * 2
    col_par = jax.lax.broadcasted_iota(jnp.uint8, (1, 1, W, 1), 2) % 2
    pos = row_par + col_par
    d = jnp.where(idx_up == pos, g_up, jnp.zeros((), g.dtype))
    return (d,)


max_pool_2x2.defvjp(_fwd, _bwd)
