"""Pallas TPU kernel for separable upfirdn2d.

The flagship kernel of the port (SURVEY.md §2.2): the reference implements
upfirdn2d as a hand-written CUDA plugin; the default path here is one dilated
depthwise XLA conv (ops/upfirdn2d.py). This Pallas version exists for the
cases where explicit control wins: the filter is separable (StyleGAN2's
[1,3,3,1] binomial), so the 2-D FIR factorizes into two 1-D passes that stay
VMEM-resident per tile — each pass is a static-unrolled k-tap shift-and-add
on the VPU instead of a 16-tap dilated conv window.

Kernel strategy (per 1-D pass along the row axis of a (rows, cols) tile):
    1. zero-insert rows by ``up`` (an interleave = stack + reshape, no gather),
    2. pad rows (compile-time constants; negative pad = crop),
    3. k static shift-multiply-adds with scalar taps,
    4. keep every ``down``-th row (a reshape + slice).
The horizontal pass runs on the W axis via a transpose around the kernel
(XLA transposes are cheap relative to the FIR); channels stay on the lane
dimension throughout.

Correctness oracle: ops/upfirdn2d.upfirdn2d (tested against the numpy
reference); this kernel is tested for exact agreement on the generator's
resampling configurations.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viscoin_tpu.ops.upfirdn2d import _pair, parse_padding


def _fir1d_kernel(x_ref, o_ref, *, taps, up, down, p0, p1, out_len):
    x = x_ref[0]  # (rows, cols)
    rows, cols = x.shape

    # 1. zero-insert (interleave with zero rows; trailing zeros included).
    if up > 1:
        parts = [x] + [jnp.zeros_like(x)] * (up - 1)
        xz = jnp.stack(parts, axis=1).reshape(rows * up, cols)
    else:
        xz = x

    # 2. pad / crop rows (static).
    if p0 > 0 or p1 > 0:
        xz = jnp.pad(xz, ((max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0:
        xz = xz[-p0:]
    if p1 < 0:
        xz = xz[: xz.shape[0] + p1]

    # 3. k-tap FIR: static shift-and-add.
    k = len(taps)
    full = xz.shape[0] - k + 1
    acc = taps[0] * xz[0:full]
    for j in range(1, k):
        acc = acc + taps[j] * xz[j : j + full]

    # 4. downsample rows (pad to a multiple of `down` before the reshape).
    if down > 1:
        need = out_len * down
        if acc.shape[0] < need:
            acc = jnp.pad(acc, ((0, need - acc.shape[0]), (0, 0)))
        acc = acc[:need].reshape(out_len, down, cols)[:, 0]
    o_ref[0] = acc[:out_len].astype(o_ref.dtype)


def _fir1d(x: jax.Array, taps: tuple[float, ...], up: int, down: int,
           p0: int, p1: int, col_tile: int = 512) -> jax.Array:
    """Apply the 1-D FIR along axis 1 of (B, rows, cols)."""
    B, rows, cols = x.shape
    out_len = (rows * up + p0 + p1 - len(taps)) // down + 1
    assert out_len > 0

    # Pad the trailing (lane-tiled) dim to the tile size.
    ct = min(col_tile, cols)
    pad_cols = (-cols) % ct
    if pad_cols:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_cols)))
    padded_cols = cols + pad_cols

    kernel = functools.partial(
        _fir1d_kernel, taps=taps, up=up, down=down, p0=p0, p1=p1, out_len=out_len
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, out_len, padded_cols), x.dtype),
        grid=(B, padded_cols // ct),
        in_specs=[
            pl.BlockSpec((1, rows, ct), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_len, ct), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x)
    if pad_cols:
        out = out[:, :, :cols]
    return out


def upfirdn2d_pallas(
    x: jax.Array,
    f: jax.Array | np.ndarray | list,
    *,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    padding: int | tuple = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Separable upfirdn2d via two Pallas 1-D FIR passes.

    ``f`` must be 1-D separable taps (e.g. setup_filter's source [1,3,3,1],
    normalized here). Semantics identical to :func:`ops.upfirdn2d.upfirdn2d`
    with ``jnp.outer(f, f)``."""
    assert x.ndim == 4, "expected NHWC input"
    upy, upx = _pair(up)
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = parse_padding(padding)

    taps = np.asarray(f, np.float64).reshape(-1)
    taps = taps / taps.sum()  # per-axis normalize == setup_filter's 2-D normalize
    if not flip_filter:
        taps = taps[::-1]
    # Split the overall gain evenly between the two passes.
    g = math.sqrt(gain)
    taps_y = tuple(float(t) * g for t in taps)
    taps_x = tuple(float(t) * g for t in taps)

    B, H, W, C = x.shape
    # Vertical pass: rows = H, cols = W*C.
    y = _fir1d(x.reshape(B, H, W * C), taps_y, upy, downy, pady0, pady1)
    H2 = y.shape[1]
    y = y.reshape(B, H2, W, C)
    # Horizontal pass: transpose W to the row axis.
    y = jnp.swapaxes(y, 1, 2).reshape(B, W, H2 * C)
    y = _fir1d(y, taps_x, upx, downx, padx0, padx1)
    W2 = y.shape[1]
    return jnp.swapaxes(y.reshape(B, W2, H2, C), 1, 2)
