"""upfirdn2d — zero-insert upsample, pad, 2D FIR filter, downsample.

TPU-native replacement for the reference's flagship CUDA plugin
(`stylegan2_ada/torch_utils/ops/upfirdn2d.{cpp,cu,py}`, SURVEY.md §2.2): the
core of StyleGAN2's aliasing-free resampling.

Semantics (identical to the reference op, but in NHWC — the TPU-native layout
where channels ride the 128-wide lane dimension):

    1. upsample `x` by zero insertion: every pixel is followed by ``up - 1``
       zeros (including at the trailing edge), giving ``H * up`` rows.
    2. pad with zeros: ``(pad_y0, pad_y1, pad_x0, pad_x1)``; negative = crop.
    3. convolve with the 2-D FIR filter ``f`` (true convolution, i.e. the
       filter is flipped; pass ``flip_filter=True`` for correlation), scaled
       by ``gain``.
    4. downsample by keeping every ``down``-th sample, starting at 0.

The implementation lowers the whole pipeline to ONE
:func:`jax.lax.conv_general_dilated` call: zero-insertion is ``lhs_dilation``
(with ``up - 1`` folded into the trailing pad, since XLA dilation has no
trailing zeros), padding rides the conv padding (XLA supports negative
padding), the FIR filter is a depthwise (``feature_group_count = C``) kernel,
and downsampling is the window stride. XLA fuses this into a single VPU loop
— there is no separate "plugin" to compile, which is the point of the
TPU-first design.

A custom VJP is unnecessary: the transpose of upfirdn2d is another
upfirdn2d (flipped filter, swapped up/down), and XLA's conv transpose rule
derives exactly that.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def setup_filter(
    f,
    *,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: bool | None = None,
) -> jax.Array:
    """Prepare a FIR filter for upfirdn2d (reference: upfirdn2d.py::setup_filter).

    Args:
        f: filter taps — scalar, 1-D (interpreted as separable outer product),
           or 2-D. ``None`` means identity (single tap of 1).
        normalize: scale so taps sum to 1.
        flip_filter: pre-flip the filter.
        gain: overall scaling factor.
        separable: kept for API parity; the returned filter is always the
           full 2-D tap grid (a 4-tap outer product is cheap on the VPU).
    """
    if f is None:
        f = 1.0
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 0:
        f = f[None]
    assert f.ndim in (1, 2)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=(0, 1))
    f = f * gain
    return f


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return int(v[0]), int(v[1])
    return int(v), int(v)


def parse_padding(padding) -> tuple[int, int, int, int]:
    """padding -> (pad_x0, pad_x1, pad_y0, pad_y1), reference convention."""
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    assert len(padding) == 4
    return tuple(int(p) for p in padding)


def upfirdn2d(
    x: jax.Array,
    f: jax.Array | None,
    *,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    padding: int | tuple = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Upsample, FIR filter, and downsample a batch of NHWC images.

    Args:
        x: (B, H, W, C) input.
        f: 2-D filter from :func:`setup_filter` (or 1-D separable taps, or
           ``None`` for identity).
        up, down: integer factors (or (y, x) pairs).
        padding: int, (x, y) or (x0, x1, y0, y1) — applied after upsampling.
        flip_filter: False = convolution (reference default), True = correlation.
        gain: output scaling.
    """
    assert x.ndim == 4, "expected NHWC input"
    upy, upx = _pair(up)
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    fh, fw = f.shape

    # True convolution = correlation with the flipped filter. lax conv does
    # correlation, so flip unless the caller asked for correlation.
    if not flip_filter:
        f = jnp.flip(f, axis=(0, 1))
    f = f * gain

    B, H, W, C = x.shape
    # Depthwise kernel: same taps for every channel. Computed in the input
    # dtype (a 16-tap normalized lowpass is well-conditioned in bf16; fp32
    # inputs keep fp32).
    kernel = jnp.broadcast_to(f[:, :, None, None], (fh, fw, 1, C)).astype(x.dtype)

    # Fold the reference's trailing zero-insertion zeros (up - 1 of them) into
    # the trailing pad: lhs_dilation yields (H-1)*up + 1 samples.
    pads = (
        (pady0, pady1 + (upy - 1)),
        (padx0, padx1 + (upx - 1)),
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=pads,
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample2d(x, f, *, up=2, padding=0, flip_filter=False, gain=1.0):
    """Upsample with the reference's padding convention
    (reference: upfirdn2d.py::upsample2d). Gain is multiplied by up**2 so a
    normalized filter preserves brightness."""
    upy, upx = _pair(up)
    f = jnp.asarray(f if f is not None else 1.0, jnp.float32)
    fh, fw = (f.shape[0], f.shape[-1]) if f.ndim else (1, 1)
    px0, px1, py0, py1 = parse_padding(padding)
    p = (
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, *, down=2, padding=0, flip_filter=False, gain=1.0):
    """Downsample with the reference's padding convention
    (reference: upfirdn2d.py::downsample2d)."""
    downy, downx = _pair(down)
    f = jnp.asarray(f if f is not None else 1.0, jnp.float32)
    fh, fw = (f.shape[0], f.shape[-1]) if f.ndim else (1, 1)
    px0, px1, py0, py1 = parse_padding(padding)
    p = (
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


# --------------------------------------------------------------------------- #
# Slow oracle for tests: direct zero-insert + pad + convolve + slice in numpy. #
# --------------------------------------------------------------------------- #


def upfirdn2d_ref(x, f, *, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Direct numpy realization of the documented semantics (test oracle)."""
    x = np.asarray(x, np.float64)
    upy, upx = _pair(up)
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    if f is None:
        f = np.ones((1, 1))
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)

    B, H, W, C = x.shape
    # 1. zero-insert (with trailing zeros, like the reference reshape+pad).
    z = np.zeros((B, H * upy, W * upx, C))
    z[:, ::upy, ::upx, :] = x
    # 2. pad / crop.
    z = np.pad(z, ((0, 0), (max(pady0, 0), max(pady1, 0)), (max(padx0, 0), max(padx1, 0)), (0, 0)))
    z = z[
        :,
        max(-pady0, 0) : z.shape[1] - max(-pady1, 0),
        max(-padx0, 0) : z.shape[2] - max(-padx1, 0),
        :,
    ]
    # 3. convolve (flip filter) or correlate.
    ff = f if flip_filter else f[::-1, ::-1]
    fh, fw = ff.shape
    Ho = z.shape[1] - fh + 1
    Wo = z.shape[2] - fw + 1
    out = np.zeros((B, Ho, Wo, C))
    for i in range(fh):
        for j in range(fw):
            out += ff[i, j] * z[:, i : i + Ho, j : j + Wo, :]
    out *= gain
    # 4. downsample.
    return out[:, ::downy, ::downx, :]
