"""Width-paired 3x3 convolution — full-MXU-lane form for 64-channel convs.

Motivation (TPU): a stride-1 3x3 conv with 64 output channels lowers to a
matmul whose lane dimension is 64 — half of the 128-wide MXU. On the profiled
train step the VGG block-1 backward (64-lane and 3-lane conv VJPs fused,
``d loss/d image``) ran at 61 TF/s while neighboring 128-channel convs hit
175-190 TF/s. This module rewrites such convs exactly by packing two
horizontally adjacent pixels into the channel dimension, so the conv becomes a
(3, 2) window over "pixel pairs" with 2C input and 2K output channels — 128
lanes for C = K = 64 — at 4/3 the dense MACs (a 2x lane win nets ~1.5x, and
the *backward* conv VJPs inherit the full-lane shapes too).

Layout vocabulary for an array u of even width W:

* aligned pairs:  A[j] = (u[2j], u[2j+1]),   j = 0..W/2-1        (W/2 pairs)
* offset pairs:   O[j] = (u[2j-1], u[2j]),   j = 0..W/2          (W/2+1
  pairs, with virtual zeros u[-1] = u[W] = 0 — the conv's zero padding)

In NHWC row-major, aligned re-pairing is a pure reshape: (B, H, W, C) <->
(B, H, W/2, 2C) touches no bytes. A same-padded 3x3 conv maps

    aligned input  --conv--> offset output     (``conv3x3_aligned_to_offset``)
    offset input   --conv--> aligned output    (``conv3x3_offset_to_aligned``)

so chaining two convs (e.g. VGG conv1_1 -> relu -> conv1_2) stays in paired
layout throughout, and the final aligned-paired output un-pairs for free.

Tap algebra (both directions reduce to the same kernel scatter): for output
phase p, input s2d position s and input phase q, the original tap index is
``v = 2s + q - p`` (valid when 0 <= v <= 2, zero otherwise), giving the
(3, 2, 2C, 2K) kernel

    K2[h, s, q*C + c, p*K + k] = w[h, v, c, k].

Used by :class:`viscoin_tpu.models.lpips.VGG16Features` (block 1). Replaces
nothing in the reference — the reference's cuDNN picks NCHW kernels where
this problem does not arise in the same form; this is the TPU-first
equivalent of choosing a hardware-friendly algorithm for the same math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pair_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, C, K) HWIO kernel -> (3, 2, 2C, 2K) width-paired kernel."""
    kh, kw, C, K = w.shape
    assert (kh, kw) == (3, 3), "width pairing is specialized to 3x3 kernels"
    out = jnp.zeros((3, 2, 2 * C, 2 * K), w.dtype)
    for s in (0, 1):
        for q in (0, 1):
            for p in (0, 1):
                v = 2 * s + q - p
                if 0 <= v <= 2:
                    out = out.at[:, s, q * C:(q + 1) * C, p * K:(p + 1) * K].set(w[:, v])
    return out


def _conv(x, k2, width_padding):
    return lax.conv_general_dilated(
        x, k2,
        window_strides=(1, 1),
        padding=((1, 1), width_padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_aligned_to_offset(x_pairs: jax.Array, w: jax.Array) -> jax.Array:
    """Same-padded 3x3 conv, aligned-paired input -> offset-paired output.

    Args:
        x_pairs: (B, H, W/2, 2C) aligned pairs of the (B, H, W, C) input
            (a free reshape of NHWC).
        w: (3, 3, C, K) original HWIO kernel.

    Returns:
        (B, H, W/2 + 1, 2K) offset pairs of the conv output. Entries
        [..., 0, :K] and [..., -1, K:] correspond to the virtual columns
        -1 and W; they hold conv values extrapolated over the zero padding
        and MUST be masked to zero (see :func:`offset_phantom_mask`) before
        feeding a downstream offset-input conv, which expects true zeros
        there.
    """
    # One zero pair of width padding on each side covers original columns
    # {-2, -1} and {W, W+1}; VALID would give W/2 - 1 outputs, SAME-style
    # (1, 1) pair padding gives the W/2 + 1 offset pairs.
    return _conv(x_pairs, pair_kernel(w), (1, 1))


def conv3x3_offset_to_aligned(x_offset: jax.Array, w: jax.Array) -> jax.Array:
    """Same-padded 3x3 conv, offset-paired input -> aligned-paired output.

    Args:
        x_offset: (B, H, W/2 + 1, 2C) offset pairs (virtual edge columns
            already zeroed).
        w: (3, 3, C, K) original HWIO kernel.

    Returns:
        (B, H, W/2, 2K) aligned pairs of the conv output — reshape to
        (B, H, W, K) is free in NHWC.
    """
    return _conv(x_offset, pair_kernel(w), (0, 0))


def offset_phantom_mask(shape: tuple[int, ...], channels: int, dtype) -> jax.Array:
    """Multiplicative mask zeroing the two phantom edge entries of an
    offset-paired array of ``shape`` (B, H, W/2+1, 2C): column 0 phase 0
    (= original column -1) and column W/2 phase 1 (= original column W).

    Built from iotas so it stays a fused elementwise op (no weight-sized
    constants in the HLO payload)."""
    _, _, wp, c2 = shape
    col = lax.broadcasted_iota(jnp.int32, (wp, c2), 0)
    ch = lax.broadcasted_iota(jnp.int32, (wp, c2), 1)
    phantom = ((col == 0) & (ch < channels)) | ((col == wp - 1) & (ch >= channels))
    return jnp.where(phantom, 0, 1).astype(dtype)[None, None]


def max_pool_2x2_aligned(x_pairs: jax.Array) -> jax.Array:
    """2x2/2 max pool of a (B, H, W/2, 2C) aligned-paired array.

    The pool's column pairs coincide with the aligned pairs, so pooling is a
    plain reduce-max over two free-reshape axes (H -> H/2 x 2 and 2C -> 2 x C)
    — no windowed reduce, and the VJP is a fused compare-select rather than a
    select-and-scatter (strided-slice maxima were measured slower: their VJP
    is a scatter-add). Returns (B, H/2, W/2, C) in standard layout."""
    b, h, wp, c2 = x_pairs.shape
    c = c2 // 2
    return jnp.max(x_pairs.reshape(b, h // 2, 2, wp, 2, c), axis=(2, 4))
