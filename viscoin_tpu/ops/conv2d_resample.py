"""2-D convolution with optional up/down resampling.

TPU-native equivalent of the reference's
`stylegan2_ada/torch_utils/ops/conv2d_resample.py` (SURVEY.md §2.2), which
composes the CUDA upfirdn2d plugin with (transposed/grouped) cuDNN convs.
Here the composition is upfirdn2d (one dilated depthwise XLA conv) followed by
a dense `lax.conv_general_dilated` that lands on the MXU. `jax.grad` handles
the transpose — the reference's `conv2d_gradfix` machinery is obsolete by
design in JAX.

Weight layout is HWIO (kh, kw, Ci, Co) and activations are NHWC: the
TPU-native layout with channels on the 128-wide lane dimension.

Semantics match the reference's generic path:
    - padding is adjusted by the resampling-filter halo,
    - up > 1: upfirdn2d(up, gain=up**2) then VALID conv,
    - down > 1: pad, conv, then FIR + stride-down.
``flip_weight=True`` performs correlation (torch conv2d semantics); the
StyleGAN2 up-convolution path passes ``flip_weight=False`` (true convolution,
the reference implements it via conv_transpose which flips the kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from viscoin_tpu.ops.upfirdn2d import parse_padding, upfirdn2d


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding="VALID",
    groups: int = 1,
    flip_weight: bool = True,
) -> jax.Array:
    """Plain NHWC/HWIO convolution (correlation unless flip_weight=False)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if (
        w.shape[0] == w.shape[1] == 1
        and stride == 1
        and groups == 1
        and padding in ("VALID", ((0, 0), (0, 0)))
    ):
        # 1x1 conv as a plain contraction (ToRGB/FromRGB layers): identical
        # math, but leaves XLA free to lay out the tiny-channel (RGB) side
        # without the convolution emitter's relayout.
        return jax.lax.dot_general(
            x, w[0, 0].astype(x.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
        )
    # No preferred_element_type override: a widened output dtype breaks the
    # conv transpose (VJP) dtype matching, and the TPU MXU already
    # accumulates bf16 convolutions in fp32 internally.
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    *,
    f: jax.Array | None = None,
    up: int = 1,
    down: int = 1,
    padding: int | tuple = 0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """Conv2d with optional up/downsampling through a FIR filter.

    Args:
        x: (B, H, W, C) input.
        w: (kh, kw, Ci // groups, Co) weights.
        f: resampling FIR filter from :func:`setup_filter` (only used when
           up > 1 or down > 1).
        up / down: integer resampling factors.
        padding: base conv padding (int or (x0, x1, y0, y1)).
        flip_weight: True = correlation (torch conv2d), False = convolution.
        flip_filter: passed through to upfirdn2d.
    """
    fh, fw = (1, 1) if f is None else (f.shape[0], f.shape[-1])
    px0, px1, py0, py1 = parse_padding(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
        if down > 1:  # down-halo stays in the pre-pad (matches the old chain)
            px0 += (fw - down + 1) // 2
            px1 += (fw - down) // 2
            py0 += (fh - down + 1) // 2
            py1 += (fh - down) // 2

        # Transposed conv FIRST, FIR after. VALID correlations commute
        # (corr(corr(z, a), b) == corr(z, conv(a, b))), so this equals the
        # naive zero-stuff -> FIR -> dense-conv order — but the zero-stuffing
        # folds into the conv as lhs_dilation (the MXU-native transposed-conv
        # form), instead of materializing a 2Hx2W tensor and running the dense
        # conv at the upsampled resolution (4x the necessary MACs, 3/4 of them
        # against stuffed zeros). Measured on v5e: adapted-generator fwd+bwd
        # at (128, 256²) dropped 133 ms -> (see BASELINE.md).
        wc = w if flip_weight else jnp.flip(w, axis=(0, 1))
        x = lax.conv_general_dilated(
            x,
            wc.astype(x.dtype),
            window_strides=(1, 1),
            padding=((py0, py1 + (up - 1)), (px0, px1 + (up - 1))),
            lhs_dilation=(up, up),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        x = upfirdn2d(x, f, gain=up**2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

        # FIR first, then a STRIDED conv: stride-after-full-conv equals
        # strided conv by definition, and VALID correlations commute, so this
        # matches the old pad -> dense conv -> FIR+stride chain exactly while
        # running the dense conv at 1/down² the MACs (same fix as the up
        # path; the discriminator pyramid is built from these).
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        x = conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)
        return x

    # No resampling: fold the (possibly asymmetric, possibly negative)
    # padding straight into the dense conv. Routing it through an identity
    # upfirdn2d (as the reference's op chain does) materializes a full padded
    # copy of the activation as a separate depthwise conv — measured 3.2 ms
    # per 537 MB tensor at 256²x64 on v5e, repeated for every stride-1
    # synthesis conv in both generators and again in their backward passes.
    return conv2d(
        x, w, padding=((py0, py1), (px0, px1)), groups=groups,
        flip_weight=flip_weight,
    )
