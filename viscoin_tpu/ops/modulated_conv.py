"""Style-modulated convolution with weight demodulation (StyleGAN2 core op).

TPU-native redesign of the reference's `modulated_conv2d`
(`stylegan2_ada/training/networks.py`, SURVEY.md §2.2 "StyleGAN2 networks").
The reference's fused path builds a per-sample weight tensor and runs a
grouped convolution with groups=batch — hostile to the MXU. Here we use the
mathematically identical input/output-scaling decomposition, which keeps the
convolution dense and batched (MXU-friendly):

    y[b] = demod[b] * conv(x[b] * styles[b], w)

with

    demod[b, co] = rsqrt( sum_{kh,kw,ci} (w[kh,kw,ci,co] * styles[b,ci])^2 + 1e-8 )
                 = rsqrt( (styles[b]^2) @ (sum_{kh,kw} w^2)[ci,co] + 1e-8 )

so the demodulation coefficient costs one tiny (B,Ci)x(Ci,Co) matmul instead
of materializing per-sample weights. The elementwise scalings fuse into the
conv's producer/consumer epilogues under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viscoin_tpu.ops.conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jax.Array,
    w: jax.Array,
    styles: jax.Array,
    *,
    noise: jax.Array | None = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: jax.Array | None = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    input_gain: jax.Array | None = None,
) -> jax.Array:
    """Modulated conv over NHWC activations with HWIO weights.

    Args:
        x: (B, H, W, Ci) input.
        w: (kh, kw, Ci, Co) weights.
        styles: (B, Ci) per-sample modulation from the affine layer.
        noise: optional (B, H', W', 1) or (H', W', 1) noise added after demod.
        up / down / padding / resample_filter / flip_weight: see
            :func:`conv2d_resample`.
        demodulate: apply weight demodulation (False for ToRGB).
        input_gain: optional extra per-channel input scale.
    """
    B, _, _, Ci = x.shape
    Co = w.shape[-1]
    compute_dtype = x.dtype

    # Pre-normalize in low precision for numerical stability (the reference
    # does the same for its fp16 path; demodulation makes this a no-op
    # mathematically).
    if demodulate and compute_dtype != jnp.float32:
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(0, 1, 2), keepdims=True) + 1e-8)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        w32 = w.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        w2 = jnp.sum(jnp.square(w32), axis=(0, 1))  # (Ci, Co)
        dcoefs = jax.lax.rsqrt(jnp.square(s32) @ w2 + 1e-8)  # (B, Co)

    if input_gain is not None:
        styles = styles * input_gain

    x = x * styles[:, None, None, :].astype(compute_dtype)
    x = conv2d_resample(
        x,
        w.astype(compute_dtype),
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )
    if dcoefs is not None:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x
