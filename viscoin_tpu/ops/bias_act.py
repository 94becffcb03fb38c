"""Fused bias + activation (+gain +clamp).

TPU-native replacement for the reference's CUDA plugin
(`stylegan2_ada/torch_utils/ops/bias_act.{cpp,cu,py}`, see SURVEY.md §2.2):
the reference JIT-compiles a CUDA kernel that fuses bias add, activation,
per-activation default gain, and optional clamping, with a hand-written
second-order-capable backward.

On TPU none of that machinery is needed for the default path: under `jit`,
XLA fuses `x + b`, the activation, the gain multiply, and the clamp into a
single VPU loop, and `jax.grad` composes to any order. We therefore expose a
pure-jnp implementation as the default, plus an optional Pallas kernel
(`impl="pallas"`) that performs the same fusion explicitly — useful as a
building block when this op is composed inside larger hand-written kernels.

Activation semantics follow the reference table (bias_act.py `activation_funcs`):
each activation has a default gain applied AFTER the nonlinearity, and the
optional `clamp` is applied last as clip(y, -clamp, clamp).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _ActSpec(NamedTuple):
    fn: callable
    def_gain: float


# Activation registry: name -> (fn, default_gain).
# Matches the reference's table: linear, relu, lrelu(0.2), tanh, sigmoid,
# elu, selu, softplus, swish.
activation_funcs: dict[str, _ActSpec] = {
    "linear": _ActSpec(lambda x: x, 1.0),
    "relu": _ActSpec(lambda x: jnp.maximum(x, 0.0), math.sqrt(2.0)),
    "lrelu": _ActSpec(lambda x: jnp.where(x >= 0, x, 0.2 * x), math.sqrt(2.0)),
    "tanh": _ActSpec(jnp.tanh, 1.0),
    "sigmoid": _ActSpec(jax.nn.sigmoid, 1.0),
    "elu": _ActSpec(jax.nn.elu, 1.0),
    "selu": _ActSpec(jax.nn.selu, 1.0),
    "softplus": _ActSpec(jax.nn.softplus, 1.0),
    "swish": _ActSpec(jax.nn.swish, math.sqrt(2.0)),
}


def bias_act(
    x: jax.Array,
    b: jax.Array | None = None,
    *,
    axis: int = -1,
    act: str = "linear",
    alpha: float | None = None,
    gain: float | None = None,
    clamp: float | None = None,
    impl: str = "xla",
) -> jax.Array:
    """Fused bias + activation + gain + clamp.

    Args:
        x: input of any shape.
        b: optional bias, 1-D of length ``x.shape[axis]``.
        axis: the axis the bias is broadcast along (default: channels-last,
            the TPU-native layout; the reference uses dim 1 / NCHW).
        act: activation name from :data:`activation_funcs`.
        alpha: lrelu slope override (default 0.2, like the reference).
        gain: overall gain override; defaults to the activation's def_gain.
        clamp: if set (>= 0), clip the output to [-clamp, clamp].
        impl: "xla" (default; XLA fuses this) or "pallas".
    """
    spec = activation_funcs[act]
    if gain is None:
        gain = spec.def_gain
    if clamp is not None and clamp < 0:
        clamp = None

    if impl == "pallas" and x.ndim >= 2 and act in ("linear", "relu", "lrelu"):
        return _bias_act_pallas(x, b, axis=axis, act=act, alpha=alpha, gain=gain, clamp=clamp)

    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    if act == "lrelu" and alpha is not None and alpha != 0.2:
        x = jnp.where(x >= 0, x, alpha * x)
    else:
        x = spec.fn(x)
    if gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x


# --------------------------------------------------------------------------- #
# Pallas kernel: explicit fusion of bias + {linear,relu,lrelu} + gain + clamp. #
# --------------------------------------------------------------------------- #


def _bias_act_kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    x = x_ref[:].astype(jnp.float32)
    x = x + b_ref[:].astype(jnp.float32)  # (1, C) broadcast over rows
    if act == "relu":
        x = jnp.maximum(x, 0.0)
    elif act == "lrelu":
        x = jnp.where(x >= 0, x, alpha * x)
    if gain != 1.0:
        x = x * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    o_ref[:] = x.astype(o_ref.dtype)


def _bias_act_pallas(x, b, *, axis, act, alpha, gain, clamp):
    alpha = 0.2 if alpha is None else float(alpha)
    orig_shape = x.shape
    axis = axis % x.ndim
    if axis != x.ndim - 1:  # move bias axis last; channels-last is the TPU layout
        x = jnp.moveaxis(x, axis, -1)
    moved_shape = x.shape
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    if b is None:
        b = jnp.zeros((c,), x.dtype)

    row_tile = min(n, 512)
    grid = (pl.cdiv(n, row_tile),)
    # Pallas TPU kernels run interpreted on non-TPU backends (CPU test mesh).
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_bias_act_kernel, act=act, alpha=alpha, gain=float(gain), clamp=clamp),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, b.reshape(1, c))
    out = out.reshape(moved_shape)
    if axis != len(orig_shape) - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out
