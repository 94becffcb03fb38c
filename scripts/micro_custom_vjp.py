"""Microbenchmark: does a hand-written conv VJP change XLA's layout choice?

The round-2/3 per-HLO profiles (BASELINE.md) attribute the flagship step's
remaining headroom to large backward-conv fusions running at ~60-70 TF/s —
"layout-pinned by VJP lane shapes". JAX's builtin conv transpose rule emits
an HLO conv with window-reversal + swapped I/O dimension numbers; this
experiment re-expresses the input-gradient as a PLAIN forward-style NHWC
conv over an explicitly flipped/IO-swapped kernel (and the weight-gradient
as the standard batch-as-contraction conv), giving XLA's layout assignment
a different problem for the same math.

Times grad-through-a-VGG-block (conv-relu-conv-relu, frozen weights: input
gradient only) both ways at the step's dominant shapes. Exactness is
asserted before timing.

Run: PYTHONPATH=/root/repo python scripts/micro_custom_vjp.py
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def conv_same(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


@jax.custom_vjp
def conv_cv(x, w):
    return conv_same(x, w)


def _fwd(x, w):
    return conv_same(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    kh, kw = w.shape[0], w.shape[1]
    # input-grad: plain forward-style conv over the 180°-rotated, IO-swapped
    # kernel (exact for stride-1 SAME with odd kernels)
    wT = jnp.swapaxes(jnp.flip(w, (0, 1)), 2, 3)
    dx = conv_same(g, wT)
    # weight-grad: batch-as-contraction conv — lhs x (n,H,W,i) with n as the
    # contracted feature, rhs g (n,H,W,o) as the kernel, output (kh,kw,i,o)
    dw = lax.conv_general_dilated(
        x, g, window_strides=(1, 1),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("CHWN", "IHWO", "HWNC"))
    return dx, dw.astype(w.dtype)


conv_cv.defvjp(_fwd, _bwd)


def block_loss(conv, x, w1, w2):
    """VGG-style block: conv-relu-conv-relu, scalar loss."""
    h = jax.nn.relu(conv(x, w1))
    h = jax.nn.relu(conv(h, w2))
    return jnp.sum(h.astype(jnp.float32) ** 2)


def timed(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)) if isinstance(out, tuple)
          else jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)) if isinstance(out, tuple)
          else jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # exactness first (small shape, fp32, incl. dw)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    g_ref = jax.grad(block_loss, argnums=(1, 2, 3))(conv_same, x, w1, w2)
    g_cv = jax.grad(block_loss, argnums=(1, 2, 3))(conv_cv, x, w1, w2)
    for a, b, name in zip(g_ref, g_cv, ("dx", "dw1", "dw2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    print("exactness: custom VJP == jax.grad (dx, dw1, dw2)")

    shapes = [
        ("vgg_block1 256²x64", 64, 256, 256, 64),
        ("vgg_block1 b128", 128, 256, 256, 64),
        ("vgg_block2 128²x128", 128, 128, 128, 128),
    ]
    for name, B, H, W, C in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)

        # frozen weights: input gradient only (the step's hot pattern)
        ref = jax.jit(jax.grad(lambda x, w1, w2: block_loss(conv_same, x, w1, w2)))
        cv = jax.jit(jax.grad(lambda x, w1, w2: block_loss(conv_cv, x, w1, w2)))
        t_ref = timed(ref, x, w1, w2)
        t_cv = timed(cv, x, w1, w2)
        flops = 2 * 2 * B * H * W * C * C * 9 * 3  # 2 convs, fwd+2x-bwd-ish
        print(f"{name}: builtin {t_ref*1e3:7.2f} ms ({flops/t_ref/1e12:6.1f} TF/s)"
              f" | custom {t_cv*1e3:7.2f} ms ({flops/t_cv/1e12:6.1f} TF/s)"
              f" | ratio {t_ref/t_cv:.3f}x")


if __name__ == "__main__":
    main()
