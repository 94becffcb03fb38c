"""Microbenchmark: int8 vs bf16 conv throughput on the attached TPU.

Decides whether an int8 frozen-tower path is worth building: v5e's MXU has a
2x int8 peak (394 TOPS vs 197 bf16 TFLOPS), but only if XLA lowers integer
convs onto it. Times the step's dominant conv shapes (VGG 64/128-ch 256²,
ResNet bottleneck, synthesis 512-ch) in both dtypes.

Run: PYTHONPATH=/root/repo python scripts/micro_int8.py
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

SHAPES = [
    # (name, B, H, W, Cin, Cout, kh, kw)
    ("vgg_conv1_2 256x256x64", 128, 256, 256, 64, 64, 3, 3),
    ("vgg_conv2_2 128x128x128", 128, 128, 128, 128, 128, 3, 3),
    ("vgg_conv3_3 64x64x256", 128, 64, 64, 256, 256, 3, 3),
    ("resnet_mid 32x32x256", 128, 32, 32, 256, 256, 3, 3),
    ("synth 64x64x512", 128, 64, 64, 512, 512, 3, 3),
]


def timed(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # sync through the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for name, B, H, W, Cin, Cout, kh, kw in SHAPES:
        x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Cin), dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, (kh, kw, Cin, Cout), dtype=np.int8))
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        flops = 2 * B * H * W * Cin * Cout * kh * kw
        tb = timed(conv_bf16, xb, wb)
        ti = timed(conv_int8, x8, w8)
        print(f"{name}: bf16 {tb*1e3:7.2f} ms ({flops/tb/1e12:6.1f} TF/s) | "
              f"int8 {ti*1e3:7.2f} ms ({flops/ti/1e12:6.1f} TOP/s) | "
              f"speedup {tb/ti:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
