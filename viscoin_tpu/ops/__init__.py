"""TPU-native compute ops: XLA graphs + Pallas kernels replacing the
reference's CUDA plugins (stylegan2_ada/torch_utils/ops/, SURVEY.md §2.2).

Obsolete-by-design plugins (no equivalent needed in JAX):
  * ``conv2d_gradfix`` / ``grid_sample_gradfix`` — replace torch autograd so
    double backprop works around cuDNN limitations; ``jax.grad`` composes to
    any order natively.
  * ``fma`` — fused multiply-add with custom grad; XLA fuses natively.
  * ``custom_ops`` plugin JIT loader (nvcc/ninja) — everything here compiles
    through XLA/Mosaic; there is no separate build system.
"""

from viscoin_tpu.ops.bias_act import activation_funcs, bias_act
from viscoin_tpu.ops.conv2d_resample import conv2d, conv2d_resample
from viscoin_tpu.ops.modulated_conv import modulated_conv2d
from viscoin_tpu.ops.upfirdn2d import (
    downsample2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)

__all__ = [
    "activation_funcs",
    "bias_act",
    "conv2d",
    "conv2d_resample",
    "modulated_conv2d",
    "downsample2d",
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
]
