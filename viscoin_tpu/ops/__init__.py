"""TPU-native compute ops: XLA graphs + Pallas kernels replacing the
reference's CUDA plugins (stylegan2_ada/torch_utils/ops/, SURVEY.md §2.2)."""

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
