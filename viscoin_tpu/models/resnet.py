"""ResNet backbone + classifier `f`, TPU-native (NHWC, Flax).

Re-implements the architecture of HF `microsoft/resnet-50` used by the
reference classifier (viscoin/models/classifiers.py:14-92): 7x7/2 stem + BN +
ReLU + 3x3/2 maxpool, four bottleneck stages (depths 3/4/6/3, hidden sizes
256/512/1024/2048, downsample on the 3x3 conv), adaptive average pooling, and
a custom Linear head (Kaiming-normal init, classifiers.py:63-66).

Forward returns ``(logits, hidden_states)`` where ``hidden_states`` is the
HF-style 5-tuple: (stem output, stage1..stage4 outputs) — shapes at 256²
input: (B,64,64,64), (B,64,64,256), (B,32,32,512), (B,16,16,1024),
(B,8,8,2048) in NHWC. The concept extractor consumes ``hidden_states[-3:]``.

Torch checkpoints port via :func:`convert_torch_classifier` (utils/porting.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional ReLU (HF: ResNetConvLayer)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        x = nn.Conv(
            self.out_channels,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum 0.1
            epsilon=1e-5,
            name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride) → 1x1 expand + shortcut (HF: ResNetBottleNeckLayer,
    downsample_in_bottleneck=False — stride on the middle conv)."""

    out_channels: int
    stride: int = 1
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        reduced = self.out_channels // self.reduction
        y = ConvBN(reduced, 1, 1, name="conv1")(x, train)
        y = ConvBN(reduced, 3, self.stride, name="conv2")(y, train)
        y = ConvBN(self.out_channels, 1, 1, act=False, name="conv3")(y, train)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = ConvBN(self.out_channels, 1, self.stride, act=False, name="shortcut")(x, train)
        return nn.relu(y + x)


class ResNetBackbone(nn.Module):
    """ResNet-50-style backbone returning pooled features + 5 hidden states."""

    embedding_size: int = 64
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    depths: Sequence[int] = (3, 4, 6, 3)
    downsample_in_first_stage: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = ConvBN(self.embedding_size, 7, 2, name="embedder")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        hidden = [x]
        for i, (ch, depth) in enumerate(zip(self.hidden_sizes, self.depths)):
            stride = 2 if (i > 0 or self.downsample_in_first_stage) else 1
            for j in range(depth):
                x = Bottleneck(ch, stride if j == 0 else 1, name=f"stage{i}_block{j}")(x, train)
            hidden.append(x)
        pooled = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1)
        return pooled, tuple(hidden)


class Classifier(nn.Module):
    """ResNet classifier with a custom head (reference:
    viscoin/models/classifiers.py::Classifier). Returns (logits, hidden_states)."""

    output_classes: int = 200
    embedding_size: int = 64
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    depths: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        pooled, hidden = ResNetBackbone(
            embedding_size=self.embedding_size,
            hidden_sizes=self.hidden_sizes,
            depths=self.depths,
            name="resnet",
        )(x, train)
        logits = nn.Dense(
            self.output_classes,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            name="linear",
        )(pooled)
        return logits, hidden
