"""LPIPS perceptual distance (VGG16 backbone) in Flax, NHWC.

TPU-native replacement for the pip `lpips` package used by the reference
(viscoin/training/losses.py:104-122, `lpips.LPIPS(net="vgg")`): a VGG16
feature stack sliced at relu1_2/2_2/3_3/4_3/5_3, channel-unit-normalized
feature differences, learned non-negative 1x1 linear heads, spatial mean,
summed over the five layers. Input scaling uses LPIPS's fixed shift/scale
(version 0.1). The reference feeds ImageNet-normalized tensors straight in;
we reproduce that behavior (the distance is what matters, not the nominal
input range).

Pretrained torch weights (torchvision VGG16 + lpips linear heads) port via
:func:`viscoin_tpu.utils.porting.convert_torch_lpips`. With random weights the
distance is still a valid smooth perceptual-style metric (random VGG features
are a known-reasonable proxy), so training runs end-to-end without downloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscoin_tpu.ops import paired_conv as pc

# LPIPS v0.1 ScalingLayer constants.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 'D' configuration grouped into the 5 LPIPS slices (channels per conv).
_SLICES = (
    (64, 64),  # relu1_2
    (128, 128),  # relu2_2
    (256, 256, 256),  # relu3_3
    (512, 512, 512),  # relu4_3
    (512, 512, 512),  # relu5_3
)

LPIPS_CHANNELS = tuple(s[-1] for s in _SLICES)


class _Conv3x3Params(nn.Module):
    """Declares the exact param structure of ``nn.Conv(features, (3, 3))``
    (HWIO kernel + bias, lecun-normal / zeros init) without binding the
    compute, so the width-paired path below shares checkpoints with the
    standard path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the 5 LPIPS slice outputs (NHWC).

    ``paired_block1`` runs the two 64-channel 256²-scale convs of block 1 in
    the width-paired form of :mod:`viscoin_tpu.ops.paired_conv` —
    algebraically identical, with the conv (and its input-VJP in the LPIPS
    backward) on the full 128 MXU lanes instead of 64. Param structure is
    unchanged. **Default off**: measured end-to-end on v5e (BASELINE.md) the
    relayouts XLA inserts at the paired/standard boundaries (the
    (B,256,256,3)->(B,256,128,6) "free" reshape alone materialized as an
    18 ms transpose under tiled batch-minor layouts) cost more than the
    full-lane convs save. Kept as tested infrastructure."""

    paired_block1: bool = False
    # Space-to-batch the 64/128-channel block-1/2 prefix (ops/space_to_batch):
    # each image's H axis folds into two halo-8 overlapped halves, so the
    # lane-starved sub-128-batch convs (and their input-VJPs in the LPIPS
    # backward) run at conv-batch 2B on full lanes. Exact (overlap-save;
    # tested) and param-structure-preserving. Unlike paired_block1 this moves
    # a MAJOR dim — no lane-dim relayouts.
    fold_block12: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, ...]:
        outs = []
        conv_idx = 0
        paired = self.paired_block1 and x.shape[2] % 2 == 0
        fold = (self.fold_block12 and not paired and x.shape[1] % 16 == 0)
        if fold:
            from viscoin_tpu.ops.space_to_batch import (
                fold_h,
                outer_halo_mask,
                unfold_h,
            )

            # Halo accounting (see ops/space_to_batch.py): 8 rows at the 256²
            # scale keep every core row ahead of SAME-conv interior-edge
            # corruption (block 1: 2 rows) and stay pool-aligned (8 → 4 after
            # pool1; block 2 corruption reaches 3 < 4). The outer halo is
            # re-zeroed after every conv so edge rows keep seeing the SAME
            # zero padding of the unfolded computation.
            HALO = 8
            xf = fold_h(x, HALO)
        for slice_idx, channels in enumerate(_SLICES):
            if fold and slice_idx < 2:
                halo_s = HALO if slice_idx == 0 else HALO // 2
                for ch in channels:
                    xf = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                 name=f"conv{conv_idx}")(xf)
                    xf = nn.relu(xf) * outer_halo_mask(
                        xf.shape[0], xf.shape[1], halo_s, xf.dtype)
                    conv_idx += 1
                if slice_idx == 0:
                    outs.append(unfold_h(xf, HALO))
                    xf = nn.max_pool(xf, (2, 2), strides=(2, 2))
                else:
                    x = unfold_h(xf, HALO // 2)
                    outs.append(x)
                continue
            if slice_idx == 0 and paired:
                b, h, w, c = x.shape
                k0, b0 = _Conv3x3Params(channels[0], name="conv0")(c)
                k1, b1 = _Conv3x3Params(channels[1], name="conv1")(channels[0])
                conv_idx = 2
                y = pc.conv3x3_aligned_to_offset(x.reshape(b, h, w // 2, 2 * c), k0)
                y = nn.relu(y + jnp.tile(b0, 2).astype(y.dtype))
                y = y * pc.offset_phantom_mask(y.shape, channels[0], y.dtype)
                y = pc.conv3x3_offset_to_aligned(y, k1)
                y = nn.relu(y + jnp.tile(b1, 2).astype(y.dtype))
                outs.append(y.reshape(b, h, w, channels[1]))
                x = pc.max_pool_2x2_aligned(y)
                continue
            if slice_idx > 0 and not (slice_idx == 1 and paired):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ch in channels:
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            outs.append(x)
        return tuple(outs)


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Channel-wise unit normalization (lpips.normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance: __call__(x, y) -> (B,) distances."""

    fold_block12: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        net = VGG16Features(name="vgg", fold_block12=self.fold_block12)
        # Two separate applies on purpose: the `y` branch is a constant in the
        # training loss (no gradient path), so keeping it a distinct subgraph
        # lets autodiff skip its entire VGG backward. A single concatenated
        # pass was measured 55% slower in fwd+bwd (200 ms vs 129 ms at
        # 2x128x256x256 bf16 on v5e) because conv VJPs then run over both
        # halves.
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            lin = self.param(
                f"lin{i}",
                nn.initializers.uniform(scale=1.0),  # non-negative init like lpips
                (LPIPS_CHANNELS[i],),
            )
            # One-pass form of sum_c lin_c * (a_c/Na - b_c/Nb)^2 with
            # Na = ||a|| + eps (lpips.normalize_tensor):
            #   La/Na^2 + Lb/Nb^2 - 2*Lab/(Na*Nb),
            #   Sa = sum a^2, La = sum lin*a^2, Lab = sum lin*a*b.
            # All five channel reductions read a and b ONCE (XLA sibling-fuses
            # them into a single sweep); the direct normalized-difference form
            # reads each feature map twice (norm pass + diff pass) — measured
            # ~12 ms/step of pure HBM traffic in the LPIPS head at batch 128.
            # Algebraically identical; fp32 accumulation.
            l = lin[None, None, None, :].astype(a.dtype)
            f32 = jnp.float32
            Sa = jnp.sum(jnp.square(a), axis=-1, dtype=f32)
            Sb = jnp.sum(jnp.square(b), axis=-1, dtype=f32)
            La = jnp.sum(l * jnp.square(a), axis=-1, dtype=f32)
            Lb = jnp.sum(l * jnp.square(b), axis=-1, dtype=f32)
            Lab = jnp.sum(l * a * b, axis=-1, dtype=f32)
            eps = 1e-10
            na = jnp.sqrt(Sa) + eps
            nb = jnp.sqrt(Sb) + eps
            dist = La / jnp.square(na) + Lb / jnp.square(nb) - 2.0 * Lab / (na * nb)
            total = total + jnp.mean(dist, axis=(1, 2))
        return total
