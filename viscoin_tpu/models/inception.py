"""InceptionV3 feature extractor for FID, in Flax (NHWC).

Replaces the TorchScript `inception-2015-12-05.pt` detector the reference
downloads from the NVlabs CDN (viscoin/testing/viscoin.py:85-88). This is the
torchvision InceptionV3 layout (the architecture used by pytorch-fid; the
NVlabs TorchScript file is the original TF-slim export of the same network —
FID values computed with ported torchvision/pytorch-fid weights follow the
pytorch-fid convention, a documented divergence from the NVlabs detector).

Weights port from a torchvision ``inception_v3`` state_dict via
:func:`viscoin_tpu.utils.porting.convert_torch_inception`. Returns 2048-d
pool features; :func:`fid_preprocess` resizes to 299² and scales to [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

FID_IMAGE_SIZE = 299


class BasicConv(nn.Module):
    """Conv (no bias) + BN(eps=1e-3) + ReLU (torchvision BasicConv2d)."""

    out_channels: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        x = nn.Conv(self.out_channels, (kh, kw), strides=(self.stride, self.stride),
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def _pool(x, kind: str, size=3, stride=1, pad=1):
    pads = [(pad, pad), (pad, pad)]
    if kind == "max":
        return nn.max_pool(x, (size, size), strides=(stride, stride), padding=pads)
    return nn.avg_pool(x, (size, size), strides=(stride, stride), padding=pads,
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _pool(x, "avg")
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _pool(x, "max", 3, 2, 0)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _pool(x, "avg")
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _pool(x, "max", 3, 2, 0)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid quirk: the LAST block (Mixed_7c / FIDInceptionE_2) pools its
    # branch with a MAX pool, matching the original TF-slim export; Mixed_7b
    # uses the average pool (count_include_pad=False).
    branch_pool_kind: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool(x, self.branch_pool_kind)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Feature extractor: (B, 299, 299, 3) in [-1, 1] → (B, 2048)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _pool(x, "max", 3, 2, 0)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, "max", 3, 2, 0)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(branch_pool_kind="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def fid_preprocess(x: jax.Array) -> jax.Array:
    """Float NHWC images (ImageNet-normalized, as flowing through VisCoIN)
    → 299² in [-1, 1] for the detector. The reference feeds its tensors
    directly to the TorchScript detector which resizes internally."""
    from viscoin_tpu.data.transforms import denormalize

    x = jnp.clip(denormalize(x), 0.0, 1.0)
    B, H, W, C = x.shape
    if (H, W) != (FID_IMAGE_SIZE, FID_IMAGE_SIZE):
        x = jax.image.resize(x, (B, FID_IMAGE_SIZE, FID_IMAGE_SIZE, C), "bilinear")
    return x * 2.0 - 1.0


def make_fid_detector(params):
    """Returns a jitted callable (float NHWC images) -> (B, 2048) features,
    suitable for eval.viscoin.test_viscoin(fid_detector=...).

    The ~25M Inception params are a runtime argument of the jitted function,
    partially applied OUTSIDE the trace — never a closure constant, which
    would serialize them into the remote-compile HLO payload (CLAUDE.md /
    make_frozen pattern)."""
    model = InceptionV3Features()

    @jax.jit
    def detect(params, images):
        return model.apply({"params": params["params"],
                            "batch_stats": params["batch_stats"]},
                           fid_preprocess(images))

    return lambda images: detect(params, images)


# ------------------- NVlabs (TorchScript) FID convention -------------------- #
#
# The reference computes FID with the NVlabs TorchScript detector
# `inception-2015-12-05.pt` (viscoin/testing/viscoin.py:85-88), feeding it the
# ImageNet-NORMALIZED eval tensors as-is (no [0,255] rescale — a reference
# quirk the detector's internal preprocessing then operates on). Two porting
# paths for a migrating user who HAS that file (it is not downloadable here —
# zero egress):
#
#   1. make_torchscript_fid_detector(path): wraps the reference's own
#      detector via host torch — numerically IDENTICAL FID, CPU-speed.
#   2. scripts/port_weights.py inception-nvlabs: converts the TorchScript
#      weights into InceptionV3Features (the architecture already matches the
#      TF-slim graph the detector traces — the pytorch-fid pooling quirks ARE
#      that graph's semantics) + nvlabs_fid_preprocess replicating its
#      internal resize/scaling. Self-verifies against the TorchScript file at
#      conversion time, then runs at TPU speed.


def tf1_resize_bilinear(x: jax.Array, size: int) -> jax.Array:
    """Legacy TF1 ``resize_bilinear`` (align_corners=False,
    half_pixel_centers=False): source coordinate = dst · (in/out), no
    half-pixel shift, no antialiasing — the resize convention inside the
    NVlabs TorchScript FID detector (a TF1 graph export). Differs from
    ``jax.image.resize`` (half-pixel + antialias)."""
    B, H, W, C = x.shape
    if (H, W) == (size, size):
        return x

    def axis_weights(n_in, n_out):
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in / n_out)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = src - lo.astype(jnp.float32)
        return lo, hi, w

    ylo, yhi, wy = axis_weights(H, size)
    xlo, xhi, wx = axis_weights(W, size)
    top = x[:, ylo] * (1 - wy)[None, :, None, None] + x[:, yhi] * wy[None, :, None, None]
    out = (top[:, :, xlo] * (1 - wx)[None, None, :, None]
           + top[:, :, xhi] * wx[None, None, :, None])
    return out


def nvlabs_fid_preprocess(x: jax.Array) -> jax.Array:
    """The NVlabs detector's internal preprocessing, applied to tensors
    EXACTLY as the reference passes them (normalized floats, no rescale):
    TF1 bilinear resize to 299² then (x − 128) / 128."""
    return (tf1_resize_bilinear(x, FID_IMAGE_SIZE) - 128.0) / 128.0


def make_nvlabs_fid_detector(params):
    """Jitted detector for weights ported from the NVlabs TorchScript file
    (scripts/port_weights.py inception-nvlabs): reproduces the reference's
    FID convention at TPU speed."""
    model = InceptionV3Features()

    @jax.jit
    def detect(params, images):
        return model.apply({"params": params["params"],
                            "batch_stats": params["batch_stats"]},
                           nvlabs_fid_preprocess(images))

    return lambda images: detect(params, images)


def make_torchscript_fid_detector(path: str):
    """EXACT NVlabs-comparable FID: runs the reference's own TorchScript
    detector on host CPU via torch, fed exactly as the reference feeds it
    (testing/viscoin.py:115-118 — the normalized NCHW batch, untouched).
    Single-host only (features materialize on this host)."""
    import numpy as np
    import torch

    mod = torch.jit.load(path, map_location="cpu").eval()

    def detect(images):
        x = np.ascontiguousarray(
            np.asarray(jax.device_get(images), np.float32).transpose(0, 3, 1, 2))
        with torch.no_grad():
            t = torch.from_numpy(x)
            try:
                feats = mod(t, return_features=True)
            except (TypeError, RuntimeError):
                feats = mod(t)  # fabricated/test exports without the kwarg
        return np.asarray(feats)

    return detect
