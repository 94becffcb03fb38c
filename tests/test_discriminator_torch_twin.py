"""Independent torch twin of the StyleGAN2 Discriminator (NVlabs
networks.py::Discriminator, architecture='resnet'): fromRGB + residual
down-blocks (FIR-then-strided-conv), minibatch-stddev, 4x4 epilogue. Verifies
our NHWC Discriminator + convert_torch_discriminator against the reference
semantics — including the mbstd group assignment (samples {m, m+n, ...} form
stat-group m) and the NCHW->NHWC epilogue-flatten permutation."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_synthesis_torch_twin import FIR2D, upfirdn2d_t  # noqa: E402

from viscoin_tpu.models.stylegan import Discriminator  # noqa: E402
from viscoin_tpu.utils.porting import (  # noqa: E402
    convert_torch_discriminator,
    state_dict_to_numpy,
)

LRELU_GAIN = math.sqrt(2.0)


def conv_layer_t(x, w, b, down=1, gain=1.0, act="lrelu"):
    """NVlabs Conv2dLayer: equalized LR, optional FIR+stride-2 downsample."""
    k = w.shape[-1]
    w = w * (1.0 / math.sqrt(w.shape[1] * k * k))
    if down > 1:
        pad = k // 2 + 1  # conv padding + FIR halo for fh=4, down=2
        x = upfirdn2d_t(x, FIR2D, pad=(pad, pad, pad, pad))
        x = F.conv2d(x, w, stride=down)
    else:
        x = F.conv2d(x, w, padding=k // 2)
    if b is not None:
        x = x + b[None, :, None, None]
    if act == "lrelu":
        x = F.leaky_relu(x, 0.2) * (LRELU_GAIN * gain)
    else:
        x = x * gain
    return x


def mbstd_t(x, group_size, num_channels=1):
    N, C, H, W = x.shape
    G = min(group_size, N)
    Fc = num_channels
    c = C // Fc
    y = x.reshape(G, -1, Fc, c, H, W).double()
    y = y - y.mean(dim=0)
    y = (y.square().mean(dim=0) + 1e-8).sqrt()
    y = y.mean(dim=(2, 3, 4)).reshape(-1, Fc, 1, 1)
    y = y.repeat(G, 1, H, W).to(x.dtype)
    return torch.cat([x, y], dim=1)


def discriminator_t(img, sd, img_resolution, channels, mbstd_group):
    resolutions = [2**i for i in range(int(math.log2(img_resolution)), 2, -1)]
    x = None
    for i, res in enumerate(resolutions):
        base = f"b{res}"
        if i == 0:
            x = conv_layer_t(img, sd[f"{base}.fromrgb.weight"],
                             sd[f"{base}.fromrgb.bias"])
        y = conv_layer_t(x, sd[f"{base}.skip.weight"], None, down=2,
                         gain=math.sqrt(0.5), act="linear")
        x = conv_layer_t(x, sd[f"{base}.conv0.weight"], sd[f"{base}.conv0.bias"])
        x = conv_layer_t(x, sd[f"{base}.conv1.weight"], sd[f"{base}.conv1.bias"],
                         down=2, gain=math.sqrt(0.5))
        x = y + x
    x = mbstd_t(x, mbstd_group)
    x = conv_layer_t(x, sd["b4.conv.weight"], sd["b4.conv.bias"])
    x = x.flatten(1)  # NCHW channel-major flatten
    w = sd["b4.fc.weight"] * (1.0 / math.sqrt(sd["b4.fc.weight"].shape[1]))
    x = F.leaky_relu(x @ w.T + sd["b4.fc.bias"], 0.2) * LRELU_GAIN
    w = sd["b4.out.weight"] * (1.0 / math.sqrt(sd["b4.out.weight"].shape[1]))
    return x @ w.T + sd["b4.out.bias"]


def test_discriminator_matches_torch_twin():
    rng = np.random.default_rng(0)
    R, cbase, cmax = 16, 256, 32

    def channels(res):
        return min(cbase // res, cmax)

    sd = {}
    resolutions = [2**i for i in range(int(math.log2(R)), 2, -1)]
    for i, res in enumerate(resolutions):
        tmp, out = channels(res), channels(res // 2)
        if i == 0:
            sd[f"b{res}.fromrgb.weight"] = rng.standard_normal((tmp, 3, 1, 1))
            sd[f"b{res}.fromrgb.bias"] = rng.standard_normal(tmp) * 0.1
        sd[f"b{res}.conv0.weight"] = rng.standard_normal((tmp, tmp, 3, 3))
        sd[f"b{res}.conv0.bias"] = rng.standard_normal(tmp) * 0.1
        sd[f"b{res}.conv1.weight"] = rng.standard_normal((out, tmp, 3, 3))
        sd[f"b{res}.conv1.bias"] = rng.standard_normal(out) * 0.1
        sd[f"b{res}.skip.weight"] = rng.standard_normal((out, tmp, 1, 1))
    c4 = channels(4)
    sd["b4.conv.weight"] = rng.standard_normal((c4, c4 + 1, 3, 3))
    sd["b4.conv.bias"] = rng.standard_normal(c4) * 0.1
    sd["b4.fc.weight"] = rng.standard_normal((c4, c4 * 16))
    sd["b4.fc.bias"] = rng.standard_normal(c4) * 0.1
    sd["b4.out.weight"] = rng.standard_normal((1, c4))
    sd["b4.out.bias"] = rng.standard_normal(1) * 0.1
    sd = {k: torch.as_tensor(v, dtype=torch.float64) for k, v in sd.items()}

    img = rng.standard_normal((4, 3, R, R))
    # group_size=2 with B=4 => TWO stat groups: catches wrong group/sample
    # assignment (tile vs interleave)
    want = discriminator_t(torch.as_tensor(img, dtype=torch.float64), sd, R,
                           channels, mbstd_group=2).numpy()

    params = convert_torch_discriminator(
        state_dict_to_numpy({k: v.float() for k, v in sd.items()}), R)
    model = Discriminator(img_resolution=R, channel_base=cbase, channel_max=cmax,
                          mbstd_group_size=2)
    got = model.apply({"params": params},
                      jnp.asarray(np.transpose(img, (0, 2, 3, 1)), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
