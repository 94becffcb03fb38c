"""Independent torch twin of the StyleGAN2 synthesis pyramid.

The VisCoIN pipeline transplants a *pretrained* NVlabs synthesis network
(reference: viscoin/models/gan.py:120-144 `from_gan`), so our synthesis math
must match NVlabs `networks.py` bit-for-bit or every ported checkpoint
silently produces wrong reconstructions. The roundtrip tests in
test_stylegan_porting.py build the torch state dict FROM the Flax model, so
they cannot catch a semantic divergence; this file implements the NVlabs
forward semantics INDEPENDENTLY in torch (float64):

  * modulated conv: per-sample weights `w[b] = weight * styles[b]`,
    demodulated by `rsqrt(sum (w*s)^2 + 1e-8)`, realized as a grouped conv
    with groups=batch (the reference's fused path) — NOT the dense
    input/output-scaling decomposition our TPU op uses.
  * up-resampling: naive zero-stuff -> pad -> FIR -> VALID conv — NOT the
    transposed-conv-then-FIR order our conv2d_resample uses.
  * bias_act: leaky_relu(x + b, 0.2) * sqrt(2), clamp optional.
  * skip architecture: img upsampled by the FIR (gain up^2) + toRGB
    (demodulate=False, styles scaled by 1/sqrt(in*k*k)).

Weights are random NVlabs-layout state dicts ported through
`convert_torch_generator` paths, so this also exercises the converter
against an implementation it did not generate.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from viscoin_tpu.models.stylegan import SynthesisNetwork  # noqa: E402
from viscoin_tpu.utils.porting import convert_torch_synthesis  # noqa: E402

FIR = np.array([1.0, 3.0, 3.0, 1.0])
FIR2D = np.outer(FIR, FIR) / FIR.sum() ** 2  # normalized 2-D taps


def upfirdn2d_t(x, f2d, up=1, pad=(0, 0, 0, 0), gain=1.0):
    """Naive NCHW upfirdn: zero-stuff, pad (negative = crop), true-convolve
    with the 2-D filter, no downsampling (synthesis never downsamples)."""
    B, C, H, W = x.shape
    if up > 1:
        z = torch.zeros(B, C, H * up, W * up, dtype=x.dtype)
        z[:, :, ::up, ::up] = x
    else:
        z = x
    px0, px1, py0, py1 = pad
    z = F.pad(z, (max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)))
    z = z[:, :, max(-py0, 0): z.shape[2] - max(-py1, 0),
          max(-px0, 0): z.shape[3] - max(-px1, 0)]
    k = torch.flip(torch.as_tensor(f2d, dtype=x.dtype), (0, 1)) * gain
    k = k[None, None].repeat(C, 1, 1, 1)
    return F.conv2d(z, k, groups=C)


def fc_t(x, w, b, lr_mult=1.0):
    """Equalized-LR fully connected layer (NVlabs FullyConnectedLayer)."""
    return x @ (w * (lr_mult / math.sqrt(w.shape[1]))).T + b * lr_mult


def modulated_conv_t(x, weight, styles, demodulate=True, up=1, padding=0,
                     flip_weight=True):
    """NVlabs modulated_conv2d fused path: explicit per-sample weights +
    grouped conv (groups=batch)."""
    B, Ci, H, W = x.shape
    Co, _, kh, kw = weight.shape
    w = weight[None] * styles[:, None, :, None, None]  # (B, Co, Ci, kh, kw)
    if demodulate:
        d = (w.pow(2).sum(dim=(2, 3, 4)) + 1e-8).rsqrt()
        w = w * d[:, :, None, None, None]
    xg = x.reshape(1, B * Ci, H, W)
    wg = w.reshape(B * Co, Ci, kh, kw)
    if up > 1:
        # naive order: zero-stuff + FIR (halo-padded, gain=up^2), VALID conv
        px0 = padding + (4 + up - 1) // 2
        px1 = padding + (4 - up) // 2
        xg = upfirdn2d_t(xg, FIR2D, up=up, pad=(px0, px1, px0, px1), gain=up**2)
        if not flip_weight:
            wg = torch.flip(wg, (2, 3))
        y = F.conv2d(xg, wg, groups=B)
    else:
        y = F.conv2d(xg, wg, padding=padding, groups=B)
    return y.reshape(B, Co, *y.shape[2:])


def synthesis_layer_t(x, w_vec, sd, p, up=1, noise=True):
    """NVlabs SynthesisLayer forward (const noise mode)."""
    styles = fc_t(w_vec, sd[f"{p}.affine.weight"], sd[f"{p}.affine.bias"])
    k = sd[f"{p}.weight"].shape[-1]
    x = modulated_conv_t(x, sd[f"{p}.weight"], styles, up=up, padding=k // 2,
                         flip_weight=(up == 1))
    if noise:
        x = x + sd[f"{p}.noise_const"][None, None] * sd[f"{p}.noise_strength"]
    x = F.leaky_relu(x + sd[f"{p}.bias"][None, :, None, None], 0.2) * math.sqrt(2.0)
    return x


def torgb_t(x, w_vec, sd, p):
    Ci = sd[f"{p}.weight"].shape[1]
    styles = fc_t(w_vec, sd[f"{p}.affine.weight"], sd[f"{p}.affine.bias"])
    styles = styles * (1.0 / math.sqrt(Ci))  # k=1
    y = modulated_conv_t(x, sd[f"{p}.weight"], styles, demodulate=False)
    return y + sd[f"{p}.bias"][None, :, None, None]


def synthesis_t(ws, sd, img_resolution, channels):
    """NVlabs SynthesisNetwork forward, skip architecture, const noise."""
    resolutions = [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]
    x = img = None
    w_idx = 0
    for res in resolutions:
        base = f"b{res}"
        if res == 4:
            B = ws.shape[0]
            x = sd[f"{base}.const"][None].repeat(B, 1, 1, 1)
            num_conv = 1
        else:
            x = synthesis_layer_t(x, ws[:, w_idx], sd, f"{base}.conv0", up=2)
            num_conv = 2
        x = synthesis_layer_t(x, ws[:, w_idx + num_conv - 1], sd, f"{base}.conv1")
        if img is not None:
            img = upfirdn2d_t(img, FIR2D, up=2, pad=(2, 1, 2, 1), gain=4.0)
        y = torgb_t(x, ws[:, w_idx + num_conv], sd, f"{base}.torgb")
        img = img + y if img is not None else y
        w_idx += num_conv
    return img


def random_state_dict(rng, img_resolution, channels):
    """Random NVlabs-layout synthesis state dict (torch float64 tensors)."""
    sd = {}
    resolutions = [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]
    w_dim = 32

    def fill_layer(p, ci, co, k, res, noise=True):
        sd[f"{p}.weight"] = rng.standard_normal((co, ci, k, k))
        sd[f"{p}.bias"] = rng.standard_normal(co) * 0.1
        sd[f"{p}.affine.weight"] = rng.standard_normal((ci, w_dim))
        sd[f"{p}.affine.bias"] = 1.0 + 0.1 * rng.standard_normal(ci)
        if noise:
            sd[f"{p}.noise_const"] = rng.standard_normal((res, res))
            sd[f"{p}.noise_strength"] = np.asarray(rng.standard_normal() * 0.1)

    for res in resolutions:
        base = f"b{res}"
        co = channels(res)
        if res == 4:
            sd[f"{base}.const"] = rng.standard_normal((co, 4, 4))
        else:
            fill_layer(f"{base}.conv0", channels(res // 2), co, 3, res)
        fill_layer(f"{base}.conv1", co, co, 3, res)
        fill_layer(f"{base}.torgb", co, 3, 1, res, noise=False)
    return {k: torch.as_tensor(np.asarray(v), dtype=torch.float64)
            for k, v in sd.items()}


@pytest.mark.parametrize("img_resolution", [16, 64])
def test_synthesis_matches_torch_twin(img_resolution):
    rng = np.random.default_rng(0)
    channel_base, channel_max = 256, 32

    def channels(res):
        return min(channel_base // res, channel_max)

    sd = random_state_dict(rng, img_resolution, channels)
    num_ws = 2 * int(math.log2(img_resolution)) - 2
    ws = rng.standard_normal((2, num_ws, 32))

    # torch twin (float64)
    img_t = synthesis_t(torch.as_tensor(ws, dtype=torch.float64), sd,
                        img_resolution, channels)

    # flax model through the converter
    sd_np = {f"synthesis.{k}": v.numpy().astype(np.float32) for k, v in sd.items()}
    conv = convert_torch_synthesis(sd_np, "synthesis", img_resolution)
    model = SynthesisNetwork(w_dim=32, img_resolution=img_resolution,
                             channel_base=channel_base, channel_max=channel_max)
    img_j = model.apply(
        {"params": conv["params"], "noise": conv["noise"]},
        jnp.asarray(ws, jnp.float32), noise_mode="const",
    )

    # NCHW torch -> NHWC
    ref = np.transpose(img_t.numpy(), (0, 2, 3, 1))
    got = np.asarray(img_j, np.float64)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)


def test_synthesis_twin_would_catch_divergence():
    """Sanity: the twin is sensitive — a wrong resampling filter SHAPE
    (different taps; setup_filter re-normalizes, so this changes the lowpass
    response, not the gain) must fail."""
    rng = np.random.default_rng(1)
    channels = lambda res: min(256 // res, 32)  # noqa: E731
    sd = random_state_dict(rng, 16, channels)
    ws = rng.standard_normal((1, 6, 32))
    img_t = synthesis_t(torch.as_tensor(ws, dtype=torch.float64), sd, 16, channels)

    sd_np = {f"synthesis.{k}": v.numpy().astype(np.float32) for k, v in sd.items()}
    conv = convert_torch_synthesis(sd_np, "synthesis", 16)
    # wrong filter taps: box filter instead of the binomial [1, 3, 3, 1]
    bad = jax.tree_util.tree_map(lambda x: x, conv["params"])
    model = SynthesisNetwork(w_dim=32, img_resolution=16, channel_base=256,
                             channel_max=32, resample_filter=(1, 1, 1, 1))
    img_j = model.apply({"params": bad, "noise": conv["noise"]},
                        jnp.asarray(ws, jnp.float32), noise_mode="const")
    ref = np.transpose(img_t.numpy(), (0, 2, 3, 1))
    assert not np.allclose(np.asarray(img_j), ref, atol=1e-3)
