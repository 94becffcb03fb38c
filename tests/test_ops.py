"""Unit tests for the core TPU ops against slow numpy oracles.

Mirrors the reference's CUDA-plugin semantics (stylegan2_ada/torch_utils/ops/):
upfirdn2d (zero-insert, pad, FIR, down), bias_act (bias+act+gain+clamp),
conv2d_resample padding arithmetic, and modulated conv demodulation math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.ops import (
    bias_act,
    conv2d_resample,
    modulated_conv2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
)
from viscoin_tpu.ops.upfirdn2d import upfirdn2d_ref


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, 1),
    (2, 2, (3, 2, 3, 2)),
    (1, 1, (-1, 2, 0, -2)),  # negative padding = cropping
])
@pytest.mark.parametrize("flip", [False, True])
def test_upfirdn2d_matches_oracle(rng, up, down, pad, flip):
    x = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    f = np.asarray([1.0, 3.0, 3.0, 1.0])
    f2 = np.outer(f, f) / np.outer(f, f).sum()

    got = upfirdn2d(jnp.asarray(x), jnp.asarray(f2), up=up, down=down,
                    padding=pad, flip_filter=flip, gain=up * up)
    want = upfirdn2d_ref(x, f2, up=up, down=down, padding=pad,
                         flip_filter=flip, gain=up * up)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_filter(rng):
    """A non-symmetric filter distinguishes convolution from correlation."""
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    f = rng.standard_normal((3, 5)).astype(np.float32)
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=2)
    want = upfirdn2d_ref(x, f, padding=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    got_flip = upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=2, flip_filter=True)
    assert not np.allclose(np.asarray(got), np.asarray(got_flip))


def test_setup_filter_normalizes():
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(f)), 1.0, rtol=1e-6)


def test_upsample2d_shape_and_dc_gain(rng):
    """Upsampling a constant image by 2 must preserve its value (interior)."""
    f = setup_filter([1, 3, 3, 1])
    x = jnp.ones((1, 8, 8, 4), jnp.float32) * 2.5
    y = upsample2d(x, f, up=2)
    assert y.shape == (1, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(y)[:, 4:-4, 4:-4, :], 2.5, rtol=1e-5)


def test_downsample2d_shape_and_dc_gain():
    f = setup_filter([1, 3, 3, 1])
    x = jnp.ones((1, 16, 16, 4), jnp.float32) * 1.5
    y = downsample2d(x, f, down=2)
    assert y.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2, :], 1.5, rtol=1e-5)


def test_up_down_roundtrip_preserves_dc():
    """up2 then down2 with a normalized filter preserves constants (interior)."""
    f = setup_filter([1, 3, 3, 1])
    x = jnp.full((1, 16, 16, 2), 0.7, jnp.float32)
    y = downsample2d(upsample2d(x, f, up=2), f, down=2)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y)[:, 4:-4, 4:-4], 0.7, rtol=1e-5)


def test_upfirdn2d_adjoint():
    """<y, A x> == <Aᵀ y, x>: the VJP of upfirdn2d is the transpose operator
    (another upfirdn2d with flipped filter and swapped up/down — derived
    automatically by XLA's conv transpose rule)."""
    f = setup_filter([1, 3, 3, 1])
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 6, 6, 2))

    def op(x):
        return upfirdn2d(x, f, up=2, padding=(2, 1, 2, 1), gain=4.0)

    y = jax.random.normal(jax.random.PRNGKey(1), op(x).shape)
    _, vjp = jax.vjp(op, x)
    (atx,) = vjp(y)
    lhs = float(jnp.sum(op(x) * y))
    rhs = float(jnp.sum(x * atx))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


# ----------------------------------- bias_act ------------------------------ #


@pytest.mark.parametrize("act,fn,gain", [
    ("linear", lambda x: x, 1.0),
    ("relu", lambda x: np.maximum(x, 0), np.sqrt(2.0)),
    ("lrelu", lambda x: np.where(x >= 0, x, 0.2 * x), np.sqrt(2.0)),
])
def test_bias_act_semantics(rng, act, fn, gain):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), act=act)
    want = fn(x + b) * gain
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_bias_act_clamp_and_gain(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32) * 10
    got = bias_act(jnp.asarray(x), act="linear", gain=2.0, clamp=4.0)
    want = np.clip(x * 2.0, -4.0, 4.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_bias_act_axis(rng):
    """Reference biases dim 1 (NCHW); we default to channels-last but support any axis."""
    x = rng.standard_normal((2, 5, 3, 3)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), axis=1, act="relu")
    want = np.maximum(x + b[None, :, None, None], 0) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_bias_act_pallas_matches_xla(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32)
    b = rng.standard_normal((128,)).astype(np.float32)
    want = bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", clamp=1.0)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", clamp=1.0, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


# ------------------------------ conv2d_resample ----------------------------- #


def _conv_valid_ref(x, w, flip_weight=True):
    """Direct NHWC VALID correlation oracle."""
    kh, kw, ci, co = w.shape
    if not flip_weight:
        w = w[::-1, ::-1]
    B, H, W, C = x.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    out = np.zeros((B, Ho, Wo, co))
    for i in range(kh):
        for j in range(kw):
            out += np.einsum("bhwc,cd->bhwd", x[:, i:i + Ho, j:j + Wo, :], w[i, j])
    return out


@pytest.mark.parametrize("up,k", [(1, 3), (1, 1), (2, 3)])
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_matches_oracle(rng, up, k, flip_weight):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((k, k, 4, 6)).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1]))

    got = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=jnp.asarray(f),
                          up=up, padding=k // 2, flip_weight=flip_weight)

    # Oracle: upfirdn (halo-padded) then VALID conv — the documented composition.
    fw = f.shape[0]
    p = k // 2
    if up > 1:
        px0 = p + (fw + up - 1) // 2
        px1 = p + (fw - up) // 2
        xx = upfirdn2d_ref(x, f, up=up, padding=(px0, px1, px0, px1), gain=up * up)
    else:
        xx = upfirdn2d_ref(x, None, padding=p)
    want = _conv_valid_ref(xx, w, flip_weight)

    assert got.shape == (2, 8 * up, 8 * up, 6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_conv2d_resample_down(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    got = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=jnp.asarray(f), down=2, padding=1)
    assert got.shape == (1, 4, 4, 5)


# ------------------------------ modulated conv ------------------------------ #


def test_modulated_conv2d_demodulation(rng):
    """Check y = demod * conv(x * s, w) against a direct per-sample-weight oracle."""
    B, H, Wd, Ci, Co, k = 3, 6, 6, 4, 5, 3
    x = rng.standard_normal((B, H, Wd, Ci)).astype(np.float32)
    w = rng.standard_normal((k, k, Ci, Co)).astype(np.float32)
    s = rng.standard_normal((B, Ci)).astype(np.float32) + 1.0

    got = modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), padding=1)

    # Oracle: build the per-sample demodulated weight explicitly.
    want = np.zeros((B, H, Wd, Co), np.float32)
    for b in range(B):
        wb = w * s[b][None, None, :, None]  # modulate
        d = 1.0 / np.sqrt((wb ** 2).sum(axis=(0, 1, 2)) + 1e-8)  # (Co,)
        wb = wb * d[None, None, None, :]
        xp = np.pad(x[b:b + 1], ((0, 0), (1, 1), (1, 1), (0, 0)))
        want[b] = _conv_valid_ref(xp, wb)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_modulated_conv2d_no_demod_is_linear_in_styles(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 3, 2)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    y1 = modulated_conv2d(x, w, s, demodulate=False)
    y2 = modulated_conv2d(x, w, 2.0 * s, demodulate=False)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)


def test_modulated_conv2d_grad_flows(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))

    def loss(w, s):
        return jnp.sum(modulated_conv2d(x, w, s, padding=1) ** 2)

    gw, gs = jax.grad(loss, argnums=(0, 1))(w, s)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.abs(gs).sum()) > 0
