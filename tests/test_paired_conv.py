"""Width-paired 3x3 conv (ops/paired_conv.py) — exactness vs the plain conv.

The paired form is an algebraic relayout of the same math; on CPU fp32 both
paths accumulate identically enough for near-bit tolerances. VGG16Features
runs its block 1 through this path (models/lpips.py), so the independent
torch-twin LPIPS parity test (test_lpips_parity.py) doubles as an
end-to-end numerical check of the pairing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from viscoin_tpu.models.lpips import VGG16Features
from viscoin_tpu.ops.paired_conv import (
    conv3x3_aligned_to_offset,
    conv3x3_offset_to_aligned,
    max_pool_2x2_aligned,
    offset_phantom_mask,
)


def _conv_same(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("shape,c1,k1,k2", [((2, 8, 12, 3), 3, 5, 7),
                                            ((1, 16, 16, 4), 4, 8, 4)])
def test_paired_chain_exact(shape, c1, k1, k2):
    rng = np.random.default_rng(0)
    b, h, w, _ = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c1, k1)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, k1, k2)), jnp.float32)

    ref1 = jax.nn.relu(_conv_same(x, w1))
    ref2 = jax.nn.relu(_conv_same(ref1, w2))

    xp = x.reshape(b, h, w // 2, 2 * c1)
    y1 = jax.nn.relu(conv3x3_aligned_to_offset(xp, w1))
    y1 = y1 * offset_phantom_mask(y1.shape, k1, y1.dtype)
    y2 = jax.nn.relu(conv3x3_offset_to_aligned(y1, w2))
    out = y2.reshape(b, h, w, k2)
    np.testing.assert_allclose(out, ref2, atol=1e-5, rtol=1e-5)

    pool_ref = lax.reduce_window(ref2, -jnp.inf, lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")
    np.testing.assert_allclose(max_pool_2x2_aligned(y2), pool_ref,
                               atol=1e-5, rtol=1e-5)


def test_paired_chain_grad_exact():
    rng = np.random.default_rng(1)
    b, h, w, c1, k1, k2 = 2, 8, 10, 3, 6, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, c1)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c1, k1)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, k1, k2)), jnp.float32)

    def f_ref(x):
        return jnp.sum(jnp.sin(jax.nn.relu(_conv_same(jax.nn.relu(_conv_same(x, w1)), w2))))

    def f_pair(x):
        xp = x.reshape(b, h, w // 2, 2 * c1)
        y1 = jax.nn.relu(conv3x3_aligned_to_offset(xp, w1))
        y1 = y1 * offset_phantom_mask(y1.shape, k1, y1.dtype)
        y2 = jax.nn.relu(conv3x3_offset_to_aligned(y1, w2))
        return jnp.sum(jnp.sin(y2.reshape(b, h, w, k2)))

    np.testing.assert_allclose(jax.grad(f_ref)(x), jax.grad(f_pair)(x),
                               atol=1e-5, rtol=1e-5)


def test_vgg_paired_matches_unpaired():
    """Same params, paired vs standard block 1: all 5 slices agree, and the
    gradients wrt input (the path the train step differentiates) agree."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    params = VGG16Features(paired_block1=False).init(jax.random.PRNGKey(0), x)["params"]

    f_u = VGG16Features(paired_block1=False).apply({"params": params}, x)
    f_p = VGG16Features(paired_block1=True).apply({"params": params}, x)
    for a, b in zip(f_p, f_u):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    def loss(x, paired):
        f = VGG16Features(paired_block1=paired).apply({"params": params}, x)
        return sum(jnp.sum(jnp.cos(t)) for t in f)

    g_u = jax.grad(loss)(x, False)
    g_p = jax.grad(loss)(x, True)
    np.testing.assert_allclose(g_p, g_u, atol=1e-4, rtol=1e-4)
