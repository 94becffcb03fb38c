"""max_pool_2x2 (ops/pooling.py): forward/backward parity with the XLA
reduce_window/select-and-scatter path it replaces in the LPIPS VGG."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscoin_tpu.ops.pooling import max_pool_2x2


def _ref_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 4, 8, 5), (3, 16, 16, 7)])
def test_forward_matches_reduce_window(shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)), np.asarray(_ref_pool(x)))


def test_grad_matches_select_and_scatter():
    # Distinct values => unique argmax => identical routing.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.permutation(4 * 8 * 8 * 3).reshape(4, 8, 8, 3), jnp.float32)

    def loss_new(x):
        return jnp.sum(max_pool_2x2(x) * jnp.cos(jnp.arange(x.size // 4).reshape(4, 4, 4, 3)))

    def loss_ref(x):
        return jnp.sum(_ref_pool(x) * jnp.cos(jnp.arange(x.size // 4).reshape(4, 4, 4, 3)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_new)(x)), np.asarray(jax.grad(loss_ref)(x)), rtol=1e-6
    )


def test_grad_ties_go_to_first_window_position():
    # All-equal window: the cotangent must route to the row-major-first
    # position (torch MaxPool2d semantics).
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_2x2(x)))(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], np.array([[1.0, 0.0], [0.0, 0.0]])
    )


def test_bf16_and_jit():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 64)), jnp.bfloat16)

    @jax.jit
    def f(x):
        return jax.grad(lambda x: jnp.sum(max_pool_2x2(x).astype(jnp.float32)))(x)

    g = f(x)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x).astype(jnp.float32)))(x)
    np.testing.assert_array_equal(np.asarray(g, np.float32), np.asarray(g_ref, np.float32))
