"""ADA augmentation pipe + adaptive-p controller (train/augment.py).

The reference consumes pickles from the upstream stylegan2-ada-pytorch
trainer whose namesake capability is exactly this (upstream
training/augment.py + the training_loop.py r_t heuristic)."""

import numpy as np

import jax
import jax.numpy as jnp

from viscoin_tpu.train.augment import ada_update, augment

KEY = jax.random.PRNGKey(7)


def _images(rng, b=4, s=16):
    return jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32))


def test_augment_p0_is_identity(rng):
    x = _images(rng)
    y = jax.jit(augment)(x, jnp.float32(0.0), KEY)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_augment_p1_transforms_deterministically(rng):
    x = _images(rng)
    y1 = jax.jit(augment)(x, jnp.float32(1.0), KEY)
    y2 = jax.jit(augment)(x, jnp.float32(1.0), KEY)
    y3 = jax.jit(augment)(x, jnp.float32(1.0), jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(y1)).all()
    assert np.abs(np.asarray(y1) - np.asarray(x)).max() > 0.1  # actually transformed
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # pure in key
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))  # key-dependent


def test_augment_p_is_traced_not_static(rng):
    """p rides as a traced value: adapting it must not retrace/recompile."""
    x = _images(rng)
    fn = jax.jit(augment)
    fn(x, jnp.float32(0.2), KEY)
    n0 = fn._cache_size()
    fn(x, jnp.float32(0.7), KEY)
    assert fn._cache_size() == n0


def test_augment_differentiable(rng):
    """R1 and the G loss differentiate through the pipe (upstream run_D
    semantics) — gradients must be finite and nonzero."""
    x = _images(rng)
    g = jax.grad(lambda im: jnp.sum(augment(im, jnp.float32(1.0), KEY) ** 2))(x)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_augment_per_image_independent(rng):
    """Transforms hit images independently: with a moderate p some images of
    a batch stay untouched by a given transform while others change."""
    x = _images(rng, b=16)
    # p small enough that some image escapes all ~10 independent transforms
    y = np.asarray(jax.jit(augment)(x, jnp.float32(0.05), KEY))
    per_img = np.abs(y - np.asarray(x)).reshape(16, -1).max(axis=1)
    assert (per_img < 1e-6).any() and (per_img > 1e-3).any()


def test_ada_update_direction_and_clip():
    """p adapts UP under overfitting signals (r_t > target) and DOWN
    otherwise, clamped to [0, 1] (upstream heuristic, target 0.6)."""

    def run(rt_batch, p0, steps=8):
        p, acc = jnp.float32(p0), jnp.float32(0.0)
        for step in range(steps):
            p, acc = ada_update(p, acc, jnp.float32(rt_batch), jnp.int32(step),
                                batch_size=16)
        return float(p)

    assert run(1.0, 0.5) > 0.5  # D confidently right on reals → augment more
    assert run(-1.0, 0.5) < 0.5  # D losing on reals → augment less
    assert run(-1.0, 0.0) == 0.0  # clamped at 0
    assert run(1.0, 1.0) == 1.0  # clamped at 1


def test_ada_update_applies_on_interval_only():
    p, acc = jnp.float32(0.5), jnp.float32(0.0)
    p1, acc1 = ada_update(p, acc, jnp.float32(1.0), jnp.int32(0), 16, interval=4)
    assert float(p1) == 0.5 and float(acc1) == 1.0  # mid-window: accumulate only
    p2, acc2 = ada_update(p1, jnp.float32(3.0), jnp.float32(1.0), jnp.int32(3),
                          16, interval=4)
    assert float(p2) > 0.5 and float(acc2) == 0.0  # window end: apply + reset
