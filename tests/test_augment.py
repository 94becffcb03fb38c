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


def _oracle_warp(img, A, v):
    """One-pass bilinear warp oracle: map_coordinates(order=1, constant-0)
    at src = A @ (p - c) + c + v (the semantics twopass_warp implements)."""
    from jax.scipy.ndimage import map_coordinates

    H, W, C = img.shape
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = A[0, 0] * (xx - cx) + A[0, 1] * (yy - cy) + cx + v[0]
    sy = A[1, 0] * (xx - cx) + A[1, 1] * (yy - cy) + cy + v[1]
    chans = [map_coordinates(img[..., c], [sy, sx], order=1, mode="constant",
                             cval=0.0) for c in range(C)]
    return jnp.stack(chans, axis=-1)


def test_twopass_warp_exact_for_axis_aligned_maps(rng):
    """twopass_warp == one-pass bilinear whenever a10 == 0: scales, x-shear,
    flips, 180° rotations, and integer/fractional translations (incl. the
    zero padding at the borders)."""
    from viscoin_tpu.train.augment import twopass_warp

    img = jnp.asarray(rng.normal(size=(12, 12, 3)).astype(np.float32))
    cases = [
        (np.eye(2), np.array([3.0, -2.0])),            # integer translate
        (np.eye(2), np.array([0.7, -1.3])),            # fractional translate
        (np.diag([1.3, 0.8]), np.array([0.5, 0.0])),   # aniso scale
        (np.array([[-1.0, 0.0], [0.0, 1.0]]), np.zeros(2)),   # x-flip
        (-np.eye(2), np.zeros(2)),                     # 180° rotation
        (np.array([[1.0, 0.4], [0.0, 1.0]]), np.zeros(2)),    # x-shear
    ]
    for A, v in cases:
        got = twopass_warp(img[None], jnp.asarray(A, jnp.float32)[None],
                           jnp.asarray(v, jnp.float32)[None])[0]
        want = _oracle_warp(img, A, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=str((A, v)))


def test_twopass_warp_rotation_close_on_smooth_images():
    """For rotation components the two-pass (Catmull–Smith) decomposition is
    an approximation with a sub-pixel smear along the shear direction — on a
    smooth image it stays close to the one-pass bilinear oracle."""
    from viscoin_tpu.train.augment import twopass_warp

    H = W = 24
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = np.exp(-((xx - 11.5) ** 2 + (yy - 11.5) ** 2) / (2 * 5.0**2))
    img = jnp.asarray(np.stack([blob, 1 - blob, blob * 0.5], -1),
                      jnp.float32)
    th = np.deg2rad(30.0)
    A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    got = twopass_warp(img[None], jnp.asarray(A, jnp.float32)[None],
                       jnp.zeros((1, 2), jnp.float32))[0]
    want = _oracle_warp(img, A, np.zeros(2))
    # Interior comparison: near the zero-padded border the sheared pass-1
    # sampling line reaches the padding at slightly different pixels than
    # the one-pass oracle (an O(1)-value x O(smear) band), so the smear
    # bound only holds away from the edges.
    diff = np.abs(np.asarray(got) - np.asarray(want))[6:-6, 6:-6]
    assert diff.max() < 0.05, diff.max()


def test_augment_rot90_blit_exact(rng):
    """A composed map that is purely 90°-rotation-like must come out as an
    exact blit (hat weights ∈ {0,1} + the output rot90 select): drive the
    full pipe with a key whose draws trigger rot90 on some image at p=1 for
    a 2-image batch, and check every output pixel exists verbatim in the
    input image (blit + zero padding only would violate this under any
    interpolation blur — so instead check idempotent structure: applying the
    pipe twice with pure-blit keys keeps values from the original set)."""
    from viscoin_tpu.train.augment import twopass_warp

    # Direct check: R90-extraction path — A = R90 has a00 == 0, so the pipe
    # must route it through the use_k1 branch; emulate by composing
    # A = R90^1 and checking twopass(A @ R90^-1) + rot90 equals np.rot90.
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    r90_inv = np.array([[0.0, 1.0], [-1.0, 0.0]], np.float32)
    a_resid = np.array([[0.0, -1.0], [1.0, 0.0]], np.float32) @ r90_inv
    tmp = twopass_warp(img, jnp.asarray(a_resid)[None],
                       jnp.zeros((1, 2), jnp.float32))
    out = jnp.rot90(tmp, 1, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.rot90(img, 1, axes=(1, 2))),
                               atol=1e-6)


def test_augment_refuses_non_square(rng):
    """Non-square batches raise at trace time: the rot90 stages are only
    area-preserving on square images — a drawn map with a00 ≈ 0 would
    otherwise silently produce inf/NaN pixels."""
    import pytest

    from viscoin_tpu.train.augment import augment

    img = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="square"):
        augment(img, jnp.asarray(0.5), jax.random.PRNGKey(0))


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
