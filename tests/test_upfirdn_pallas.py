"""Pallas separable upfirdn2d vs the XLA implementation (exact agreement on
the generator's resampling configurations)."""

import numpy as np
import pytest

import jax.numpy as jnp

from viscoin_tpu.ops import setup_filter, upfirdn2d
from viscoin_tpu.ops.upfirdn2d_pallas import upfirdn2d_pallas

F1D = [1.0, 3.0, 3.0, 1.0]


@pytest.mark.parametrize("case", [
    # (up, down, padding, gain) — the synthesis network's configurations:
    dict(up=2, down=1, padding=(3, 2, 3, 2), gain=4.0),  # up-conv halo path
    dict(up=2, down=1, padding=(2, 1, 2, 1), gain=4.0),  # upsample2d (img skip)
    dict(up=1, down=2, padding=(1, 1, 1, 1), gain=1.0),  # downsample2d
    dict(up=1, down=1, padding=2, gain=1.0),             # pure blur
    dict(up=1, down=1, padding=(-1, 2, 0, -2), gain=1.0),  # crop
])
def test_pallas_matches_xla(rng, case):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 8)).astype(np.float32))
    f2 = setup_filter(F1D)
    want = upfirdn2d(x, f2, **case)
    got = upfirdn2d_pallas(x, F1D, **case)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_asymmetric_taps_flip(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 4)).astype(np.float32))
    taps = [1.0, 2.0, 4.0, 8.0]
    f2 = setup_filter(taps)
    for flip in (False, True):
        want = upfirdn2d(x, f2, up=2, padding=(3, 2, 3, 2), gain=4.0, flip_filter=flip)
        got = upfirdn2d_pallas(x, taps, up=2, padding=(3, 2, 3, 2), gain=4.0,
                               flip_filter=flip)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_odd_channel_padding(rng):
    """Cols not divisible by the lane tile are padded and cropped."""
    x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)).astype(np.float32))
    f2 = setup_filter(F1D)
    want = upfirdn2d(x, f2, up=2, padding=(2, 1, 2, 1), gain=4.0)
    got = upfirdn2d_pallas(x, F1D, up=2, padding=(2, 1, 2, 1), gain=4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
