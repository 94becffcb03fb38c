"""StyleGAN2 adversarial training step: runs, both nets update, R1 is a
live second-order term (the capability the reference outsourced to
stylegan2-ada-pytorch + its conv2d_gradfix CUDA shim)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.models.stylegan import Discriminator, Generator
from viscoin_tpu.train.gan import (
    GANTrainingParams,
    create_gan_train_state,
    make_gan_train_step,
)

IMG = 16


def test_gan_train_step(rng):
    generator = Generator(z_dim=8, w_dim=16, img_resolution=IMG,
                          channel_base=256, channel_max=16, mapping_layers=1)
    discriminator = Discriminator(img_resolution=IMG, channel_base=256,
                                  channel_max=16, mbstd_group_size=2)
    cfg = GANTrainingParams(batch_size=4, r1_interval=2)
    state, g_noise = create_gan_train_state(generator, discriminator,
                                            jax.random.PRNGKey(0), cfg, IMG)
    step = jax.jit(make_gan_train_step(generator, discriminator, cfg, g_noise))

    images = jnp.asarray(rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8))
    g0 = jax.tree_util.tree_map(np.copy, state.g_params)
    d0 = jax.tree_util.tree_map(np.copy, state.d_params)

    state, m0 = step(state, images, jax.random.PRNGKey(1))  # step 0: R1 on
    state, m1 = step(state, images, jax.random.PRNGKey(2))  # step 1: R1 off

    for m in (m0, m1):
        for k, v in m.items():
            assert np.isfinite(float(v)), k
    # R1 is a real (nonzero) second-order quantity when active
    assert float(m0["r1"]) > 0

    for name, before, after in [("G", g0, state.g_params), ("D", d0, state.d_params)]:
        moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree_util.tree_leaves(before),
                                    jax.tree_util.tree_leaves(after)))
        assert moved, f"{name} did not update"
