"""StyleGAN2 adversarial training step (generator + discriminator).

The reference repo does not train GANs itself — it consumes pretrained
pickles produced by the external stylegan2-ada-pytorch trainer (SURVEY.md
§2.2), whose CUDA `conv2d_gradfix` plugin exists solely so the R1 gradient
penalty can double-backprop through cuDNN. In JAX, ``jax.grad`` composes to
any order natively, so the full StyleGAN2 objective — non-saturating
logistic loss + lazy R1 regularization — is a few lines. Provided so
generators for new datasets (e.g. the FunnyBirds export,
data/datasets.py::export_funnybirds_stylegan_zip) can be trained/fine-tuned
in-framework, data-parallel over a mesh like the VisCoIN step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct



@dataclass
class GANTrainingParams:
    learning_rate: float = 2.5e-3
    beta1: float = 0.0
    beta2: float = 0.99
    r1_gamma: float = 1.0  # R1 weight (ADA 'auto' scales with resolution/batch)
    r1_interval: int = 16  # lazy regularization cadence
    batch_size: int = 16


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any


def create_gan_train_state(generator, discriminator, rng, cfg: GANTrainingParams,
                           image_size: int):
    kg, kd = jax.random.split(rng)
    g_vars = generator.init({"params": kg}, jnp.zeros((1, generator.z_dim)),
                            noise_mode="const")
    d_vars = discriminator.init(kd, jnp.zeros((1, image_size, image_size, 3)))
    tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_opt_state=tx.init(g_vars["params"]),
        d_opt_state=tx.init(d_vars["params"]),
    )
    g_extras = {k: v for k, v in g_vars.items() if k != "params"}
    return state, g_extras


def make_gan_train_step(generator, discriminator, cfg: GANTrainingParams,
                        g_extras: Any, preprocess: bool = True):
    """One jitted alternating G/D step with lazy R1.

    Returns step(state, images_u8, rng) -> (state, metrics)."""
    tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)

    def gen_images(g_params, z, rng):
        variables = {"params": g_params, **g_extras}
        return generator.apply(variables, z, noise_mode="random",
                               rngs={"noise": rng})

    def g_loss_fn(g_params, d_params, z, rng):
        fake = gen_images(g_params, z, rng)
        logits = discriminator.apply({"params": d_params}, fake)
        return jnp.mean(jax.nn.softplus(-logits))  # non-saturating G loss

    def d_loss_fn(d_params, g_params, real, z, rng, r1_weight):
        fake = gen_images(g_params, z, rng)
        fake_logits = discriminator.apply({"params": d_params}, fake)
        real_logits = discriminator.apply({"params": d_params}, real)
        loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(
            jax.nn.softplus(-real_logits))

        # R1 gradient penalty: ||∇_x D(x)||² on reals — second-order autodiff,
        # no gradfix machinery needed.
        def d_sum(x):
            return jnp.sum(discriminator.apply({"params": d_params}, x))

        grad_real = jax.grad(d_sum)(real)
        r1 = jnp.mean(jnp.sum(jnp.square(grad_real), axis=(1, 2, 3)))
        loss = loss + r1_weight * (cfg.r1_gamma / 2) * r1 * cfg.r1_interval
        return loss, r1

    def step(state: GANTrainState, images_u8, rng):
        k_flip, kz1, kz2, kn1, kn2 = jax.random.split(rng, 5)
        if preprocess:
            # GANs train on [-1, 1] images
            x = images_u8.astype(jnp.float32) / 127.5 - 1.0
            flips = jax.random.bernoulli(k_flip, 0.5, (images_u8.shape[0],))
            x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
        else:
            x = images_u8
        B = x.shape[0]

        # G step.
        z = jax.random.normal(kz1, (B, generator.z_dim))
        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
            state.g_params, state.d_params, z, kn1)
        g_updates, g_opt_state = tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # D step with lazy R1.
        r1_weight = (state.step % cfg.r1_interval == 0).astype(jnp.float32)
        z = jax.random.normal(kz2, (B, generator.z_dim))
        (d_loss, r1), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_params, x, z, kn2, r1_weight)
        d_updates, d_opt_state = tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = state.replace(step=state.step + 1, g_params=g_params,
                                  d_params=d_params, g_opt_state=g_opt_state,
                                  d_opt_state=d_opt_state)
        return new_state, {"g_loss": g_loss, "d_loss": d_loss, "r1": r1}

    return step
