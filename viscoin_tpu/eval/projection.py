"""Latent projection: invert a target image into the generator's W space.

The stylegan2-ada ecosystem's ``projector.py`` analogue (the reference's GAN
workflows live in that external repo — and VisCoIN itself exists to REPLACE
per-image projection with a learned encoder, so having both in-framework
makes that comparison runnable). Upstream semantics kept: w initialized at
w_avg estimated from ``w_avg_samples`` fresh z draws, annealed w-space
exploration noise (initial_noise_factor 0.05, quadratic ramp over the first
75% of steps), cosine lr ramp-down over the last 25% with a linear 5%
ramp-up, Adam, ``num_steps`` = 1000 defaults, >256² images average-pooled to
256² before the perceptual distance, and joint optimization of the
per-layer synthesis noise buffers under the multi-scale autocorrelation
penalty (weight 1e5) with per-step renormalization to zero mean / unit var.

TPU-first: the ENTIRE optimization is one jitted program — a ``lax.scan``
over steps (per-step schedules computed in-graph from the step index), not
1000 host-dispatched iterations; the noise buffers ride the scan carry as a
pytree under the same Adam state. Documented divergence from upstream: the
image distance is this framework's LPIPS-VGG (lpips-pip heads) instead of
raw NVlabs vgg16.pt feature L2 — projections are therefore not
pixel-comparable with upstream's, but serve the same W-recovery/analysis
purpose.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax


def noise_regularization(noise: jax.Array) -> jax.Array:
    """Upstream projector.py's multi-scale autocorrelation penalty for ONE
    (res, res) noise buffer: at every scale (avg-pooled 2× down to 8²),
    mean(n · roll(n, 1, x))² + mean(n · roll(n, 1, y))² — pushes the buffer
    toward white noise so image content cannot hide in it."""
    n = noise.astype(jnp.float32)
    reg = jnp.float32(0.0)
    while True:
        reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=1)) ** 2
        reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=0)) ** 2
        if n.shape[0] <= 8:
            break
        h = n.shape[0] // 2
        n = n.reshape(h, 2, h, 2).mean(axis=(1, 3))
    return reg


def _normalize_noise(tree):
    """Upstream per-step renormalization: each buffer to zero mean, unit
    RMS (buf -= mean; buf *= rsqrt(mean(buf²)))."""
    def norm(n):
        n = n - jnp.mean(n)
        return n * jax.lax.rsqrt(jnp.mean(jnp.square(n)) + 1e-20)

    return jax.tree_util.tree_map(norm, tree)


def make_projector(generator, lpips, num_steps: int = 1000,
                   w_plus: bool = False, learning_rate: float = 0.1,
                   w_avg_samples: int = 2048,
                   initial_noise_factor: float = 0.05,
                   noise_ramp_length: float = 0.75,
                   lr_rampdown_length: float = 0.25,
                   lr_rampup_length: float = 0.05,
                   optimize_noise: bool = True,
                   regularize_noise_weight: float = 1e5):
    """Returns ``project(gvars, lparams, target, key) -> (w, noise, losses)``:
    ``target`` is (1, H, W, 3) in [-1, 1]; ``w`` comes back as
    (num_ws, w_dim) — a single optimized w broadcast over layers, or
    per-layer with ``w_plus=True`` (W+ recovery). ``noise`` is the jointly
    optimized synthesis-noise collection (the input ``gvars['noise']``
    untouched if ``optimize_noise=False``); ``losses`` is (num_steps,) for
    convergence plots."""
    from viscoin_tpu.models.stylegan import num_ws_for_resolution

    num_ws = num_ws_for_resolution(generator.img_resolution)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999)

    def _mapping(mdl, z):
        return mdl.mapping(z)

    def _synthesis(mdl, ws):
        return mdl.synthesis(ws, noise_mode="const")

    def lr_at(t):
        """Upstream schedule: cosine ramp-down over the last
        ``lr_rampdown_length``, linear ramp-up over the first
        ``lr_rampup_length``."""
        ramp = jnp.minimum(1.0, (1.0 - t) / lr_rampdown_length)
        ramp = 0.5 - 0.5 * jnp.cos(ramp * jnp.pi)
        ramp = ramp * jnp.minimum(1.0, t / lr_rampup_length)
        return learning_rate * ramp

    def pool256(img):
        """Upstream projector.py semantics: images above 256² are
        average-pooled to 256² before the perceptual distance (and it keeps
        the 1000-step scan's LPIPS cost resolution-independent)."""
        if img.shape[1] <= 256:
            return img
        f = img.shape[1] // 256
        return jnp.mean(img.reshape(img.shape[0], 256, f, 256, f,
                                    img.shape[-1]), axis=(2, 4))

    @jax.jit
    def project(gvars, lparams, target, key):
        target = pool256(target)
        kz, knoise, kscan = jax.random.split(key, 3)
        z = jax.random.normal(kz, (w_avg_samples, generator.z_dim))
        ws = generator.apply(gvars, z, method=_mapping)  # (N, num_ws, w_dim)
        w_samples = ws[:, 0].astype(jnp.float32)  # layers identical pre-trunc
        w_avg = jnp.mean(w_samples, axis=0)
        w_std = jnp.sqrt(jnp.mean(jnp.sum(
            jnp.square(w_samples - w_avg), axis=1)))

        w0 = jnp.broadcast_to(w_avg, ((num_ws if w_plus else 1),
                                      w_avg.shape[0]))
        # Upstream resets every noise buffer to fresh N(0, 1) before the
        # joint optimization (the trained buffers are arbitrary anyway).
        if optimize_noise:
            leaves, treedef = jax.tree_util.tree_flatten(gvars["noise"])
            noise0 = jax.tree_util.tree_unflatten(treedef, [
                jax.random.normal(k, n.shape)
                for n, k in zip(leaves,
                                jax.random.split(knoise, len(leaves)))])
        else:
            noise0 = gvars["noise"]

        def loss_fn(w, noise):
            ws_full = (w if w_plus
                       else jnp.broadcast_to(w, (num_ws, w.shape[1])))
            img = generator.apply({**gvars, "noise": noise}, ws_full[None],
                                  method=_synthesis)
            dist = jnp.sum(lpips.apply({"params": lparams},
                                       pool256(img.astype(jnp.float32)),
                                       target))
            if not optimize_noise:
                return dist, dist
            reg = sum(noise_regularization(n)
                      for n in jax.tree_util.tree_leaves(noise))
            return dist + regularize_noise_weight * reg, dist

        def step(carry, i):
            (w, noise), opt_state = carry
            t = i.astype(jnp.float32) / num_steps
            # Annealed exploration noise on the probed point; the additive
            # form keeps d(loss)/dw identical at the noised point (upstream
            # ws + w_noise). Applies to w only, like upstream.
            scale = (w_std * initial_noise_factor
                     * jnp.square(jnp.maximum(0.0, 1.0 - t / noise_ramp_length)))
            w_noised = w + jax.random.normal(
                jax.random.fold_in(kscan, i), w.shape) * scale
            (_, dist), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(w_noised, noise)
            updates, opt_state = adam.update(grads, opt_state, (w, noise))
            w, noise = jax.tree_util.tree_map(
                lambda p, u: p - lr_at(t) * u, (w, noise), updates)
            if optimize_noise:
                noise = _normalize_noise(noise)
            return ((w, noise), opt_state), dist

        ((w, noise), _), losses = jax.lax.scan(
            step, ((w0, noise0), adam.init((w0, noise0))),
            jnp.arange(num_steps))
        w_final = w if w_plus else jnp.broadcast_to(w, (num_ws, w.shape[1]))
        return w_final, noise, losses

    return project


def project_image(generator, gvars, lpips, lparams, target_m11: np.ndarray,
                  num_steps: int = 1000, w_plus: bool = False, seed: int = 0,
                  **kwargs):
    """Host wrapper: project one (H, W, 3) [-1, 1] image; returns
    ``(w (num_ws, w_dim), losses (num_steps,), final u8 render)`` — the
    render uses the jointly optimized noise buffers."""
    project = make_projector(generator, lpips, num_steps=num_steps,
                             w_plus=w_plus, **kwargs)
    target = jnp.asarray(target_m11, jnp.float32)[None]
    w, noise, losses = project(gvars, lparams, target,
                               jax.random.PRNGKey(seed))

    @jax.jit
    def render(gvars, w, noise):
        img = generator.apply(
            {**gvars, "noise": noise}, w[None],
            method=lambda mdl, ws: mdl.synthesis(ws, noise_mode="const"))
        return jnp.clip((img[0].astype(jnp.float32) + 1.0) * 127.5,
                        0.0, 255.0).astype(jnp.uint8)

    return (np.asarray(w), np.asarray(losses),
            np.asarray(render(gvars, w, noise)))
