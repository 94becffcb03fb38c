"""PPL: perceptual path length of a generator.

The stylegan2-ada ecosystem's ``calc_metrics.py ppl2_wend`` analogue (the
third headline GAN metric after FID/KID — latent-space smoothness, reference
ecosystem: the reference consumes pickles selected by these metrics,
viscoin/cli/train.py:202-205). Semantics follow the upstream sampler:
endpoints w0, w1 = mapping(z0), mapping(z1) with no truncation, t ~ U(0, 1)
("wend": the full W-space segment), a step of ``epsilon`` = 1e-4 along it,
both endpoints synthesized with shared const noise in ONE batched synthesis
call, distance = lpips(img_t, img_t+eps) / epsilon², and the mean taken
over the [p1, p99] interquantile samples (the upstream outlier filter).

Documented divergence: the perceptual distance runs through this framework's
LPIPS-VGG (the lpips-pip convention with ported linear heads) instead of the
NVlabs ``vgg16.pt`` TorchScript network — absolute PPL values are therefore
NOT comparable with upstream-published numbers, but comparisons between
generators measured HERE are (the metric's actual use: ranking checkpoints).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def make_ppl_sampler(generator, lpips, batch_size: int,
                     epsilon: float = 1e-4):
    """One jitted program per batch: z-pair draw → W lerp → ONE 2B-batch
    synthesis (const noise shared across the pair, upstream semantics) →
    LPIPS / eps². Returns ``sample(gvars, lparams, key) -> (B,) distances``.

    Images above 256² are average-pooled to 256² before the distance
    (upstream's comparability convention for high-res generators)."""

    def _mapping(mdl, z):
        return mdl.mapping(z)

    def _synthesis(mdl, ws):
        return mdl.synthesis(ws, noise_mode="const")

    @jax.jit
    def sample(gvars, lparams, key):
        kz0, kz1, kt = jax.random.split(key, 3)
        z0 = jax.random.normal(kz0, (batch_size, generator.z_dim))
        z1 = jax.random.normal(kz1, (batch_size, generator.z_dim))
        w0 = generator.apply(gvars, z0, method=_mapping)
        w1 = generator.apply(gvars, z1, method=_mapping)
        t = jax.random.uniform(kt, (batch_size, 1, 1))
        wt0 = w0 + (w1 - w0) * t
        wt1 = w0 + (w1 - w0) * (t + epsilon)
        img = generator.apply(gvars, jnp.concatenate([wt0, wt1], axis=0),
                              method=_synthesis)
        if img.shape[1] > 256:
            f = img.shape[1] // 256
            img = jnp.mean(img.reshape(img.shape[0], 256, f, 256, f,
                                       img.shape[-1]), axis=(2, 4))
        d = lpips.apply({"params": lparams}, img[:batch_size],
                        img[batch_size:])
        return d.astype(jnp.float32) / (epsilon * epsilon)

    return sample


def ppl_from_distances(dists: np.ndarray) -> float:
    """Mean over the [p1, p99] interquantile distances (the upstream
    outlier filter — single extreme segments otherwise dominate)."""
    dists = np.asarray(dists, np.float64)
    lo, hi = np.percentile(dists, 1), np.percentile(dists, 99)
    return float(dists[(dists >= lo) & (dists <= hi)].mean())


def compute_ppl(generator, gvars, lpips, lparams, n_samples: int,
                batch_size: int, seed: int = 0,
                epsilon: float = 1e-4) -> float:
    """PPL over ``n_samples`` path segments, deterministic in ``seed``
    (per-batch keys fold off the seed root, disjoint from training
    streams)."""
    sampler = make_ppl_sampler(generator, lpips, batch_size, epsilon)
    base = jax.random.PRNGKey(seed)
    out = []
    for j in range(math.ceil(n_samples / batch_size)):
        out.append(np.asarray(sampler(gvars, lparams,
                                      jax.random.fold_in(base, j))))
    return ppl_from_distances(np.concatenate(out)[:n_samples])
