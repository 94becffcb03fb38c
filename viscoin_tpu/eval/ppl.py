"""PPL: perceptual path length of a generator.

The stylegan2-ada ecosystem's ``calc_metrics.py ppl2_wend`` analogue (the
third headline GAN metric after FID/KID — latent-space smoothness, reference
ecosystem: the reference consumes pickles selected by these metrics,
viscoin/cli/train.py:202-205). Semantics follow the upstream sampler:
endpoints w0, w1 = mapping(z0), mapping(z1) with no truncation, then a
``sampling`` knob matching upstream's ``t = rand * (1 if sampling == 'full'
else 0)``: ``"end"`` (the default, the published ppl2_wend configuration)
measures the segment START — wt0 = w0, wt1 = lerp(w0, w1, epsilon) —
while ``"full"`` draws t ~ U(0, 1) along the whole segment. Both endpoints
are synthesized with shared const noise in ONE batched synthesis call,
distance = lpips(img_t, img_t+eps) / epsilon², and the mean taken over the
[p1, p99] interquantile samples (the upstream outlier filter, lower/higher
percentile rounding like ``np.percentile(..., interpolation=...)`` there).

Perceptual distance, two routes (mirroring the FID detector seam):

* default — this framework's LPIPS-VGG (the lpips-pip convention with
  ported linear heads): absolute PPL values are NOT comparable with
  upstream-published numbers, but comparisons between generators measured
  HERE are (the metric's actual use: ranking checkpoints).
* ``compute_ppl_torchscript`` — a user who has the reference ecosystem's
  ``vgg16.pt`` (the NVlabs TorchScript perceptual network upstream PPL
  runs through) gets NUMERICALLY upstream-comparable values: synthesis
  stays a jitted device program, the distance runs through their exact
  module on host CPU with upstream's image scaling
  ((img+1)·255/2, NCHW, ``resize_images=False, return_lpips=True``,
  squared-L2 over the returned embedding).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def _path_pair_images(generator, gvars, key, batch_size: int,
                      epsilon: float, sampling: str = "end"):
    """The shared device program of both distance routes: z-pair draw →
    W lerp (t per ``sampling``: 0 for 'end' = ppl2_wend, U(0,1) for
    'full') → ONE 2B-batch synthesis with const noise shared across the
    pair (upstream semantics) → (2B, H, W, C) images, average-pooled to
    256² above that resolution (upstream's comparability convention for
    high-res generators)."""
    if sampling not in ("end", "full"):
        raise ValueError(f"sampling must be 'end' or 'full', got {sampling!r}")

    def _mapping(mdl, z):
        return mdl.mapping(z)

    def _synthesis(mdl, ws):
        return mdl.synthesis(ws, noise_mode="const")

    # kt is split in both modes so the z draws (and therefore the measured
    # W endpoints) are identical between 'end' and 'full'.
    kz0, kz1, kt = jax.random.split(key, 3)
    z0 = jax.random.normal(kz0, (batch_size, generator.z_dim))
    z1 = jax.random.normal(kz1, (batch_size, generator.z_dim))
    w0 = generator.apply(gvars, z0, method=_mapping)
    w1 = generator.apply(gvars, z1, method=_mapping)
    if sampling == "full":
        t = jax.random.uniform(kt, (batch_size, 1, 1))
    else:
        t = jnp.zeros((batch_size, 1, 1))
    wt0 = w0 + (w1 - w0) * t
    wt1 = w0 + (w1 - w0) * (t + epsilon)
    img = generator.apply(gvars, jnp.concatenate([wt0, wt1], axis=0),
                          method=_synthesis)
    if img.shape[1] > 256:
        f = img.shape[1] // 256
        img = jnp.mean(img.reshape(img.shape[0], 256, f, 256, f,
                                   img.shape[-1]), axis=(2, 4))
    return img


def make_ppl_sampler(generator, lpips, batch_size: int,
                     epsilon: float = 1e-4, sampling: str = "end"):
    """One jitted program per batch: pair synthesis + LPIPS / eps² fused.
    Returns ``sample(gvars, lparams, key) -> (B,) distances``."""

    @jax.jit
    def sample(gvars, lparams, key):
        img = _path_pair_images(generator, gvars, key, batch_size, epsilon,
                                sampling)
        d = lpips.apply({"params": lparams}, img[:batch_size],
                        img[batch_size:])
        return d.astype(jnp.float32) / (epsilon * epsilon)

    return sample


def make_ppl_pair_fn(generator, batch_size: int, epsilon: float = 1e-4,
                     sampling: str = "end"):
    """Jitted pair-image program alone (the TorchScript distance route):
    ``pairs(gvars, key) -> (2B, H, W, C)``."""

    @jax.jit
    def pairs(gvars, key):
        return _path_pair_images(generator, gvars, key, batch_size, epsilon,
                                 sampling)

    return pairs


def torchscript_pair_distances(module, img: np.ndarray,
                               epsilon: float) -> np.ndarray:
    """Upstream distance of a (2B, H, W, C) synthesis pair batch through the
    NVlabs ``vgg16.pt`` module: (img+1)·255/2 scaling, NCHW,
    ``resize_images=False, return_lpips=True``, squared-L2 between the
    pair's embeddings / eps² (upstream metrics/perceptual_path_length.py
    semantics)."""
    import torch

    if img.shape[-1] == 1:
        # Upstream repeats grayscale to 3 channels before the VGG
        # (img.repeat([1,3,1,1]) in perceptual_path_length.py).
        img = np.tile(img, (1, 1, 1, 3))
    x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()).float()
    x = (x + 1.0) * (255.0 / 2.0)
    with torch.no_grad():
        feats = module(x, resize_images=False, return_lpips=True)
    f0, f1 = feats.chunk(2)
    d = (f0 - f1).square().sum(dim=1) / (epsilon * epsilon)
    return d.cpu().numpy().astype(np.float64)


def compute_ppl_torchscript(generator, gvars, ts_path: str, n_samples: int,
                            batch_size: int, seed: int = 0,
                            epsilon: float = 1e-4,
                            sampling: str = "end") -> float:
    """PPL with the distance through the reference ecosystem's ``vgg16.pt``
    TorchScript perceptual network (host CPU — numerically comparable with
    upstream-published ppl2_wend numbers at the default sampling='end',
    unlike the default LPIPS route). Synthesis stays the jitted device
    program; per-batch keys are identical to :func:`compute_ppl`, so the
    two routes measure the same segments."""
    import torch

    module = torch.jit.load(ts_path).eval()
    pair_fn = make_ppl_pair_fn(generator, batch_size, epsilon, sampling)
    base = jax.random.PRNGKey(seed)
    out = []
    for j in range(math.ceil(n_samples / batch_size)):
        img = np.asarray(pair_fn(gvars, jax.random.fold_in(base, j)))
        out.append(torchscript_pair_distances(module, img, epsilon))
    return ppl_from_distances(np.concatenate(out)[:n_samples])


def ppl_from_distances(dists: np.ndarray) -> float:
    """Mean over the [p1, p99] interquantile distances (the upstream
    outlier filter — single extreme segments otherwise dominate; lower/
    higher percentile rounding matches upstream's
    ``np.percentile(..., interpolation='lower'/'higher')``)."""
    dists = np.asarray(dists, np.float64)
    lo = np.percentile(dists, 1, method="lower")
    hi = np.percentile(dists, 99, method="higher")
    return float(dists[(dists >= lo) & (dists <= hi)].mean())


def compute_ppl(generator, gvars, lpips, lparams, n_samples: int,
                batch_size: int, seed: int = 0,
                epsilon: float = 1e-4, sampling: str = "end") -> float:
    """PPL over ``n_samples`` path segments, deterministic in ``seed``
    (per-batch keys fold off the seed root, disjoint from training
    streams)."""
    sampler = make_ppl_sampler(generator, lpips, batch_size, epsilon,
                               sampling)
    base = jax.random.PRNGKey(seed)
    out = []
    for j in range(math.ceil(n_samples / batch_size)):
        out.append(np.asarray(sampler(gvars, lparams,
                                      jax.random.fold_in(base, j))))
    return ppl_from_distances(np.concatenate(out)[:n_samples])
