"""Concept extractor `Psi` — latent concept embeddings from classifier states.

TPU-native (NHWC) re-implementation of the reference ConceptExtractor
(viscoin/models/concept_extractors.py:20-141): the three last ResNet hidden
states (512@28², 1024@14², 2048@7² channels) are projected into a common
(7,7,latent_channels) space by conv1 (5x5/4), conv2 (3x3/2), conv3 (3x3/1),
concatenated, mixed by conv4 (3x3), then split into two heads:

  * ``Phi``   — conv5 (1x1 → n_concepts) + adaptive-avg-pool to 3x3:
               (B, 3, 3, n_concepts) NHWC concept embedding maps.
  * ``Phi'``  — pool(conv4 output) → flatten → linear1 → linear2 (no bias):
               (B, 9 * n_concepts), the GAN-reconstruction helper vector.

All activations are ReLU. The Phi' flatten uses the reference's channel-major
order so torch weights port directly.

Adaptive average pooling 7→3 follows torch's AdaptiveAvgPool2d semantics:
window i covers [floor(i*7/3), ceil((i+1)*7/3)) — windows of size 3,3,3 with
stride 2 for 7→3, realized here as an exact matmul contraction.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(in, out) averaging matrix reproducing torch AdaptiveAvgPool2d."""
    m = np.zeros((in_size, out_size), np.float32)
    for o in range(out_size):
        lo = (o * in_size) // out_size
        hi = -(-((o + 1) * in_size) // out_size)  # ceil
        m[lo:hi, o] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """Exact torch-style adaptive average pooling over NHWC spatial dims,
    expressed as two small matmuls (MXU-friendly, no gather)."""
    mh = jnp.asarray(_adaptive_pool_matrix(x.shape[1], out_size))
    mw = jnp.asarray(_adaptive_pool_matrix(x.shape[2], out_size))
    x = jnp.einsum("bhwc,hy->bywc", x, mh.astype(x.dtype))
    x = jnp.einsum("bywc,wx->byxc", x, mw.astype(x.dtype))
    return x


class ConceptExtractor(nn.Module):
    """Reference: viscoin/models/concept_extractors.py::ConceptExtractor."""

    n_concepts: int = 256
    latent_channels: int = 512
    input_channels1: int = 512
    input_channels2: int = 1024
    input_channels3: int = 2048

    @nn.compact
    def __call__(self, latent_layers) -> tuple[jax.Array, jax.Array]:
        """latent_layers: 3 NHWC tensors (the classifier's hidden_states[-3:]).

        Returns (Phi (B,3,3,K), Phi' (B,9K))."""
        assert len(latent_layers) == 3
        lc = self.latent_channels
        conv = lambda ch, k, s, name: nn.Conv(  # noqa: E731
            ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, name=name
        )

        # self.perturb taps (no-ops unless a "perturbations" collection is
        # passed) expose each pre-ReLU conv output for GradCAM: utils/gradcam
        # differentiates the loss w.r.t. these taps, replacing the reference's
        # torch backward hooks (viscoin/utils/gradcam.py:9-24) without a
        # second hand-written copy of this forward.
        x1 = nn.relu(self.perturb("tap1", conv(lc, 5, 4, "conv1")(latent_layers[0])))
        x2 = nn.relu(self.perturb("tap2", conv(lc, 3, 2, "conv2")(latent_layers[1])))
        x3 = nn.relu(self.perturb("tap3", conv(lc, 3, 1, "conv3")(latent_layers[2])))

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # (B, 7, 7, 3*lc)
        x = nn.relu(self.perturb("tap4", conv(3 * lc, 3, 1, "conv4")(x)))

        # -------- Phi: concept embedding maps -------- #
        phi = nn.relu(self.perturb("tap5", nn.Conv(self.n_concepts, (1, 1),
                                                   name="conv5")(x)))
        phi = adaptive_avg_pool(phi, 3)  # (B, 3, 3, K)

        # -------- Phi': GAN helper vector -------- #
        y = adaptive_avg_pool(x, 3)  # (B, 3, 3, 3*lc)
        # channel-major flatten to match torch .view(-1, 3*lc*9)
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
        y = nn.relu(nn.Dense(9 * self.n_concepts, name="linear1")(y))
        y = nn.relu(nn.Dense(9 * self.n_concepts, use_bias=False, name="linear2")(y))

        return phi, y


def max_pool_concepts(phi: jax.Array) -> jax.Array:
    """(B, 3, 3, K) → (B, K): per-concept max over the 3x3 map (the
    reference's AdaptiveMaxPool2d(1), used by the explainer and analytics)."""
    return jnp.max(phi, axis=(1, 2))
