"""Concept2CLIP — map concept spaces to CLIP embedding space.

Reference: viscoin/models/concept2clip.py. A 3-layer ReLU MLP from the
flattened concept space (9*K) — or from the W+ space (num_ws * w_dim) for the
StyleGAN variant — to the CLIP embedding dim, hidden size = (in + out) // 2.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from viscoin_tpu.models.stylegan import flatten_concepts


class Concept2CLIP(nn.Module):
    """Concept space (B,3,3,K) or (B,9K) → CLIP embeddings (B, clip_dim)."""

    n_concepts: int = 256
    clip_dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = flatten_concepts(x)  # torch-order flatten of (B,K,3,3)
        hidden = (self.n_concepts * 9 + self.clip_dim) // 2
        x = nn.relu(nn.Dense(hidden, name="fc0")(x))
        x = nn.relu(nn.Dense(hidden, name="fc1")(x))
        return nn.Dense(self.clip_dim, name="fc2")(x)


class Concept2CLIPStyleGAN(nn.Module):
    """W+ space (B, num_ws, w_dim) → CLIP embeddings (B, clip_dim)."""

    n_style_layers: int = 14
    layer_dim: int = 512
    clip_dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        hidden = (self.n_style_layers * self.layer_dim + self.clip_dim) // 2
        x = nn.relu(nn.Dense(hidden, name="fc0")(x))
        x = nn.relu(nn.Dense(hidden, name="fc1")(x))
        return nn.Dense(self.clip_dim, name="fc2")(x)
