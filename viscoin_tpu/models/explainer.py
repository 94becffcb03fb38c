"""Explainer `Theta` — class prediction from the concept space.

Reference: viscoin/models/explainers.py:13-56. Dropout(0.01) →
max-pool each 3x3 concept map to a scalar → Linear(n_concepts → n_classes),
optionally weight-normalized (torch ``weight_norm`` parametrization:
w = g * v / ||v||, norm over the input dim per output row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscoin_tpu.models.concept_extractor import max_pool_concepts


class Explainer(nn.Module):
    n_concepts: int = 256
    n_classes: int = 200
    normalized: bool = False

    @nn.compact
    def __call__(self, phi: jax.Array, train: bool = False,
                 deterministic: bool | None = None) -> jax.Array:
        """phi: (B, 3, 3, K) NHWC concept maps → (B, n_classes) logits."""
        deterministic = not train if deterministic is None else deterministic
        x = nn.Dropout(0.01, deterministic=deterministic)(phi)
        x = max_pool_concepts(x)  # (B, K)

        if self.normalized:
            # torch weight_norm: weight = g * v / ||v||_2 (per output row)
            v = self.param("weight_v", nn.initializers.lecun_normal(),
                           (self.n_classes, self.n_concepts))
            g = self.param("weight_g", nn.initializers.ones, (self.n_classes, 1))
            w = g * v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
            b = self.param("bias", nn.initializers.zeros, (self.n_classes,))
            return x @ w.T + b
        return nn.Dense(self.n_classes, name="linear")(x)

    @staticmethod
    def effective_weight(params: dict) -> jax.Array:
        """The (n_classes, n_concepts) linear weight, resolving weight_norm —
        used by concept amplification (testing/viscoin.py:235,250)."""
        if "linear" in params:
            return params["linear"]["kernel"].T
        v, g = params["weight_v"], params["weight_g"]
        return g * v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
