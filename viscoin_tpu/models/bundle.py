"""VisCoINModels bundle: the four ensemble models + their variables.

Reference: viscoin/models/utils.py:18-25 (a dataclass of the 4 torch models).
In JAX, module definitions and parameters are separate, so the bundle holds
both. Checkpoint I/O lives in utils/checkpoints.py (orbax); precompute
helpers (concept space / W+ space, reference utils.py:27-174) are in
eval/spaces.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted


@dataclass
class VisCoINModels:
    """The ensemble: classifier f, concept extractor Psi, explainer Theta,
    adapted generator — module defs + variables."""

    classifier: Classifier
    concept_extractor: ConceptExtractor
    explainer: Explainer
    gan: GeneratorAdapted

    classifier_vars: Any = None  # {"params", "batch_stats"}
    concept_params: Any = None
    explainer_params: Any = None
    gan_vars: Any = None  # {"params": {"mapping", "synthesis"}, "noise"}

    # ----------------------- jittable forward helpers ----------------------- #

    def classify(self, images: jax.Array, train: bool = False):
        """f(x) → (logits, hidden_states)."""
        return self.classifier.apply(self.classifier_vars, images, train=train)

    def extract_concepts(self, hidden_states):
        """Psi(hidden[-3:]) → (Phi, Phi')."""
        return self.concept_extractor.apply(
            {"params": self.concept_params}, tuple(hidden_states[-3:])
        )

    def explain(self, phi: jax.Array):
        """Theta(Phi) → logits."""
        return self.explainer.apply({"params": self.explainer_params}, phi)

    def reconstruct(self, phi, phi_prime, noise_mode: str = "const",
                    return_latents: bool = False, rng: jax.Array | None = None):
        """G(z1=Phi, z2=Phi') → image (and optionally W+)."""
        rngs = {"noise": rng} if (noise_mode == "random" and rng is not None) else None
        return self.gan.apply(self.gan_vars, phi, phi_prime,
                              return_latents=return_latents,
                              noise_mode=noise_mode, rngs=rngs)

    def forward_all(self, images: jax.Array, noise_mode: str = "const",
                    rng: jax.Array | None = None):
        """The canonical VisCoIN pass (reference example.py:49-66):
        f → Psi → Theta, G(Phi, Phi') → reconstruction."""
        logits, hidden = self.classify(images)
        phi, phi_prime = self.extract_concepts(hidden)
        expl_logits = self.explain(phi)
        recon, ws = self.reconstruct(phi, phi_prime, noise_mode=noise_mode,
                                     return_latents=True, rng=rng)
        return {
            "logits": logits,
            "phi": phi,
            "phi_prime": phi_prime,
            "explainer_logits": expl_logits,
            "reconstruction": recon,
            "ws": ws,
        }


def default_models(n_classes: int = 200, n_concepts: int = 256,
                   img_resolution: int = 256, channel_base: int = 32768,
                   channel_max: int = 512) -> VisCoINModels:
    """Module definitions with the reference's default hyperparameters."""
    return VisCoINModels(
        classifier=Classifier(output_classes=n_classes),
        concept_extractor=ConceptExtractor(n_concepts=n_concepts),
        explainer=Explainer(n_concepts=n_concepts, n_classes=n_classes),
        gan=GeneratorAdapted(z_dim=n_concepts, img_resolution=img_resolution,
                             channel_base=channel_base, channel_max=channel_max),
    )


def init_models(models: VisCoINModels, rng: jax.Array, image_size: int = 256,
                batch: int = 1) -> VisCoINModels:
    """Random-initialize every variable collection.

    The whole init is ONE jitted program: eager per-op dispatch is expensive
    on remote-attached TPUs, and a fused init also avoids materializing
    intermediate activations on the host."""

    def _init(rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
        classifier_vars = models.classifier.init(k1, x, train=False)
        _, hidden = models.classifier.apply(classifier_vars, x, train=False)
        concept_params = models.concept_extractor.init(k2, tuple(hidden[-3:]))["params"]
        phi, phi_prime = models.concept_extractor.apply(
            {"params": concept_params}, tuple(hidden[-3:])
        )
        explainer_params = models.explainer.init(k3, phi)["params"]
        gan_vars = models.gan.init({"params": k4}, phi, phi_prime, noise_mode="const")
        return classifier_vars, concept_params, explainer_params, gan_vars

    (models.classifier_vars, models.concept_params,
     models.explainer_params, models.gan_vars) = jax.jit(_init)(rng)
    return models
