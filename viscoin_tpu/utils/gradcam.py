"""GradCAM via functional gradients.

The reference registers forward/backward hooks on torch conv layers
(viscoin/utils/gradcam.py). In JAX there are no hooks: we capture the
intermediate activation with ``nn.Module.capture_intermediates`` / a
perturbation trick — here, the cleanest functional equivalent:

    heatmap(A, dL/dA) = relu( Σ_c mean_hw(dL/dA)_c * A_c ), min-max normalized

computed from (activation, gradient-of-loss-wrt-activation) pairs obtained by
differentiating the loss w.r.t. the *captured intermediate* via a zero
perturbation argument. :func:`concept_extractor_gradcams` packages this for
the 5 conv layers of the concept extractor (the `concept-heatmaps` CLI).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gradcam_heatmap_device(activation: jax.Array, gradient: jax.Array) -> jax.Array:
    """(B, H, W, C) activation + same-shape dL/dA → (B, H, W) heatmaps
    (reference math: gradcam.py:26-46). Pure jnp — jittable, used by both
    the offline CLI path below and the serving ``explain`` endpoint."""
    weights = jnp.mean(gradient, axis=(1, 2))  # (B, C)
    maps = jnp.sum(activation * weights[:, None, None, :], axis=-1)  # (B, H, W)
    maps = jnp.maximum(maps, 0.0)
    mn = jnp.min(maps, axis=(1, 2), keepdims=True)
    mx = jnp.max(maps, axis=(1, 2), keepdims=True)
    denom = jnp.where(mx - mn == 0, 1.0, mx - mn)
    return (maps - mn) / denom


def gradcam_heatmap(activation: jax.Array, gradient: jax.Array) -> np.ndarray:
    """Host-side convenience wrapper of :func:`gradcam_heatmap_device`."""
    return np.asarray(gradcam_heatmap_device(activation, gradient))


# ConceptExtractor's perturb tap name → reported conv layer name.
_TAPS = {f"tap{i}": f"conv{i}" for i in range(1, 6)}


def concept_extractor_gradcams(models, images: jax.Array | None = None,
                               labels: jax.Array | None = None,
                               latents=None):
    """GradCAM heatmaps for conv1..conv5 of the concept extractor w.r.t. the
    explainer cross-entropy (reference: cli/concept_heatmaps.py:33-66).

    Uses the ONE real Psi forward: `ConceptExtractor` exposes each pre-ReLU
    conv output through ``nn.Module.perturb`` taps; differentiating the loss
    w.r.t. the zero perturbations yields dL/dA (the functional equivalent of
    the reference's backward hooks, viscoin/utils/gradcam.py:9-24).

    Either ``images`` (run through the classifier) or precomputed ``latents``
    (the classifier's hidden_states[-3:]) must be given.

    Returns (heatmaps dict name->(B,H,W) numpy, explainer_logits)."""
    from viscoin_tpu.train.losses import softmax_cross_entropy

    psi = models.concept_extractor
    if latents is None:
        _, hidden = jax.jit(
            lambda v, x: models.classifier.apply(v, x, train=False)
        )(models.classifier_vars, images)
        latents = tuple(hidden[-3:])
    variables = {"psi": models.concept_params, "theta": models.explainer_params}

    @jax.jit
    def compute(variables, latents, labels):
        # Zero perturbations, shaped by the module itself.
        _, pert0 = psi.apply({"params": variables["psi"]}, latents,
                             mutable="perturbations")
        eps0 = pert0["perturbations"]

        def loss_fn(eps):
            (phi, _), taps = psi.apply(
                {"params": variables["psi"], "perturbations": eps}, latents,
                capture_intermediates=lambda mdl, _: mdl.name in _TAPS.values(),
                mutable=["intermediates"],
            )
            logits = models.explainer.apply({"params": variables["theta"]}, phi)
            acts = {name: taps["intermediates"][name]["__call__"][0]
                    for name in _TAPS.values()}
            return softmax_cross_entropy(logits, labels), (acts, logits)

        grads, (acts, logits) = jax.grad(loss_fn, has_aux=True)(eps0)
        return acts, grads, logits

    acts, grads, logits = compute(variables, tuple(latents), labels)
    heatmaps = {_TAPS[tap]: gradcam_heatmap(acts[_TAPS[tap]], grads[tap])
                for tap in sorted(_TAPS)}
    return heatmaps, np.asarray(logits)
