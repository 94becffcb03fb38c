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


def gradcam_heatmap(activation: jax.Array, gradient: jax.Array) -> np.ndarray:
    """(B, H, W, C) activation + same-shape dL/dA → (B, H, W) heatmaps
    (reference math: gradcam.py:26-46)."""
    weights = jnp.mean(gradient, axis=(1, 2))  # (B, C)
    maps = jnp.sum(activation * weights[:, None, None, :], axis=-1)  # (B, H, W)
    maps = jnp.maximum(maps, 0.0)
    mn = jnp.min(maps, axis=(1, 2), keepdims=True)
    mx = jnp.max(maps, axis=(1, 2), keepdims=True)
    denom = jnp.where(mx - mn == 0, 1.0, mx - mn)
    return np.asarray((maps - mn) / denom)


def concept_extractor_gradcams(models, images: jax.Array, labels: jax.Array):
    """GradCAM heatmaps for conv1..conv5 of the concept extractor w.r.t. the
    explainer cross-entropy (reference: cli/concept_heatmaps.py:33-66).

    Returns (heatmaps dict name->(B,H,W) numpy, explainer_logits)."""
    from viscoin_tpu.train.losses import softmax_cross_entropy

    variables = {
        "classifier": models.classifier_vars,
        "psi": models.concept_params,
        "theta": models.explainer_params,
    }

    # Re-express Psi's forward with explicit taps so we can differentiate
    # w.r.t. additive zero-perturbations on each conv output (the functional
    # equivalent of the reference's backward hooks).
    psi_params = models.concept_params

    def psi_forward(latents, eps):
        from flax import linen as nn

        def conv(p, x, stride):
            kernel, bias = p["kernel"], p["bias"]
            y = jax.lax.conv_general_dilated(
                x, kernel, (stride, stride),
                [((kernel.shape[0]) // 2,) * 2, ((kernel.shape[1]) // 2,) * 2],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            return y

        taps = {}
        x1 = conv(psi_params["conv1"], latents[0], 4) + eps["conv1"]
        taps["conv1"] = x1
        x2 = conv(psi_params["conv2"], latents[1], 2) + eps["conv2"]
        taps["conv2"] = x2
        x3 = conv(psi_params["conv3"], latents[2], 1) + eps["conv3"]
        taps["conv3"] = x3
        x = jnp.concatenate([nn.relu(x1), nn.relu(x2), nn.relu(x3)], axis=-1)
        x4 = conv(psi_params["conv4"], x, 1) + eps["conv4"]
        taps["conv4"] = x4
        x = nn.relu(x4)
        x5 = conv(psi_params["conv5"], x, 1) + eps["conv5"]
        taps["conv5"] = x5
        from viscoin_tpu.models.concept_extractor import adaptive_avg_pool

        phi = adaptive_avg_pool(nn.relu(x5), 3)
        return phi, taps

    @jax.jit
    def compute(variables, images, labels):
        _, hidden = models.classifier.apply(variables["classifier"], images, train=False)
        latents = tuple(hidden[-3:])

        # shapes of the taps for zero perturbations
        _, taps0 = psi_forward(latents, {
            k: 0.0 for k in ["conv1", "conv2", "conv3", "conv4", "conv5"]
        })
        eps0 = jax.tree_util.tree_map(jnp.zeros_like, taps0)

        def loss_fn(eps):
            phi, taps = psi_forward(latents, eps)
            logits = models.explainer.apply({"params": variables["theta"]}, phi)
            return softmax_cross_entropy(logits, labels), (taps, logits)

        grads, (taps, logits) = jax.grad(loss_fn, has_aux=True)(eps0)
        return taps, grads, logits

    taps, grads, logits = compute(variables, images, labels)
    heatmaps = {name: gradcam_heatmap(taps[name], grads[name]) for name in taps}
    return heatmaps, np.asarray(logits)
