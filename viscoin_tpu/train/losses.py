"""Loss functions for the VisCoIN ensemble (reference: viscoin/training/losses.py).

All losses are pure jnp functions (no hidden module state): the LPIPS network
is passed in as a callable so the whole training step stays a single jitted
function. Semantics and coefficients match the reference exactly (§2.3 of
SURVEY.md); `stop_gradient` replaces the reference's `.detach()`.

Concept tensors are NHWC: Phi is (B, 3, 3, K).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viscoin_tpu.models.concept_extractor import max_pool_concepts


def entropy_loss(v: jax.Array) -> jax.Array:
    """-Σ p log p over softmax rows (reference: losses.py:12-22 — a SUM over
    all elements, not a mean)."""
    p = jax.nn.softmax(v, axis=1)
    return -jnp.sum(p * jnp.log(p + 1e-30))


def cross_cross_entropy_loss(prediction: jax.Array, target_prediction: jax.Array) -> jax.Array:
    """Soft-label CE between two logit tensors (reference: losses.py:25-29)."""
    logp = jax.nn.log_softmax(prediction, axis=1)
    t = jax.nn.softmax(target_prediction, axis=1)
    return jnp.mean(jnp.sum(-t * logp, axis=1))


def l1_loss(x: jax.Array) -> jax.Array:
    """Mean absolute value (reference: losses.py:32-34, F.l1_loss vs zeros)."""
    return jnp.mean(jnp.abs(x))


def conciseness_diversity_loss(phi: jax.Array, eta: float = 1.0) -> jax.Array:
    """FLINT conciseness/diversity loss — kept for parity, unused by VisCoIN
    (reference: losses.py:42-63)."""
    pooled = max_pool_concepts(phi)  # (B, K)
    return (
        -entropy_loss(jnp.mean(pooled, axis=0, keepdims=True))
        + entropy_loss(pooled)
        + eta * l1_loss(pooled)
    )


def concept_regularization_loss(phi: jax.Array) -> jax.Array:
    """Sparsity: L1 of L2-normalized max-pooled concepts + L1 of the raw
    embeddings (reference: losses.py:66-81)."""
    pooled = max_pool_concepts(phi)  # (B, K)
    norm = jnp.linalg.norm(pooled, axis=1, keepdims=True)
    normed = pooled / jnp.maximum(norm, 1e-12)
    return l1_loss(normed) + l1_loss(phi)


def concept_orthogonality_loss(conv5_kernel: jax.Array) -> jax.Array:
    """Orthogonality of concept dictionary rows (reference: losses.py:84-96).

    Args:
        conv5_kernel: the concept extractor's conv5 kernel, HWIO
            (1, 1, 3*latent_channels, n_concepts) — the torch view
            (n_concepts, -1) corresponds to transposing the last two dims.
    """
    k = conv5_kernel
    n_concepts = k.shape[-1]
    w = jnp.reshape(jnp.transpose(k, (3, 0, 1, 2)), (n_concepts, -1))
    norm = jnp.linalg.norm(w, axis=1, keepdims=True)
    w = jnp.abs(w / jnp.maximum(norm, 1e-12))
    return (jnp.sum(w @ w.T) - n_concepts) / (n_concepts**2)


def reconstruction_loss(
    reconstructed: jax.Array,
    original: jax.Array,
    reconstructed_classes: jax.Array,
    original_classes: jax.Array,
    lpips_fn,
    lambda_classes: float = 0.1,
    lambda_lpips: float = 3.0,
) -> jax.Array:
    """L1 + MSE + β·LPIPS + γ·cross-CE(f(x̂), stopgrad f(x))
    (reference: losses.py:125-157).

    Args:
        lpips_fn: callable (x, y) -> (B,) or scalar perceptual distances
            (see viscoin_tpu.models.lpips)."""
    diff = reconstructed - original
    loss = jnp.mean(jnp.abs(diff)) + jnp.mean(jnp.square(diff))
    loss += lambda_classes * cross_cross_entropy_loss(
        reconstructed_classes, jax.lax.stop_gradient(original_classes)
    )
    loss += lambda_lpips * jnp.mean(lpips_fn(reconstructed, original))
    return loss


def output_fidelity_loss(original_classes: jax.Array, explainer_classes: jax.Array) -> jax.Array:
    """cross-CE(Theta∘Psi logits, stopgrad f logits) (reference: losses.py:165-174)."""
    return cross_cross_entropy_loss(explainer_classes, jax.lax.stop_gradient(original_classes))


def gan_regularization_loss(gan_latents: jax.Array, fixed_w_avg: jax.Array) -> jax.Array:
    """MSE(ws, broadcast stopgrad fixed_w_avg) (reference: losses.py:182-192)."""
    target = jax.lax.stop_gradient(
        jnp.broadcast_to(fixed_w_avg[None, None, :], gan_latents.shape)
    )
    return jnp.mean(jnp.square(gan_latents - target))


def info_nce(
    query: jax.Array,
    positive_key: jax.Array,
    negative_keys: jax.Array | None = None,
    temperature: float = 0.1,
    negative_mode: str = "unpaired",
) -> jax.Array:
    """InfoNCE contrastive loss (reference: losses.py:201-341, vendored from
    RElbers/info-nce-pytorch; not wired into any reference training path)."""

    def normalize(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    query = normalize(query)
    positive_key = normalize(positive_key)
    if negative_keys is not None:
        negative_keys = normalize(negative_keys)
        positive_logit = jnp.sum(query * positive_key, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            negative_logits = query @ negative_keys.T
        else:  # paired: (N, M, D)
            negative_logits = jnp.einsum("nd,nmd->nm", query, negative_keys)
        logits = jnp.concatenate([positive_logit, negative_logits], axis=1)
        labels = jnp.zeros((logits.shape[0],), jnp.int32)
    else:
        logits = query @ positive_key.T
        labels = jnp.arange(query.shape[0])
    logp = jax.nn.log_softmax(logits / temperature, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Standard CE with integer labels (torch F.cross_entropy, mean-reduced)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
