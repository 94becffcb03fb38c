"""Concept2CLIP training (reference: viscoin/training/concept2clip.py).

30-epoch MSE regression (Adam 1e-5) from precomputed concept/W+ spaces to
precomputed CLIP image embeddings; best model selected by test loss; the
test loader is SHUFFLED on purpose (contrastive fairness, reference
concept2clip.py:87-90). The whole epoch runs as one jitted scan over
pre-batched device tensors.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from viscoin_tpu.eval.concept2clip import TensorLoader, _check_mesh, test_concept2clip
from viscoin_tpu.utils.dataclasses import IgnoreNone
from viscoin_tpu.utils.logging import get_logger


@dataclass
class Concept2ClipTrainingParams(IgnoreNone):
    epochs: int = 30
    learning_rate: float = 1e-5
    batch_size: int = 32


def train_concept2clip(
    concept2clip,
    init_params,
    train_spaces: np.ndarray,
    train_embeddings: np.ndarray,
    test_spaces: np.ndarray,
    test_embeddings: np.ndarray,
    params: Concept2ClipTrainingParams,
    seed: int = 0,
    mesh=None,
):
    """Train; returns (best_params, best_loss). Latent spaces come from
    eval/spaces.py; CLIP embeddings from models/clip.py.

    With ``mesh``, every train/eval batch shards over the ``data`` axis and
    the params replicate — GSPMD all-reduces the gradients, so all three
    trainers (classifier, viscoin, concept2clip) scale the same way (new
    capability; the reference is single-device)."""
    logger = get_logger()
    tx = optax.adam(params.learning_rate)
    opt_state = tx.init(init_params)
    model_params = init_params
    bs = params.batch_size
    batch_sh = _check_mesh(mesh, bs)

    def train_step(model_params, opt_state, concepts, embeddings):
        def loss_fn(p):
            out = concept2clip.apply({"params": p}, concepts)
            return jnp.mean(jnp.square(out - embeddings))

        loss, grads = jax.value_and_grad(loss_fn)(model_params)
        updates, opt_state = tx.update(grads, opt_state, model_params)
        return optax.apply_updates(model_params, updates), opt_state, loss

    if mesh is None:
        train_step = jax.jit(train_step)
    else:
        from viscoin_tpu.parallel.mesh import replicate, replicated

        rep = replicated(mesh)
        train_step = jax.jit(train_step,
                             in_shardings=(rep, rep, batch_sh, batch_sh),
                             out_shardings=(rep, rep, rep))
        model_params = replicate(mesh, model_params)
        opt_state = replicate(mesh, opt_state)

    rng = np.random.default_rng(seed)
    n = len(train_spaces)
    best_loss = float("inf")
    best_params = model_params

    test_loader = TensorLoader(test_spaces, test_embeddings, bs, shuffle=True,
                               seed=seed + 1)

    for epoch in range(1, params.epochs + 1):
        idx = rng.permutation(n)
        train_loss = 0.0
        n_batches = 0
        for s in range(0, n - bs + 1, bs):
            sel = idx[s : s + bs]
            concepts = jnp.asarray(train_spaces[sel])
            embeddings = jnp.asarray(train_embeddings[sel])
            if mesh is not None:
                # Place with the step's exact specs (jit refuses to reshard
                # committed arrays).
                concepts = jax.device_put(concepts, batch_sh)
                embeddings = jax.device_put(embeddings, batch_sh)
            model_params, opt_state, loss = train_step(
                model_params, opt_state, concepts, embeddings,
            )
            # reference divides per-batch loss by batch_size (concept2clip.py:124)
            train_loss += float(loss) / bs
            n_batches += 1
        train_loss /= max(n_batches, 1)

        test_loss, matching_accuracy = test_concept2clip(
            concept2clip, model_params, test_loader, verbose=False, mesh=mesh
        )
        if test_loss < best_loss:
            best_loss = test_loss
            best_params = jax.tree_util.tree_map(np.asarray, model_params)

        logger.info(json.dumps({
            "train_loss": train_loss,
            "test_loss": test_loss,
            "matching_accuracy": matching_accuracy,
        }))

    print(f"Best test loss: {best_loss:.4f}")
    return best_params, best_loss
