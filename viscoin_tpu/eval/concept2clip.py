"""Concept2CLIP evaluation (reference: viscoin/testing/concept2clip.py).

WARNING (inherited from the reference): shuffle the test loader — contrastive
cosine-matching over batches of same-class birds yields misleading scores.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.utils.metrics import cosine_matching


def test_concept2clip(concept2clip, params, loader, verbose: bool = True):
    """Returns (mean per-batch MSE / batch_size, mean cosine-matching accuracy)
    — the reference divides the per-batch MSE by batch_size (concept2clip.py:54)."""

    @jax.jit
    def fwd(params, concepts):
        return concept2clip.apply({"params": params}, concepts)

    loss = 0.0
    matching = 0.0
    n = 0
    batch_size = loader.batch_size
    for concepts, embeddings in loader:
        out = fwd(params, jnp.asarray(concepts))
        emb = jnp.asarray(embeddings)
        loss += float(jnp.mean(jnp.square(out - emb))) / batch_size
        matching += cosine_matching(out, emb)
        n += 1
    return loss / n, matching / n


class TensorLoader:
    """Minimal (x, y) tensor-pair loader (replaces torch TensorDataset+DataLoader
    in the concept2clip pipeline, reference: training/concept2clip.py:84-90)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0):
        assert len(x) == len(y)
        self.x, self.y = x, y
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return -(-len(self.x) // self.batch_size)

    def __iter__(self):
        idx = np.arange(len(self.x))
        if self.shuffle:
            self._rng.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            sel = idx[s : s + self.batch_size]
            yield self.x[sel], self.y[sel]
