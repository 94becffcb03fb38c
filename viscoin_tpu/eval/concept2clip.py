"""Concept2CLIP evaluation (reference: viscoin/testing/concept2clip.py).

WARNING (inherited from the reference): shuffle the test loader — contrastive
cosine-matching over batches of same-class birds yields misleading scores.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.utils.metrics import cosine_matching


def _check_mesh(mesh, batch_size: int):
    """Validate a 'data'-axis mesh for the concept2clip pipeline and return
    the batch NamedSharding (None mesh → None). The pipeline is built on
    single-process whole-dataset precompute (eval/spaces.py caches), so
    multi-host is refused outright rather than silently mis-sharded."""
    if mesh is None:
        return None
    if jax.process_count() > 1:
        raise ValueError(
            "the concept2clip pipeline precomputes whole-dataset latent "
            "spaces on one process (eval/spaces.py disk caches) — run it "
            "single-process (it is minutes of work); multi-host meshes are "
            "not supported here")
    data = mesh.shape["data"]
    if batch_size % data:
        raise ValueError(f"batch_size={batch_size} does not divide over the "
                         f"mesh's {data}-way 'data' axis")
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def test_concept2clip(concept2clip, params, loader, verbose: bool = True,
                      mesh=None):
    """Returns (mean per-batch MSE / batch_size, mean cosine-matching accuracy)
    — the reference divides the per-batch MSE by batch_size (concept2clip.py:54).

    With ``mesh``, each forward shards its batch over the ``data`` axis (the
    MLP is row-independent, so results are identical to the single-device
    path; ragged final batches are padded to the steady shape and sliced
    back before the metrics)."""
    batch_size = loader.batch_size
    batch_sh = _check_mesh(mesh, batch_size)

    def fwd(params, concepts):
        return concept2clip.apply({"params": params}, concepts)

    if mesh is None:
        fwd = jax.jit(fwd)
    else:
        from viscoin_tpu.parallel.mesh import replicated

        fwd = jax.jit(fwd, in_shardings=(replicated(mesh), batch_sh),
                      out_shardings=replicated(mesh))

    loss = 0.0
    matching = 0.0
    n = 0
    for concepts, embeddings in loader:
        rows = len(concepts)
        concepts = jnp.asarray(concepts)
        if mesh is not None:
            if rows < batch_size:  # ragged tail: pad rows, slice off below
                from viscoin_tpu.data.loader import pad_batch

                concepts = jnp.asarray(pad_batch(batch_size, concepts)[0])
            concepts = jax.device_put(concepts, batch_sh)
        out = fwd(params, concepts)[:rows]
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
