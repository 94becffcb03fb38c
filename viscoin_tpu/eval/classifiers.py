"""Classifier evaluation (reference: viscoin/testing/classifiers.py)."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import device_preprocess


@functools.lru_cache(maxsize=8)
def _make_batch_metrics(classifier, mesh=None):
    """Jitted (variables, images_u8, labels, valid) -> (correct, loss).
    Cached per (classifier def, mesh): train_classifier calls
    test_classifier every epoch, and a fresh jit wrapper per call would
    retrace each time. With ``mesh`` the batch shards over ``data`` and the
    variables replicate (GSPMD reduces the sums)."""

    def batch_metrics(variables, images_u8, labels, valid):
        x = device_preprocess(images_u8)
        logits, _ = classifier.apply(variables, x, train=False)
        preds = jnp.argmax(logits, axis=1)
        correct = jnp.sum((preds == labels) * valid)
        # mean CE over valid samples only
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
        return correct, loss

    if mesh is None:
        return jax.jit(batch_metrics)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscoin_tpu.parallel.mesh import image_spec

    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        batch_metrics,
        in_shardings=(rep, NamedSharding(mesh, image_spec(mesh)), sh, sh),
        out_shardings=(rep, rep),
    )


def test_classifier(classifier, classifier_vars, dataloader,
                    verbose: bool = True, mesh=None):
    """Accuracy + mean per-batch loss over a loader.

    Returns (accuracy, batch_mean_loss) like the reference
    (testing/classifiers.py:11-57). The per-batch metric computation is one
    jitted function (cached across calls); uneven final batches are masked,
    not dropped. With ``mesh`` the batch shards over the ``data`` axis."""
    batch_metrics = _make_batch_metrics(classifier, mesh)

    total_correct = 0
    total_loss = 0.0
    total_samples = 0
    n_batches = 0
    batch_size = dataloader.batch_size

    from viscoin_tpu.data.loader import pad_batch

    for images, labels in dataloader:
        # pad to the steady shape to avoid a recompile; mask the pad rows
        images, labels, valid = pad_batch(batch_size, images, labels)
        n = int(valid.sum())
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from viscoin_tpu.parallel.mesh import image_spec, shard_batch

            images, labels, valid = shard_batch(
                mesh, images, labels.astype(np.int32), valid,
                specs=(image_spec(mesh), P("data"), P("data")))
        correct, loss = batch_metrics(classifier_vars, jnp.asarray(images),
                                      jnp.asarray(labels), jnp.asarray(valid))
        total_correct += int(correct)
        total_loss += float(loss)
        total_samples += n
        n_batches += 1

    return total_correct / total_samples, total_loss / n_batches
