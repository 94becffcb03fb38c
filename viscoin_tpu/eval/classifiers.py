"""Classifier evaluation (reference: viscoin/testing/classifiers.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import device_preprocess


def test_classifier(classifier, classifier_vars, dataloader, verbose: bool = True):
    """Accuracy + mean per-batch loss over a loader.

    Returns (accuracy, batch_mean_loss) like the reference (testing/classifiers.py:11-57).
    The per-batch metric computation is one jitted function; uneven final
    batches are masked, not dropped."""

    @jax.jit
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

    total_correct = 0
    total_loss = 0.0
    total_samples = 0
    n_batches = 0
    batch_size = dataloader.batch_size

    for images, labels in dataloader:
        n = images.shape[0]
        if n < batch_size:  # pad to the steady shape to avoid a recompile
            pad = batch_size - n
            images = np.concatenate([images, np.repeat(images[:1], pad, axis=0)])
            labels = np.concatenate([labels, np.repeat(labels[:1], pad)])
        valid = (np.arange(batch_size) < n).astype(np.float32)
        correct, loss = batch_metrics(classifier_vars, jnp.asarray(images),
                                      jnp.asarray(labels), jnp.asarray(valid))
        total_correct += int(correct)
        total_loss += float(loss)
        total_samples += n
        n_batches += 1

    return total_correct / total_samples, total_loss / n_batches
