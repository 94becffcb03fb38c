"""`concept-heatmaps` command (reference: viscoin/cli/concept_heatmaps.py):
GradCAM heatmaps for the 5 conv layers of the concept extractor over random
test images (functional gradients replace the reference's torch hooks)."""

from __future__ import annotations

import click
import numpy as np

from viscoin_tpu.cli.utils import DATASET, device, viscoin_pickle_path


@click.command()
@viscoin_pickle_path
@device
@click.option("--dataset", default="cub", type=DATASET,
              help="cub | funnybirds | synthetic | an image-folder path")
def concept_heatmaps(device, viscoin_pickle_path, dataset):
    """Generate GradCAM heatmaps for random images, for the 5 convolutional
    layers of the concept extractor."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.utils.checkpoints import load_viscoin_bundle
    from viscoin_tpu.utils.gradcam import concept_extractor_gradcams
    from viscoin_tpu.utils.images import from_jax, heatmap_to_img, overlay

    n_samples = 5
    models = load_viscoin_bundle(viscoin_pickle_path)
    _, test_ds = get_datasets(dataset)

    indices = np.random.default_rng().choice(len(test_ds), n_samples, replace=False)
    raw = np.stack([test_ds[int(i)][0] for i in indices])
    labels = np.asarray([test_ds[int(i)][1] for i in indices], np.int32)
    images = device_preprocess(jnp.asarray(raw))

    heatmaps, logits = concept_extractor_gradcams(models, images, jnp.asarray(labels))
    explainer_labels = logits.argmax(axis=1)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)

    columns = ["original", "conv1 from hidden_state[-3]", "conv2 from hidden_state[-2]",
               "conv3 from hidden_state[-1]", "conv4 after concat", "conv5 after conv4"]
    names = ["conv1", "conv2", "conv3", "conv4", "conv5"]

    fig, axs = plt.subplots(n_samples, 6, figsize=(20, 10))
    fig.suptitle("GradCAM heatmaps of the concept extractor convolutional layers")
    for row in range(n_samples):
        is_correct = labels[row] == explainer_labels[row]
        confidence = probs[row].max()
        axs[row, 0].set_ylabel(f"{is_correct} with {100 * confidence:.0f}%", fontsize=8)
        base = from_jax(images[row])
        for col in range(6):
            if col == 0:
                axs[row, col].imshow(base)
            else:
                axs[row, col].axis("off")
                axs[row, col].imshow(overlay(
                    (base * 255).astype(np.uint8),
                    heatmap_to_img(heatmaps[names[col - 1]][row], size=base.shape[0]),
                ))
            if row == 0:
                axs[row, col].set_title(columns[col], fontsize=8)
    plt.show()
