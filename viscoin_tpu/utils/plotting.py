"""Plotting utils (reference: viscoin/utils/plotting.py)."""

from __future__ import annotations

import numpy as np


def plot_grid(images: np.ndarray, title: str, column_titles: list[str],
              row_titles: list[str]) -> None:
    """Grid of images with row/column titles (reference: plotting.py:7-40).
    images: (rows, cols, H, W, 3)."""
    import matplotlib.pyplot as plt

    rows, cols = len(row_titles), len(column_titles)
    fig, axes = plt.subplots(rows, cols, figsize=(15, 5 * rows))
    fig.suptitle(title)
    axes = np.atleast_2d(axes)

    for i in range(rows):
        for j in range(cols):
            ax = axes[i, j]
            ax.imshow(images[i, j])
            if i == 0:
                ax.set_title(column_titles[j])
            if j == 0:
                ax.set_ylabel(row_titles[i], rotation=0, labelpad=40)
            ax.xaxis.set_visible(False)
            plt.setp(ax.spines.values(), visible=False)
            ax.tick_params(left=False, labelleft=False)
    plt.show()


def plot_amplified_images_batch(originals, images, multipliers, labels=None):
    """Rows of [original | amplified ×m...] (reference: testing/viscoin.py:356-393)."""
    import matplotlib.pyplot as plt

    from viscoin_tpu.utils.images import from_jax

    np_rows = [[from_jax(img) for img in row] for row in images]
    np_orig = [from_jax(o) for o in originals]

    num_rows, num_cols = len(images), len(multipliers) + 1
    fig, axs = plt.subplots(num_rows, num_cols, figsize=(15, 5 * num_rows))
    fig.suptitle("Amplification of best concepts for an image")
    axs = np.atleast_2d(np.asarray(axs))

    for i, (orig, row) in enumerate(zip(np_orig, np_rows)):
        axs[i, 0].imshow(orig)
        axs[i, 0].axis("off")
        if labels is not None:
            axs[i, 0].set_title(f"Predicted Label : {labels[i]}\nOriginal")
        elif i == 0:
            axs[i, 0].set_title("Original")
        for j, (img, mult) in enumerate(zip(row, multipliers)):
            axs[i, j + 1].imshow(img)
            axs[i, j + 1].axis("off")
            if i == 0:
                axs[i, j + 1].set_title(f"Multiplier: {mult:.2f}")
    plt.show()
