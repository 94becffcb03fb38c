"""`amplify` command (reference: viscoin/cli/amplify.py)."""

from __future__ import annotations

import click
import numpy as np

from viscoin_tpu.cli.utils import DATASET, device, viscoin_pickle_path


@click.command()
@viscoin_pickle_path
@device
@click.option("--concept-threshold", type=float,
              help="Concept activation threshold in [-1, 1] (prefer 0.2); "
                   "exclusive with concept-top-k")
@click.option("--concept-top-k", type=int,
              help="Amount of most activated concepts to amplify; exclusive "
                   "with concept-threshold")
@click.option("--concept-indices", type=str,
              help="Indices of the concepts to amplify simultaneously: eg. 1,2,3")
@click.option("--image-indices", type=str,
              help="Indices of the images to amplify: eg. 1,2,3")
@click.option("--dataset", default="cub", type=DATASET,
              help="cub | funnybirds | synthetic | an image-folder path")
def amplify(concept_threshold, concept_top_k, concept_indices, image_indices,
            device, viscoin_pickle_path, dataset):
    """Amplify the concepts of random images from a dataset (showcase)."""
    import jax.numpy as jnp

    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.eval.viscoin import Selection, amplify_concepts, make_amplify_fns
    from viscoin_tpu.utils.checkpoints import load_viscoin_bundle
    from viscoin_tpu.utils.plotting import plot_amplified_images_batch

    n_samples = 5
    models = load_viscoin_bundle(viscoin_pickle_path)
    _, test_ds = get_datasets(dataset)

    rng = np.random.default_rng()
    if image_indices is not None:
        indices = [int(i) for i in image_indices.split(",")]
    else:
        indices = rng.choice(len(test_ds), n_samples, replace=False)

    if concept_indices is not None:
        selection: Selection = {"method": "indices",
                                "indices": [int(i) for i in concept_indices.split(",")]}
    elif concept_threshold is not None:
        selection = {"method": "threshold", "threshold": concept_threshold}
    elif concept_top_k is not None:
        selection = {"method": "top_k", "k": concept_top_k}
    else:
        raise ValueError("You must provide either concept-threshold or concept-top-k")

    multipliers = [0.0, 1.0, 2.0, 4.0]
    fns = make_amplify_fns(models)
    originals, amplified = [], []
    for i in indices:
        img_u8 = test_ds[int(i)][0]
        x = np.asarray(device_preprocess(jnp.asarray(img_u8[None])))[0]
        originals.append(x)
        res = amplify_concepts(x, models, selection, multipliers, rng=rng, fns=fns)
        amplified.append(res.amplified_images)

    plot_amplified_images_batch(originals, amplified, multipliers)
