"""`concepts` command (reference: viscoin/cli/concepts.py): concept
distribution analytics with a pickle cache of the results."""

from __future__ import annotations

import os
import pickle

import click

from viscoin_tpu.cli.utils import DATASET, batch_size, device, viscoin_pickle_path


@click.command()
@viscoin_pickle_path
@batch_size
@device
@click.option("--force", is_flag=True,
              help="Recompute the concepts through the dataset, even if cached")
@click.option("--dataset", default="cub", type=DATASET,
              help="cub | funnybirds | synthetic | an image-folder path")
def concepts(force, device, viscoin_pickle_path, batch_size, dataset):
    """Analyse the distribution of concepts across the test dataset, and how
    well they separate classes."""
    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.eval.concepts import test_concepts
    from viscoin_tpu.utils.checkpoints import load_viscoin_bundle

    if force or not os.path.isfile("concept_results.pkl"):
        _, test_ds = get_datasets(dataset)
        loader = DataLoader(test_ds, batch_size=batch_size or 32, shuffle=False)
        models = load_viscoin_bundle(viscoin_pickle_path)
        results = test_concepts(models, loader, test_ds.N_CLASSES)
        with open("concept_results.pkl", "wb") as f:
            pickle.dump(results, f)
    else:
        with open("concept_results.pkl", "rb") as f:
            results = pickle.load(f)

    results.print_accuracies()
    results.plot_concept_activation_per_concept()
    results.plot_concept_activation_per_image()
    results.plot_class_concept_correlations()
    results.plot_concept_class_correlations()
    results.plot_concept_entropies()
