"""`to-pickle` command (reference: viscoin/cli/to_pickle.py): re-save a raw
joint checkpoint as a self-describing bundle with default hyperparameters
(our equivalent of the reference's pickle format)."""

from __future__ import annotations

import click

from viscoin_tpu.cli.utils import checkpoints


@click.command()
@checkpoints
@click.option("--output", help="The path to generate the bundle to", type=str)
def to_pickle(checkpoints: str, output: str):
    """Convert a raw joint checkpoint to a self-describing viscoin bundle
    using default hyperparameters."""
    from viscoin_tpu.models.bundle import default_models
    from viscoin_tpu.utils.checkpoints import load_viscoin, save_viscoin

    models = default_models()
    models = load_viscoin(models, checkpoints)
    save_viscoin(models, output)
