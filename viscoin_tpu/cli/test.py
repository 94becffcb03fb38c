"""`test` command (reference: viscoin/cli/test.py)."""

from __future__ import annotations

import click

from viscoin_tpu.cli.utils import batch_size, checkpoints, dataset, device
from viscoin_tpu.data.utils import get_dataloaders


@click.command()
@click.argument("model_name")
@batch_size
@device
@dataset
@checkpoints
def test(model_name, batch_size, device, dataset, checkpoints):
    """Test a model on a dataset."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.eval.classifiers import test_classifier
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.utils import checkpoints as ckpt

    _, dataloader = get_dataloaders(dataset, batch_size=batch_size or 32)

    match model_name:
        case "classifier":
            model = Classifier(output_classes=dataloader.dataset.N_CLASSES)
        case _:
            raise ValueError(f"Unknown model name: {model_name}")

    if checkpoints is not None:
        variables = ckpt.restore_pytree(checkpoints)
    else:
        size = dataloader.dataset.out_size
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
        )

    accuracy, loss = test_classifier(model, variables, dataloader)
    click.echo(f"Accuracy: {100 * accuracy:.2f}%")
    click.echo(f"Loss: {loss}")
