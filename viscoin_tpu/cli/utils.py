"""CLI flag decorators (reference: viscoin/cli/utils.py — same flag surface).

``--device`` is kept for CLI compatibility; it selects the JAX platform
("tpu"/"cpu"; the reference's "cuda" maps to the default accelerator).
"""

from __future__ import annotations

import click

from viscoin_tpu.data.utils import DEFAULT_VISCOIN


def batch_size(func):
    return click.option("--batch-size", required=False,
                        help="The batch size to use for training/testing",
                        type=int)(func)


def epochs(func):
    return click.option("--epochs", required=False,
                        help="The amount of epochs to train the model for",
                        type=int)(func)


def learning_rate(func):
    return click.option("--learning-rate", required=False,
                        help="The optimizer learning rate", type=float)(func)


def device(func):
    return click.option("--device", default="tpu",
                        help="The device to use for training/testing "
                             "(jax platform; 'cuda' aliases the default accelerator)",
                        type=str)(func)


def checkpoints(func):
    return click.option("--checkpoints", help="The path to load the checkpoints",
                        type=str)(func)


def output_weights(func):
    return click.option("--output-weights",
                        help="The path/filename where to save the weights",
                        type=str, default="output-weights")(func)


def viscoin_pickle_path(func):
    return click.option("--viscoin-pickle-path",
                        help="The path to the viscoin checkpoint bundle",
                        default=DEFAULT_VISCOIN, required=False, type=str)(func)


def concept2clip_pickle_path(func):
    return click.option("--clip-adapter-path",
                        help="The path to the concept2clip checkpoint",
                        required=False, type=str)(func)


class DatasetParam(click.ParamType):
    """A registry dataset name, a directory path to a generic
    ``{root}/{train|test}/{class}/{image}`` image-folder dataset (covers the
    CelebA-HQ / Stanford-Cars recipes the reference README documents but its
    registry cannot load, and any custom dataset), or a StyleGAN training
    ``.zip`` packed by `dataset-tool` (train-only: `train gan` / `fid`)."""

    name = "dataset"

    def convert(self, value, param, ctx):
        import os

        from viscoin_tpu.data.utils import DATASET_NAMES

        if (value in DATASET_NAMES or os.path.isdir(value)
                or (value.lower().endswith(".zip") and os.path.isfile(value))):
            return value
        self.fail(
            f"{value!r} is neither a known dataset "
            f"({', '.join(sorted(DATASET_NAMES))}), nor a directory path "
            "(image-folder layout: {root}/{train|test}/{class}/{image}), "
            "nor a training .zip",
            param, ctx)


DATASET = DatasetParam()


def dataset(func):
    return click.option("--dataset", default="cub", type=DATASET,
                        help="The dataset to use: cub | funnybirds | synthetic "
                             "| a directory path (image-folder layout)")(func)


def load_generator(gan_path: str):
    """Restore a ``train gan`` export / ``port_weights.py stylegan`` port,
    rebuild the :class:`Generator` from the checkpoint itself (architecture
    inferred — no shape flags), and place the tree on device ONCE
    (CLAUDE.md: the relay tunnel moves bulk data at ~25 MB/s — jit would
    otherwise re-transfer every param per batch). Shared by the GAN tool
    commands (generate / style-mixing / project / fid)."""
    import jax

    from viscoin_tpu.models.stylegan import (
        Generator,
        generator_config_from_params,
    )
    from viscoin_tpu.utils import checkpoints as ckpt

    gvars = ckpt.restore_pytree(gan_path)
    generator = Generator(**generator_config_from_params(gvars["params"]))
    return generator, jax.device_put(gvars)


def require_lpips(why: str, path: str = "checkpoints/lpips-vgg"):
    """Restore ported LPIPS params, or refuse with a porting pointer — the
    perceptual metrics (projection loss, PPL) are meaningless through a
    random VGG."""
    import os

    if not os.path.exists(path):
        raise click.UsageError(
            f"{why} needs LPIPS weights at {path} "
            "(port with scripts/port_weights.py lpips)")
    from viscoin_tpu.utils import checkpoints as ckpt

    return ckpt.restore_pytree(path)
