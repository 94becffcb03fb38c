"""Dataset registry and path conventions (reference: viscoin/datasets/utils.py)."""

from __future__ import annotations

import os
from typing import Literal

from viscoin_tpu.data.datasets import (
    CUB_200_2011,
    FunnyBirds,
    ImageFolderDataset,
    SyntheticDataset,
)
from viscoin_tpu.data.loader import DataLoader

# Registry names — plus any DIRECTORY PATH, which loads as a generic
# folder-per-class dataset (ImageFolderDataset): the reference README
# publishes recipes for CelebA-HQ / Stanford-Cars that its own registry
# cannot load (reference README.md:199-203 vs viscoin/datasets/utils.py:25).
DatasetType = Literal["cub", "funnybirds", "synthetic"]

DATASET_CLASSES = {
    "cub": 200,
    "funnybirds": 50,
    "synthetic": 10,  # test/bench stand-in, not in the reference
}

# Checkpoint path conventions (reference: datasets/utils.py:33-43), with
# orbax directories instead of torch pickles.
DEFAULT_CHECKPOINTS = {
    dataset: {
        "classifier": f"checkpoints/{dataset}/classifier-{dataset}",
        "gan": f"checkpoints/{dataset}/gan-{dataset}",
        "gan_adapted": f"checkpoints/{dataset}/gan-adapted-{dataset}",
        "viscoin": f"checkpoints/{dataset}/viscoin-{dataset}",
    }
    for dataset in DATASET_CLASSES
}

DEFAULT_VISCOIN = DEFAULT_CHECKPOINTS["cub"]["viscoin"]

_CLASSES = {"cub": CUB_200_2011, "funnybirds": FunnyBirds, "synthetic": SyntheticDataset}

DATASET_NAMES = tuple(_CLASSES)  # registry names (paths are also accepted)


def dataset_key(name: str) -> str:
    """Short name for checkpoint/log path conventions: the registry name, or
    the basename of an image-folder root / training-zip path."""
    if name in _CLASSES:
        return name
    base = os.path.basename(os.path.normpath(name))
    if base.lower().endswith(".zip"):
        base = base[:-4]
    return base


def default_checkpoints(name: str) -> dict[str, str]:
    """DEFAULT_CHECKPOINTS row for a registry name OR an image-folder path
    (path datasets get ``checkpoints/{basename}/...`` conventions)."""
    key = dataset_key(name)
    if key in DEFAULT_CHECKPOINTS:
        return DEFAULT_CHECKPOINTS[key]
    return {
        kind: f"checkpoints/{key}/{pref}-{key}"
        for kind, pref in (("classifier", "classifier"), ("gan", "gan"),
                           ("gan_adapted", "gan-adapted"),
                           ("viscoin", "viscoin"))
    }


def get_datasets(name: str, transform: Literal["train", "test"] | None = None,
                 train_only: bool = False, **kwargs):
    """Train/test dataset pair. ``transform`` overrides the per-split default
    (reference semantics: None → train tf on train split, test tf on test).

    ``name`` is a registry name ("cub", "funnybirds", "synthetic") or a
    directory path to a ``{root}/{train|test}/{class}/{image}`` layout
    (generic image-folder dataset — class count discovered from the
    folders).

    ``train_only=True`` returns ``(train, None)`` without constructing the
    test split — consumers that never evaluate (``train gan``) then work on
    train-only roots like a typical CelebA-HQ GAN layout, which has no
    ``test/`` directory."""
    if name in _CLASSES:
        cls = _CLASSES[name]
        train = cls(mode="train", transform=transform, **kwargs)
        test = (None if train_only
                else cls(mode="test", transform=transform, **kwargs))
        return train, test
    if os.path.isdir(name):
        train = ImageFolderDataset(mode="train", transform=transform,
                                   root=name, **kwargs)
        test = (None if train_only
                else ImageFolderDataset(mode="test", transform=transform,
                                        root=name, **kwargs))
        return train, test
    if os.path.isfile(name) and name.lower().endswith(".zip"):
        # StyleGAN training archive (packed by `main.py dataset-tool` or the
        # upstream stylegan2-ada dataset_tool — same convention). The archive
        # IS the training set, so it is train-only like upstream's trainer.
        from viscoin_tpu.data.stylegan_zip import StyleGANZipDataset

        if not train_only:
            raise ValueError(
                f"{name} is a StyleGAN training zip — it has no test split "
                "(use it with `train gan` / `fid`, which are train-only)")
        return StyleGANZipDataset(name, mode="train", transform=transform,
                                  **kwargs), None
    raise ValueError(
        f"unknown dataset {name!r}: expected one of {sorted(_CLASSES)}, a "
        "directory path with a {root}/{train|test}/{class}/{image} layout, "
        "or a StyleGAN training .zip (train-only)")


def get_dataloaders(name: str, batch_size: int,
                    transform: Literal["train", "test"] | None = None,
                    shuffle: bool = True, **kwargs):
    train, test = get_datasets(name, transform, **kwargs)
    return (
        DataLoader(train, batch_size, shuffle=shuffle),
        DataLoader(test, batch_size, shuffle=shuffle),
    )
