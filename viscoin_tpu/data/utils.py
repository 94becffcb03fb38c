"""Dataset registry and path conventions (reference: viscoin/datasets/utils.py)."""

from __future__ import annotations

from typing import Literal

from viscoin_tpu.data.datasets import CUB_200_2011, FunnyBirds, SyntheticDataset
from viscoin_tpu.data.loader import DataLoader

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


def get_datasets(name: DatasetType, transform: Literal["train", "test"] | None = None,
                 **kwargs):
    """Train/test dataset pair. ``transform`` overrides the per-split default
    (reference semantics: None → train tf on train split, test tf on test)."""
    cls = _CLASSES[name]
    train = cls(mode="train", transform=transform, **kwargs)
    test = cls(mode="test", transform=transform, **kwargs)
    return train, test


def get_dataloaders(name: DatasetType, batch_size: int,
                    transform: Literal["train", "test"] | None = None,
                    shuffle: bool = True, **kwargs):
    train, test = get_datasets(name, transform, **kwargs)
    return (
        DataLoader(train, batch_size, shuffle=shuffle),
        DataLoader(test, batch_size, shuffle=shuffle),
    )
