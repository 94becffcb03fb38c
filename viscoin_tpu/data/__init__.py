"""Datasets + loading (reference: viscoin/datasets/*)."""

from viscoin_tpu.data.datasets import (
    CUB_200_2011,
    FunnyBirds,
    ImageFolderDataset,
    LabeledCUB,
    SyntheticDataset,
    export_funnybirds_stylegan_zip,
)
from viscoin_tpu.data.loader import DataLoader, loop_iter
from viscoin_tpu.data.stylegan_zip import StyleGANZipDataset, pack_stylegan_zip
from viscoin_tpu.data.transforms import device_preprocess, denormalize
from viscoin_tpu.data.utils import (
    DATASET_CLASSES,
    DATASET_NAMES,
    DEFAULT_CHECKPOINTS,
    DEFAULT_VISCOIN,
    default_checkpoints,
    get_dataloaders,
    get_datasets,
)

__all__ = [
    "CUB_200_2011", "FunnyBirds", "ImageFolderDataset", "LabeledCUB",
    "SyntheticDataset", "export_funnybirds_stylegan_zip", "DataLoader",
    "StyleGANZipDataset", "pack_stylegan_zip",
    "loop_iter", "device_preprocess", "denormalize", "DATASET_CLASSES",
    "DATASET_NAMES", "DEFAULT_CHECKPOINTS", "DEFAULT_VISCOIN",
    "default_checkpoints", "get_dataloaders", "get_datasets",
]
