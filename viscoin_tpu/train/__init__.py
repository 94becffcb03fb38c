"""Training: losses + jitted training loops (reference: viscoin/training/*)."""

from viscoin_tpu.train.classifiers import ClassifierTrainingParams, train_classifier
from viscoin_tpu.train.concept2clip import Concept2ClipTrainingParams, train_concept2clip
from viscoin_tpu.train.viscoin import (
    TrainState,
    VisCoINTrainingParams,
    create_train_state,
    make_frozen,
    make_jitted_train_step,
    make_train_step,
    train_viscoin,
)

__all__ = [
    "ClassifierTrainingParams", "train_classifier",
    "Concept2ClipTrainingParams", "train_concept2clip",
    "TrainState", "VisCoINTrainingParams", "create_train_state", "make_frozen",
    "make_jitted_train_step", "make_train_step", "train_viscoin",
]
