"""Training: losses + jitted training loops (reference: viscoin/training/*).

Lazy exports (PEP 562) — train and eval reference each other
(training loops evaluate; evaluation uses the loss library)."""

_EXPORTS = {
    "ClassifierTrainingParams": "viscoin_tpu.train.classifiers",
    "train_classifier": "viscoin_tpu.train.classifiers",
    "Concept2ClipTrainingParams": "viscoin_tpu.train.concept2clip",
    "train_concept2clip": "viscoin_tpu.train.concept2clip",
    "TrainState": "viscoin_tpu.train.viscoin",
    "VisCoINTrainingParams": "viscoin_tpu.train.viscoin",
    "create_train_state": "viscoin_tpu.train.viscoin",
    "make_frozen": "viscoin_tpu.train.viscoin",
    "make_jitted_train_step": "viscoin_tpu.train.viscoin",
    "make_sample_fakes": "viscoin_tpu.train.viscoin",
    "make_train_step": "viscoin_tpu.train.viscoin",
    "train_viscoin": "viscoin_tpu.train.viscoin",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(name)
