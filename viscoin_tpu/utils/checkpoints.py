"""Checkpoint I/O via orbax.

Replaces the reference's three torch formats (SURVEY.md §5 "Checkpoint /
resume"): joint state_dict .pth (models/utils.py:177-208), full-object pickle
(utils.py:211-233), and in-RAM best-model selection. Additions the reference
lacks: a self-describing bundle (module hyperparameters ride along as JSON, so
loading needs no code-side configuration — the role of the reference's
pickle), and full train-state save/restore (step + params + both optimizer
states) for deterministic resume.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from viscoin_tpu.models.bundle import VisCoINModels
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted

_CONFIG_NAME = "viscoin_config.json"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_pytree(tree: Any, path: str):
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_abs(path), _to_host(tree), force=True)


def restore_pytree(path: str, template: Any | None = None) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(_abs(path), item=_to_host(template))
    return ckptr.restore(_abs(path))


def _module_config(models: VisCoINModels) -> dict:
    def cfg(module, fields):
        return {f: getattr(module, f) for f in fields}

    return {
        "classifier": cfg(models.classifier,
                          ["output_classes", "embedding_size", "hidden_sizes", "depths"]),
        "concept_extractor": cfg(models.concept_extractor,
                                 ["n_concepts", "latent_channels", "input_channels1",
                                  "input_channels2", "input_channels3"]),
        "explainer": cfg(models.explainer, ["n_concepts", "n_classes", "normalized"]),
        "gan": cfg(models.gan,
                   ["z_dim", "c_dim", "w_dim", "img_resolution", "img_channels",
                    "small_adjust", "low_res256", "mapping_num_layers",
                    "coarse_layer", "mid_layer", "channel_base", "channel_max",
                    "conv_clamp"]),
    }


def save_viscoin(models: VisCoINModels, path: str):
    """Jointly save the ensemble (reference: save_viscoin, models/utils.py:177),
    plus the module config JSON (the role of the reference's pickle format)."""
    tree = {
        "classifier": models.classifier_vars,
        "concept_extractor": models.concept_params,
        "explainer": models.explainer_params,
        "gan": models.gan_vars,
    }
    save_pytree(tree, path)
    with open(os.path.join(_abs(path), _CONFIG_NAME), "w") as f:
        json.dump(_module_config(models), f, indent=2)


def load_viscoin(models: VisCoINModels, path: str) -> VisCoINModels:
    """Load checkpoints into an existing bundle (reference: load_viscoin)."""
    tree = restore_pytree(path)
    models.classifier_vars = tree["classifier"]
    models.concept_params = tree["concept_extractor"]
    models.explainer_params = tree["explainer"]
    models.gan_vars = tree["gan"]
    return models


def load_viscoin_bundle(path: str) -> VisCoINModels:
    """Load a self-describing checkpoint into a freshly built bundle
    (reference: load_viscoin_pickle, models/utils.py:229-233)."""
    with open(os.path.join(_abs(path), _CONFIG_NAME)) as f:
        cfg = json.load(f)
    for key in ("classifier", "concept_extractor"):
        for f_ in ("hidden_sizes", "depths"):
            if f_ in cfg[key]:
                cfg[key][f_] = tuple(cfg[key][f_])
    models = VisCoINModels(
        classifier=Classifier(**cfg["classifier"]),
        concept_extractor=ConceptExtractor(**cfg["concept_extractor"]),
        explainer=Explainer(**cfg["explainer"]),
        gan=GeneratorAdapted(**cfg["gan"]),
    )
    return load_viscoin(models, path)


# Aliases keeping the reference's public names (models/utils.py:211-233).
save_viscoin_pickle = save_viscoin
load_viscoin_pickle = load_viscoin_bundle


def save_train_state(state, path: str):
    """Save the full VisCoIN TrainState (step, params, both opt states) —
    deterministic resume, which the reference lacks (SURVEY.md §5)."""
    save_pytree(
        {"step": state.step, "params": state.params,
         "opt_state": state.opt_state, "gan_opt_state": state.gan_opt_state},
        path,
    )


def restore_train_state(state, path: str):
    """Restore into a freshly created TrainState (shapes/treedef template)."""
    template = {"step": state.step, "params": state.params,
                "opt_state": state.opt_state, "gan_opt_state": state.gan_opt_state}
    tree = restore_pytree(path, template)
    return state.replace(step=tree["step"], params=tree["params"],
                         opt_state=tree["opt_state"],
                         gan_opt_state=tree["gan_opt_state"])
