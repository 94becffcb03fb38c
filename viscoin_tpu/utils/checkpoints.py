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

import numpy as np

import jax
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


_NPZ_NAME = "arrays.npz"

# ---------------- atomic + asynchronous saving ---------------- #
# The reference saves synchronously on the training thread (SURVEY.md §5);
# on a relay-attached TPU an orbax save of the full train state stalls the
# step pipeline. Saves here are (a) ATOMIC — the checkpoint is written into
# a `.tmp` sibling and swapped in via renames, so a crash at ANY point
# leaves either the previous or the new checkpoint loadable (`.old` is the
# fallback for the one window between the two renames) — and (b) optionally
# ASYNC — the device→host snapshot happens synchronously (the jitted steps
# DONATE the state buffers, so they must be copied out before the next
# step), then serialization + disk I/O run on one background writer thread,
# serialized in submission order.

_OLD_SUFFIX = ".old"
_TMP_SUFFIX = ".tmp"
_writer = None  # lazy single-thread executor
_pending: list = []


def _writer_pool():
    global _writer
    if _writer is None:
        from concurrent.futures import ThreadPoolExecutor

        _writer = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="ckpt-writer")
    return _writer


def _atomic_install(path: str, write_fn):
    """Run ``write_fn(tmp_dir)`` then swap tmp into place. Crash windows:
    during write → previous checkpoint untouched; between the two renames →
    previous survives as ``<path>.old`` (restore_pytree falls back to it);
    after → new checkpoint in place."""
    import shutil

    path = _abs(path)
    tmp, old = path + _TMP_SUFFIX, path + _OLD_SUFFIX
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _resolve_existing(path: str) -> str:
    """The committed checkpoint directory: ``path``, or the ``.old``
    fallback left by a crash between the install renames."""
    path = _abs(path)
    if not os.path.exists(path) and os.path.exists(path + _OLD_SUFFIX):
        return path + _OLD_SUFFIX
    return path


def wait_for_saves():
    """Block until every pending async save has committed; re-raises the
    first writer error (after ALL pending saves have been joined — an early
    raise would leave later installs still running on the writer thread,
    racing any retry the caller attempts). Call before process exit and
    before restoring a path that may still be in flight (the train loops
    do both)."""
    global _pending
    pending, _pending = _pending, []
    first_error = None
    for fut in pending:
        try:
            fut.result()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            if first_error is None:
                first_error = e
    if first_error is not None:
        raise first_error


def _path_str(entry) -> str:
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return entry.name
    return str(entry)


def _flat_keys(tree) -> tuple[list[str], list, Any]:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(_path_str(p) for p in path) for path, _ in flat]
    return keys, [v for _, v in flat], treedef


def save_pytree(tree: Any, path: str, async_save: bool = False,
                extra_files: dict | None = None):
    """Atomic checkpoint write (see the module-level saving notes).

    Single-process: orbax. Multi-process: a flat .npz written by THE
    CALLING process only — orbax checkpointing is a collective operation
    (it synchronizes all JAX processes), so a process-0-guarded orbax save
    under multi-host training deadlocks at the barrier.

    ``async_save=True``: snapshot to host NOW (the jitted steps donate the
    state buffers — the copy cannot be deferred), then serialize + write on
    the background writer thread; :func:`wait_for_saves` joins/raises.

    ``extra_files``: {filename: text} written INSIDE the atomic unit (meta /
    config JSON land in the same tmp dir and rename with the arrays — a
    checkpoint can never exist without its metadata)."""
    host = _to_host(tree)

    def write(tmp):
        if jax.process_count() > 1:
            keys, vals, _ = _flat_keys(host)
            os.makedirs(tmp, exist_ok=True)
            np.savez(os.path.join(tmp, _NPZ_NAME),
                     **dict(zip(keys, [np.asarray(v) for v in vals])))
        else:
            ocp.PyTreeCheckpointer().save(tmp, host, force=True)
        for name, text in (extra_files or {}).items():
            with open(os.path.join(tmp, name), "w") as f:
                f.write(text)

    if async_save:
        _pending.append(_writer_pool().submit(_atomic_install, path, write))
    else:
        _atomic_install(path, write)


def _unflatten_npz(data) -> dict:
    out: dict = {}
    for key in data.files:
        node = out
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return out


def restore_pytree(path: str, template: Any | None = None) -> Any:
    # Same-process resume after async saves: drain the writer first so a
    # restore never reads a checkpoint that is still being installed.
    wait_for_saves()
    path = _resolve_existing(path)
    npz = os.path.join(_abs(path), _NPZ_NAME)
    if os.path.exists(npz):
        data = np.load(npz)
        if template is None:
            # Without a template only dict-of-dict trees reconstruct (the
            # model-bundle format); train states carry optax namedtuples and
            # always restore through a template.
            return _unflatten_npz(data)
        keys, _, treedef = _flat_keys(_to_host(template))
        return jax.tree_util.tree_unflatten(treedef, [data[k] for k in keys])
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


def save_viscoin(models: VisCoINModels, path: str, async_save: bool = False):
    """Jointly save the ensemble (reference: save_viscoin, models/utils.py:177),
    plus the module config JSON (the role of the reference's pickle format)."""
    tree = {
        "classifier": models.classifier_vars,
        "concept_extractor": models.concept_params,
        "explainer": models.explainer_params,
        "gan": models.gan_vars,
    }
    save_pytree(tree, path, async_save=async_save, extra_files={
        _CONFIG_NAME: json.dumps(_module_config(models), indent=2)})


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
    with open(os.path.join(_resolve_existing(path), _CONFIG_NAME)) as f:
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


_META_NAME = "train_state_meta.json"


def _check_meta(path: str, expect_meta: dict | None):
    wait_for_saves()  # the meta file may still be riding the async writer
    meta_path = os.path.join(_resolve_existing(path), _META_NAME)
    if expect_meta is None or not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        saved = json.load(f)
    # A key the current run expects but the checkpoint never recorded is a
    # mismatch too: e.g. a pre-compute_dtype checkpoint resumed under the
    # bf16 CLI default would otherwise silently switch training numerics —
    # exactly the divergence this check exists to refuse.
    diffs = {k: (saved.get(k, "<absent from checkpoint>"), v)
             for k, v in expect_meta.items() if saved.get(k) != v}
    if diffs:
        raise ValueError(
            "resume mismatch vs checkpoint metadata (saved != current): "
            + ", ".join(f"{k}: {a} != {b}" for k, (a, b) in diffs.items()))


def save_train_state(state, path: str, meta: dict | None = None,
                     async_save: bool = False):
    """Save the full VisCoIN TrainState (step, params, both opt states) —
    deterministic resume, which the reference lacks (SURVEY.md §5).

    ``meta`` records the run invariants the resume-exactness contract depends
    on (fake_presample_steps K, batch_size, seed): the sampler's per-pixel
    noise stream is keyed per K-group, so resuming with a different K would
    silently change the synthetic images while z stays identical."""
    save_pytree(
        {"step": state.step, "params": state.params,
         "opt_state": state.opt_state, "gan_opt_state": state.gan_opt_state},
        path, async_save=async_save,
        extra_files=({_META_NAME: json.dumps(meta, indent=2)}
                     if meta is not None else None),
    )


def restore_train_state(state, path: str, expect_meta: dict | None = None):
    """Restore into a freshly created TrainState (shapes/treedef template).

    ``expect_meta``: the current run's invariants; any key recorded at save
    time with a different value — or never recorded at all — raises (a
    K/batch/seed/dtype mismatch breaks exact replay — fail loudly instead
    of diverging silently)."""
    _check_meta(path, expect_meta)
    template = {"step": state.step, "params": state.params,
                "opt_state": state.opt_state, "gan_opt_state": state.gan_opt_state}
    tree = restore_pytree(path, template)
    return state.replace(step=tree["step"], params=tree["params"],
                         opt_state=tree["opt_state"],
                         gan_opt_state=tree["gan_opt_state"])


def save_gan_train_state(state, path: str, meta: dict | None = None,
                         async_save: bool = False):
    """Save the full GANTrainState (G/D params + opt states, EMA, w_avg,
    pl_mean, ada state) for mid-run checkpointing of `train gan` — the
    upstream trainer snapshots pickles on a kimg cadence; this is the orbax
    equivalent."""
    from flax import serialization

    save_pytree(serialization.to_state_dict(state), path,
                async_save=async_save,
                extra_files=({_META_NAME: json.dumps(meta, indent=2)}
                             if meta is not None else None))


def restore_gan_train_state(state, path: str, expect_meta: dict | None = None):
    """Restore into a freshly created GANTrainState template."""
    from flax import serialization

    _check_meta(path, expect_meta)
    tree = restore_pytree(path, serialization.to_state_dict(state))
    return serialization.from_state_dict(state, tree)
