"""Whole-dataset latent-space precomputation with disk caches.

Reference: viscoin/models/utils.py:27-174 (compute_w_space /
compute_concept_space, cached under checkpoints/gan-w and
checkpoints/concepts). Caches here are .npz; forward passes are jitted and
batched (the reference uses batch 4, unjitted)."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import device_preprocess
from viscoin_tpu.models.bundle import VisCoINModels

# Default precompute batch: shared with the CLI's mesh-divisibility fallback
# (cli/train.py) so the two sites cannot desync.
SPACES_BATCH_SIZE = 32


def _run_over(models: VisCoINModels, dataset, batch_size: int, what: str,
              mesh=None) -> np.ndarray:
    variables = {
        "classifier": models.classifier_vars,
        "psi": models.concept_params,
        "gan": models.gan_vars,
    }

    def fwd(variables, images_u8):
        x = device_preprocess(images_u8)
        _, hidden = models.classifier.apply(variables["classifier"], x, train=False)
        phi, phi_prime = models.concept_extractor.apply(
            {"params": variables["psi"]}, tuple(hidden[-3:])
        )
        if what == "concepts":
            return phi
        _, ws = models.gan.apply(variables["gan"], phi, phi_prime,
                                 return_latents=True, noise_mode="const")
        return ws

    if mesh is None:
        fwd = jax.jit(fwd)
        img_sh = None
    else:
        # Data-parallel precompute: images shard over 'data' (2-D meshes
        # additionally shard H over 'model'), frozen weights replicate.
        # Row-independent forward → identical to the single-device path.
        from jax.sharding import NamedSharding

        from viscoin_tpu.eval.concept2clip import _check_mesh
        from viscoin_tpu.parallel.mesh import image_spec, replicated

        _check_mesh(mesh, batch_size)
        img_sh = NamedSharding(mesh, image_spec(mesh))
        fwd = jax.jit(fwd, in_shardings=(replicated(mesh), img_sh),
                      out_shardings=replicated(mesh))

    from viscoin_tpu.data.loader import pad_batch

    out = []
    n = len(dataset)
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        # pad for shape stability; padded rows sliced off below
        images, _ = pad_batch(batch_size,
                              np.stack([dataset[i][0] for i in idx]))
        images = jnp.asarray(images)
        if img_sh is not None:
            images = jax.device_put(images, img_sh)
        res = np.asarray(fwd(variables, images))[: len(idx)]
        out.append(res)
    return np.concatenate(out, axis=0)


def _cache_path(cache_dir: str, dataset_name: str, train_ds) -> str:
    """Cache file under ``cache_dir`` keyed by the dataset's short name.
    ``dataset_name`` may be an image-folder PATH (the CLI accepts directory
    datasets) — interpolating it raw would resolve os.path.join to a file
    NEXT TO the dataset root (absolute paths win the join) or into a
    never-created subdirectory; dataset_key() reduces it to the basename,
    the same convention default_checkpoints() uses. Non-default decode
    resolutions (--image-size) join the key: the cached arrays' SHAPES are
    resolution-independent, so a stale 256² cache would otherwise silently
    satisfy a 512² run."""
    from viscoin_tpu.data.utils import dataset_key

    key = dataset_key(dataset_name)
    size = getattr(train_ds, "out_size", 256)
    if size != 256:
        key = f"{key}_{size}"
    return os.path.join(cache_dir, f"{key}.npz")


def compute_concept_space(models: VisCoINModels, dataset_name: str,
                          train_ds, test_ds, batch_size: int = SPACES_BATCH_SIZE,
                          cache_dir: str = "checkpoints/concepts", mesh=None):
    """Phi over both splits, cached (reference: models/utils.py:108-174).
    Returns NHWC (N, 3, 3, K) arrays."""
    cache = _cache_path(cache_dir, dataset_name, train_ds)
    if os.path.exists(cache):
        data = np.load(cache)
        return data["train"], data["test"]
    train = _run_over(models, train_ds, batch_size, "concepts", mesh=mesh)
    test = _run_over(models, test_ds, batch_size, "concepts", mesh=mesh)
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, train=train, test=test)
    return train, test


def compute_w_space(models: VisCoINModels, dataset_name: str,
                    train_ds, test_ds, batch_size: int = SPACES_BATCH_SIZE,
                    cache_dir: str = "checkpoints/gan-w", mesh=None):
    """W+ over both splits, cached (reference: models/utils.py:27-106).
    Returns (N, num_ws, w_dim) arrays."""
    cache = _cache_path(cache_dir, dataset_name, train_ds)
    if os.path.exists(cache):
        data = np.load(cache)
        return data["train"], data["test"]
    train = _run_over(models, train_ds, batch_size, "w", mesh=mesh)
    test = _run_over(models, test_ds, batch_size, "w", mesh=mesh)
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, train=train, test=test)
    return train, test
