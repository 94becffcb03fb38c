"""AOT deployment artifacts via ``jax.export``.

A serving artifact seals each endpoint as serialized StableHLO next to a
flat weights archive and a JSON manifest. Loading needs NO model code —
``jax.export.deserialize`` rebuilds the callable with jax's cross-version
compatibility guarantees, so a deployment fleet can pin artifacts while the
framework moves. (New capability: the reference deploys by unpickling model
*code* — models/utils.py:211-233 — which is neither sealed nor
version-stable.)

Artifact layout::

    <path>/manifest.json       batch/resolution/endpoints/dtypes/jax version
    <path>/variables.npz       flat "a/b/c"-keyed weights (fp32 or cast)
    <path>/<endpoint>.stablehlo serialized jax.export bytes per endpoint
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.models.bundle import VisCoINModels
from viscoin_tpu.serve.engine import _cast_tree, build_endpoint_fns
from viscoin_tpu.utils.checkpoints import _flat_keys, _unflatten_npz

_MANIFEST = "manifest.json"
_WEIGHTS = "variables.npz"


def export_serving(
    models: VisCoINModels,
    path: str,
    batch_size: int = 8,
    compute_dtype: str = "float32",
    endpoints: tuple[str, ...] = ("classify", "reconstruct"),
    platforms: tuple[str, ...] | None = None,
) -> dict:
    """Export serving endpoints as sealed artifacts.

    Args:
        platforms: lowering platforms (e.g. ``("tpu", "cpu")``) — default is
            the current backend only (jax.export semantics).

    Returns the manifest dict.
    """
    fns = build_endpoint_fns(models, compute_dtype)
    unknown = set(endpoints) - set(fns)
    if unknown:
        raise ValueError(f"unknown endpoints {sorted(unknown)}; "
                         f"available: {sorted(fns)}")
    variables = _cast_tree({
        "classifier": models.classifier_vars,
        "psi": models.concept_params,
        "theta": models.explainer_params,
        "gan": models.gan_vars,
    }, compute_dtype)
    resolution = models.gan.img_resolution

    os.makedirs(path, exist_ok=True)
    keys, vals, _ = _flat_keys(variables)
    np.savez(os.path.join(path, _WEIGHTS),
             **{k: np.asarray(v) for k, v in zip(keys, vals)})

    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables)
    img_shape = jax.ShapeDtypeStruct(
        (batch_size, resolution, resolution, 3), jnp.uint8)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    for name in endpoints:
        exported = jax.export.export(jax.jit(fns[name]), **kwargs)(
            var_shapes, img_shape)
        with open(os.path.join(path, f"{name}.stablehlo"), "wb") as f:
            f.write(exported.serialize())

    manifest = {
        "batch_size": batch_size,
        "resolution": resolution,
        "compute_dtype": compute_dtype,
        "endpoints": list(endpoints),
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedEngine:
    """Padded fixed-batch inference over a sealed artifact — the same call
    surface as :class:`~viscoin_tpu.serve.engine.InferenceEngine.classify`
    / ``reconstruct``, reconstructed purely from the artifact directory."""

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.batch_size = int(self.manifest["batch_size"])
        self.resolution = int(self.manifest["resolution"])
        data = np.load(os.path.join(path, _WEIGHTS))
        self.variables = _unflatten_npz(data)
        self._fns = {}
        for name in self.manifest["endpoints"]:
            with open(os.path.join(path, f"{name}.stablehlo"), "rb") as f:
                self._fns[name] = jax.export.deserialize(f.read())

    def _run_padded(self, name: str, images_u8: np.ndarray) -> dict:
        if name not in self._fns:
            raise KeyError(f"endpoint {name!r} not in artifact "
                           f"(has {sorted(self._fns)})")
        images_u8 = np.asarray(images_u8, np.uint8)
        if images_u8.ndim == 3:
            images_u8 = images_u8[None]
        n, B = images_u8.shape[0], self.batch_size
        chunks = []
        for start in range(0, n, B):
            chunk = images_u8[start:start + B]
            rows = chunk.shape[0]
            if rows < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:1], B - rows, axis=0)])
            out = self._fns[name].call(self.variables, jnp.asarray(chunk))
            chunks.append({k: np.asarray(v)[:rows] for k, v in out.items()})
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    def classify(self, images_u8: np.ndarray) -> dict:
        return self._run_padded("classify", images_u8)

    def reconstruct(self, images_u8: np.ndarray) -> dict:
        return self._run_padded("reconstruct", images_u8)

    def prepare_image(self, img_u8: np.ndarray) -> np.ndarray:
        """Same eval geometry as InferenceEngine.prepare_image."""
        from viscoin_tpu.data.transforms import host_test_transform

        img_u8 = np.asarray(img_u8, np.uint8)
        if img_u8.shape[:2] != (self.resolution, self.resolution):
            img_u8 = host_test_transform(
                img_u8, size=self.resolution,
                resize_to=int(self.resolution / 0.875))
        return img_u8


def load_exported(path: str) -> ExportedEngine:
    """Load a sealed serving artifact (no model code involved)."""
    return ExportedEngine(path)
