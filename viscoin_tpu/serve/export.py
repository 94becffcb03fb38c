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
from viscoin_tpu.serve.engine import (
    _cast_tree,
    build_endpoint_fns,
    prepare_image,
    run_padded,
)
from viscoin_tpu.utils.checkpoints import _flat_keys, _unflatten_npz

_MANIFEST = "manifest.json"
_WEIGHTS = "variables.npz"


def _save_weights(path: str, variables) -> None:
    """npz cannot represent bfloat16 (np.savez silently degrades ml_dtypes
    arrays to raw void '|V2' — unloadable); store bf16 leaves upcast to
    float32, which is EXACT (bf16 values are a subset of fp32), and let the
    loader cast back per the manifest's compute_dtype."""
    keys, vals, _ = _flat_keys(variables)
    out = {}
    for k, v in zip(keys, vals):
        v = np.asarray(v)
        if v.dtype == jnp.bfloat16:
            v = v.astype(np.float32)
        out[k] = v
    np.savez(os.path.join(path, _WEIGHTS), **out)


def export_serving(
    models: VisCoINModels,
    path: str,
    batch_size: int = 8,
    compute_dtype: str = "float32",
    endpoints: tuple[str, ...] = ("classify", "reconstruct", "explain"),
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
    _save_weights(path, variables)

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
        self.compute_dtype = self.manifest.get("compute_dtype", "float32")
        data = np.load(os.path.join(path, _WEIGHTS))
        # Invert _save_weights: float32 leaves cast back to the export's
        # compute dtype (exports cast every fp32 leaf, so this reproduces
        # the exported tree exactly).
        self.variables = _cast_tree(_unflatten_npz(data), self.compute_dtype)
        self._fns = {}
        for name in self.manifest["endpoints"]:
            with open(os.path.join(path, f"{name}.stablehlo"), "rb") as f:
                self._fns[name] = jax.export.deserialize(f.read())

    def _call_endpoint(self, name: str, images_u8: np.ndarray) -> dict:
        if name not in self._fns:
            raise KeyError(f"endpoint {name!r} not in artifact "
                           f"(has {sorted(self._fns)})")
        fn = self._fns[name]
        return run_padded(lambda c: fn.call(self.variables, c), images_u8,
                          self.batch_size)

    def classify(self, images_u8: np.ndarray) -> dict:
        return self._call_endpoint("classify", images_u8)

    def reconstruct(self, images_u8: np.ndarray) -> dict:
        return self._call_endpoint("reconstruct", images_u8)

    def explain(self, images_u8: np.ndarray) -> dict:
        return self._call_endpoint("explain", images_u8)

    def prepare_image(self, img_u8: np.ndarray) -> np.ndarray:
        return prepare_image(img_u8, self.resolution)


def load_exported(path: str) -> ExportedEngine:
    """Load a sealed serving artifact (no model code involved)."""
    return ExportedEngine(path)
