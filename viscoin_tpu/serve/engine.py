"""Jitted inference endpoints over a VisCoIN bundle.

Every endpoint is ONE device program at a fixed batch shape: static shapes
mean each endpoint compiles exactly once (remote relay compiles cost minutes
— CLAUDE.md), and partial batches ride as padding with the padded rows
simply ignored on the host. Variables are jit *arguments*, never closures
(the make_frozen rule: closure constants serialize into the HLO payload).

The endpoints mirror the reference's offline analysis surface as online
calls (reference: example.py:49-66 forward chain, testing/viscoin.py:189
amplification) — the serving wrapper itself is a new capability (SURVEY.md
§1: the reference has no serving layer).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import denormalize, device_preprocess, host_test_transform
from viscoin_tpu.eval.viscoin import (
    Selection,
    amplify_concepts,
    make_amplify_fns,
)
from viscoin_tpu.models.bundle import VisCoINModels
from viscoin_tpu.models.concept_extractor import max_pool_concepts


def _cast_tree(tree, dtype):
    dt = jnp.dtype(dtype)
    if dt == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def prepare_image(img_u8: np.ndarray, resolution: int) -> np.ndarray:
    """Arbitrary-size HWC u8 -> the model resolution, with the exact eval
    geometry (Resize(short=size/0.875) + CenterCrop — data/transforms)."""
    img_u8 = np.asarray(img_u8, np.uint8)
    if img_u8.shape[:2] != (resolution, resolution):
        img_u8 = host_test_transform(img_u8, size=resolution,
                                     resize_to=int(resolution / 0.875))
    return img_u8


def run_padded(call, images_u8: np.ndarray, batch_size: int) -> dict:
    """Chunk a u8 batch to the compiled batch size, pad the last chunk
    (repeat-first-row, parallel.mesh.pad_to_multiple), drop the padding rows
    from each output, and concatenate. ``call(chunk) -> dict`` runs one
    fixed-shape device batch. Shared by the live and the sealed-artifact
    engines so padding/geometry can never drift between them."""
    from viscoin_tpu.parallel.mesh import pad_to_multiple

    images_u8 = np.asarray(images_u8, np.uint8)
    if images_u8.ndim == 3:
        images_u8 = images_u8[None]
    n = images_u8.shape[0]
    if n == 0:
        raise ValueError("empty image batch")
    chunks: list[dict] = []
    for start in range(0, n, batch_size):
        chunk, rows = pad_to_multiple(images_u8[start:start + batch_size],
                                      batch_size)
        out = call(jnp.asarray(chunk))
        chunks.append({k: np.asarray(v)[:rows] for k, v in out.items()})
    return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}


def build_endpoint_fns(models: VisCoINModels, compute_dtype: str = "float32"):
    """The pure (variables, images_u8) -> outputs functions behind the
    engine — unjitted, so :mod:`~viscoin_tpu.serve.export` can AOT-export
    the very same computations."""
    dt = jnp.dtype(compute_dtype)

    def _encode(variables, x):
        logits, hidden = models.classifier.apply(variables["classifier"], x,
                                                 train=False)
        phi, phi_prime = models.concept_extractor.apply(
            {"params": variables["psi"]}, tuple(hidden[-3:]))
        expl_logits = models.explainer.apply({"params": variables["theta"]}, phi)
        return logits.astype(jnp.float32), phi, phi_prime, expl_logits.astype(jnp.float32)

    def classify(variables, images_u8):
        """u8 batch -> classifier + explainer logits/probas and pooled
        concept activations."""
        x = device_preprocess(images_u8).astype(dt)
        logits, phi, _, expl_logits = _encode(variables, x)
        return {
            "logits": logits,
            "probas": jax.nn.softmax(logits, axis=-1),
            "expl_logits": expl_logits,
            "expl_probas": jax.nn.softmax(expl_logits, axis=-1),
            "concepts": max_pool_concepts(phi).astype(jnp.float32),
        }

    def explain(variables, images_u8):
        """u8 batch -> GradCAM heatmaps for Psi's conv1..conv5 w.r.t. the
        explainer cross-entropy at the explainer's own prediction, plus the
        predictions and pooled concept activations.

        The online analogue of the `concept-heatmaps` CLI (reference:
        cli/concept_heatmaps.py:33-66) — serving has no ground-truth labels,
        so the explained class is argmax(explainer logits) instead of the
        dataset label (the standard "explain the model's decision" form).
        One device program: classifier forward + Psi forward with
        ``nn.perturb`` taps + one backward w.r.t. the taps (the functional
        equivalent of the reference's hooks — utils/gradcam.py)."""
        from viscoin_tpu.train.losses import softmax_cross_entropy
        from viscoin_tpu.utils.gradcam import gradcam_heatmap_device

        x = device_preprocess(images_u8).astype(dt)
        logits, hidden = models.classifier.apply(variables["classifier"], x,
                                                 train=False)
        latents = tuple(hidden[-3:])
        psi = models.concept_extractor
        _, pert0 = psi.apply({"params": variables["psi"]}, latents,
                             mutable="perturbations")
        eps0 = pert0["perturbations"]
        convs = tuple(f"conv{i}" for i in range(1, 6))

        def loss_fn(eps):
            (phi, _), taps = psi.apply(
                {"params": variables["psi"], "perturbations": eps}, latents,
                capture_intermediates=lambda mdl, _: mdl.name in convs,
                mutable=["intermediates"],
            )
            expl_logits = models.explainer.apply(
                {"params": variables["theta"]}, phi).astype(jnp.float32)
            labels = jnp.argmax(expl_logits, axis=-1)
            acts = {name: taps["intermediates"][name]["__call__"][0]
                    for name in convs}
            loss = softmax_cross_entropy(expl_logits, labels)
            return loss, (acts, expl_logits, phi)

        grads, (acts, expl_logits, phi) = jax.grad(loss_fn, has_aux=True)(eps0)
        out = {
            "logits": logits.astype(jnp.float32),
            "expl_logits": expl_logits,
            "preds": jnp.argmax(logits, axis=-1),
            "expl_preds": jnp.argmax(expl_logits, axis=-1),
            "concepts": max_pool_concepts(phi).astype(jnp.float32),
        }
        for i, name in enumerate(convs, start=1):
            out[f"heatmap_{name}"] = gradcam_heatmap_device(
                acts[name], grads[f"tap{i}"]).astype(jnp.float32)
        return out

    def reconstruct(variables, images_u8):
        """u8 batch -> u8 reconstructions (G(Psi(f(x)))) + both predictions."""
        x = device_preprocess(images_u8).astype(dt)
        logits, phi, phi_prime, expl_logits = _encode(variables, x)
        recon = models.gan.apply(variables["gan"], phi, phi_prime,
                                 noise_mode="const")
        # The generator reconstructs in ImageNet-normalized space (it is
        # trained against normalized targets, train/viscoin.py); invert to
        # display range and quantize on device (3 bytes/px back to host).
        img01 = jnp.clip(denormalize(recon.astype(jnp.float32)), 0.0, 1.0)
        recon_u8 = jnp.round(img01 * 255.0).astype(jnp.uint8)
        return {
            "reconstruction_u8": recon_u8,
            "preds": jnp.argmax(logits, axis=-1),
            "expl_preds": jnp.argmax(expl_logits, axis=-1),
        }

    return {"classify": classify, "reconstruct": reconstruct,
            "explain": explain}


class InferenceEngine:
    """Padded fixed-batch inference over a loaded bundle.

    Args:
        models: a bundle with variables loaded (e.g. via
            ``utils.checkpoints.load_viscoin_bundle``).
        batch_size: the compiled device batch. Requests of any size are
            chunked/padded to it.
        compute_dtype: "bfloat16" halves HBM traffic on TPU; weights are
            cast once at construction. Logits/probas are always fp32 out.
        mesh: optional ``jax.sharding.Mesh`` — classify/reconstruct shard
            the batch over the ``data`` axis with replicated weights (the
            serving analogue of the train step's data parallelism;
            batch_size must divide by the data-axis size). Amplify stays
            single-device (one image).
    """

    def __init__(self, models: VisCoINModels, batch_size: int = 8,
                 compute_dtype: str = "float32", mesh=None):
        self.models = models
        self.batch_size = int(batch_size)
        self.resolution = models.gan.img_resolution
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.variables = _cast_tree({
            "classifier": models.classifier_vars,
            "psi": models.concept_params,
            "theta": models.explainer_params,
            "gan": models.gan_vars,
        }, compute_dtype)
        fns = build_endpoint_fns(models, compute_dtype)
        from viscoin_tpu.parallel.mesh import tpu_compiler_options

        copts = tpu_compiler_options()
        jit_kwargs: dict = {"compiler_options": copts}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_size = mesh.shape["data"]
            if self.batch_size % data_size:
                raise ValueError(
                    f"batch_size {self.batch_size} must divide by the mesh "
                    f"data axis ({data_size})")
            rep = NamedSharding(mesh, P())
            sh = NamedSharding(mesh, P("data"))
            jit_kwargs.update(in_shardings=(rep, sh), out_shardings=sh)
            from viscoin_tpu.parallel.mesh import replicate

            self.variables = replicate(mesh, self.variables)
        self._classify = jax.jit(fns["classify"], **jit_kwargs)
        self._reconstruct = jax.jit(fns["reconstruct"], **jit_kwargs)
        self._explain = jax.jit(fns["explain"], **jit_kwargs)
        self._amplify_fns = None

    # ------------------------------ helpers ------------------------------ #

    def prepare_image(self, img_u8: np.ndarray) -> np.ndarray:
        return prepare_image(img_u8, self.resolution)

    # ----------------------------- endpoints ----------------------------- #

    def classify(self, images_u8: np.ndarray) -> dict:
        return run_padded(lambda c: self._classify(self.variables, c),
                          images_u8, self.batch_size)

    def reconstruct(self, images_u8: np.ndarray) -> dict:
        return run_padded(lambda c: self._reconstruct(self.variables, c),
                          images_u8, self.batch_size)

    def explain(self, images_u8: np.ndarray) -> dict:
        return run_padded(lambda c: self._explain(self.variables, c),
                          images_u8, self.batch_size)

    def amplify(self, image_u8: np.ndarray, selection: Selection,
                multipliers: list[float], seed: int = 0):
        """Single-image concept amplification (the reference's interactive
        interpretability, testing/viscoin.py:189 — already one batched device
        call over all 2M+1 variants via eval.viscoin)."""
        if self._amplify_fns is None:
            self._amplify_fns = make_amplify_fns(self.models)
        x = device_preprocess(jnp.asarray(self.prepare_image(image_u8))[None])[0]
        return amplify_concepts(
            x, self.models, selection, multipliers,
            rng=np.random.default_rng(seed), fns=self._amplify_fns)

    def warmup(self):
        """Compile every fixed-shape endpoint (one dummy batch each)."""
        dummy = np.zeros((self.batch_size, self.resolution, self.resolution, 3),
                         np.uint8)
        for out in (self.classify(dummy), self.reconstruct(dummy),
                    self.explain(dummy)):
            jax.block_until_ready(list(out.values()))
        return self
