"""Concept distribution analytics (reference: viscoin/testing/concepts.py).

TPU-first: per-batch concept activations, the concept×concept outer-product
accumulation, and per-class scatter are computed on-device in one jitted
function (the reference loops per image on host, concepts.py:178-191);
only the accumulated matrices come back to the host.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import device_preprocess
from viscoin_tpu.models.bundle import VisCoINModels
from viscoin_tpu.models.concept_extractor import max_pool_concepts
from viscoin_tpu.utils.maths import normalize


@dataclass
class ConceptTestResults:
    """Reference: testing/concepts.py:18-111 (plot methods preserved)."""

    classifier_accuracy: float
    explainer_accuracy: float
    concept_activation_per_image: np.ndarray
    concept_activation_per_concept: np.ndarray
    raw_concept_mean_activation: np.ndarray
    concept_correlations: np.ndarray
    class_concept_correlations: np.ndarray
    concept_class_correlations: np.ndarray
    concept_entropy: np.ndarray
    class_counts: np.ndarray

    def print_accuracies(self):
        print(f"Classifier accuracy: {self.classifier_accuracy * 100:2f}%")
        print(f"Explainer accuracy: {self.explainer_accuracy * 100:2f}%")

    def plot_concept_activation_per_concept(self):
        import matplotlib.pyplot as plt

        plt.hist(self.concept_activation_per_concept, bins=30, edgecolor="black")
        plt.title("Concept activation per concept over the test dataset")
        plt.xlabel("Activation (% of total activation)")
        plt.ylabel("Amount of concepts")
        plt.grid()
        plt.show()

    def plot_concept_activation_per_image(self):
        import matplotlib.pyplot as plt

        plt.hist(self.concept_activation_per_image, bins=30, edgecolor="black")
        plt.title("Concept activation per image over the test dataset")
        plt.xlabel("Activation (% of total activation)")
        plt.ylabel("Amount of concepts")
        plt.grid()
        plt.show()

    def plot_class_concept_correlations(self):
        import matplotlib.pyplot as plt

        concept_order = self.class_concept_correlations.mean(axis=0).argsort()
        class_order = self.class_concept_correlations.mean(axis=1).argsort()
        plt.imshow(self.class_concept_correlations[:, concept_order][class_order, :])
        plt.title("Sorted importance of concepts for each class")
        plt.xlabel("Concept")
        plt.ylabel("Class")
        plt.show()

    def plot_concept_class_correlations(self):
        import matplotlib.pyplot as plt

        class_order = self.concept_class_correlations.mean(axis=0).argsort()
        concept_order = self.concept_class_correlations.mean(axis=1).argsort()
        plt.imshow(self.concept_class_correlations[concept_order, :][:, class_order].T)
        plt.title("Sorted importance of classes for each concept")
        plt.xlabel("Concept")
        plt.ylabel("Class")
        plt.show()

    def plot_concept_entropies(self):
        import matplotlib.pyplot as plt

        plt.plot(self.concept_entropy[self.raw_concept_mean_activation.argsort()][::-1],
                 label="Concept entropy by average activation")
        plt.plot(np.sort(self.concept_entropy), label="Sorted concept entropies")
        plt.grid()
        plt.title("Concept entropy among classes (higher means less class-separating)")
        plt.xlabel("Concept")
        plt.ylabel("Entropy")
        plt.legend()
        plt.show()


def test_concepts(models: VisCoINModels, dataloader, n_classes: int) -> ConceptTestResults:
    """Dataset-wide concept statistics (reference: testing/concepts.py:114-219)."""

    @jax.jit
    def batch_stats(variables, images_u8, labels, valid):
        x = device_preprocess(images_u8)
        classes, hidden = models.classifier.apply(variables["classifier"], x, train=False)
        phi, _ = models.concept_extractor.apply({"params": variables["psi"]},
                                                tuple(hidden[-3:]))
        expl = models.explainer.apply({"params": variables["theta"]}, phi)

        acts = max_pool_concepts(phi) * valid[:, None]  # (B, K)
        preds = jnp.argmax(classes, axis=1)
        preds_expl = jnp.argmax(expl, axis=1)
        onehot = jax.nn.one_hot(labels, n_classes) * valid[:, None]  # (B, C)

        return {
            "cls_correct": jnp.sum((preds == labels) * valid),
            "expl_correct": jnp.sum((preds_expl == labels) * valid),
            "act_sorted": jnp.sum(jnp.sort(acts, axis=1) * valid[:, None], axis=0),
            "act_sum": jnp.sum(acts, axis=0),
            "corr": acts.T @ acts,  # (K, K) outer-product accumulation
            "class_corr": onehot.T @ acts,  # (C, K)
            "class_counts": jnp.sum(onehot, axis=0),
        }

    variables = {
        "classifier": models.classifier_vars,
        "psi": models.concept_params,
        "theta": models.explainer_params,
    }

    acc: dict[str, np.ndarray] = {}
    cls_accs, expl_accs = [], []
    total = 0
    batch_size = dataloader.batch_size
    from viscoin_tpu.data.loader import pad_batch

    for images, labels in dataloader:
        images, labels, valid_np = pad_batch(batch_size, images, labels)
        n = int(valid_np.sum())
        out = batch_stats(variables, jnp.asarray(images), jnp.asarray(labels),
                          jnp.asarray(valid_np))
        cls_accs.append(float(out["cls_correct"]) / n)
        expl_accs.append(float(out["expl_correct"]) / n)
        for k in ["act_sorted", "act_sum", "corr", "class_corr", "class_counts"]:
            v = np.asarray(out[k], np.float64)
            acc[k] = acc.get(k, 0) + v
        total += n

    class_counts = acc["class_counts"]
    class_concept = acc["class_corr"]  # (C, K)
    balanced = class_concept / np.maximum(class_counts[:, None], 1) * class_counts.max()

    # per-concept class probabilities → entropy (reference: concepts.py:193-203)
    z = balanced - balanced.max(axis=0, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(axis=0, keepdims=True)
    entropies = -np.sum(p * np.log(p + 1e-6), axis=0)

    return ConceptTestResults(
        classifier_accuracy=float(np.mean(cls_accs)),
        explainer_accuracy=float(np.mean(expl_accs)),
        concept_activation_per_image=normalize(acc["act_sorted"]),
        concept_activation_per_concept=np.sort(normalize(acc["act_sum"])),
        raw_concept_mean_activation=normalize(acc["act_sum"]),
        concept_correlations=normalize(acc["corr"]),
        class_concept_correlations=normalize(class_concept, axis=1),
        concept_class_correlations=normalize(balanced, axis=0).T,
        class_counts=class_counts,
        concept_entropy=normalize(entropies),
    )
