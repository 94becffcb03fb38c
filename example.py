"""Example script to showcase the models in action (reference: example.py).

The canonical forward pass (SURVEY.md §3.5): classifier f → hidden[-3:] →
Psi → (Phi, Phi') → Theta logits, and G(z1=Phi, z2=Phi') → 256² image.

Runs with random weights out of the box (no downloads); point
VISCOIN_DATA_DIR at CUB_200_2011 to use real images, otherwise synthetic
images are used.
"""

import numpy as np
import jax
import jax.numpy as jnp

from viscoin_tpu.data.transforms import device_preprocess
from viscoin_tpu.models.bundle import default_models, init_models
from viscoin_tpu.train.losses import concept_regularization_loss
from viscoin_tpu.utils.images import from_jax

N_CLASSES = 200
N_CONCEPTS = 256

models = default_models(n_classes=N_CLASSES, n_concepts=N_CONCEPTS,
                        img_resolution=256, channel_base=16384)
models = init_models(models, jax.random.PRNGKey(0), image_size=256)

# Two images: CUB if available, else synthetic.
try:
    from viscoin_tpu.data.datasets import CUB_200_2011

    dataset = CUB_200_2011(mode="train")
except FileNotFoundError:
    from viscoin_tpu.data.datasets import SyntheticDataset

    dataset = SyntheticDataset(n=2, n_classes=N_CLASSES, image_size=256)

batch_u8 = np.stack([dataset[0][0], dataset[1][0]])
batch = device_preprocess(jnp.asarray(batch_u8))
print("Batch:", batch.shape)

variables = {
    "classifier": models.classifier_vars,
    "psi": models.concept_params,
    "theta": models.explainer_params,
    "gan": models.gan_vars,
}


@jax.jit
def forward(variables, batch):
    classes, hidden = models.classifier.apply(variables["classifier"], batch, train=False)
    concept_space, gan_helper_space = models.concept_extractor.apply(
        {"params": variables["psi"]}, tuple(hidden[-3:])
    )
    expl_classes = models.explainer.apply({"params": variables["theta"]}, concept_space)
    fake_img = models.gan.apply(variables["gan"], concept_space, gan_helper_space,
                                noise_mode="const")
    return classes, concept_space, expl_classes, fake_img


classes, concept_space, expl_classes, fake_img = forward(variables, batch)
print("Classifier classes:", classes.shape)
print("Concept space:", concept_space.shape)  # (2, 3, 3, 256) NHWC
print("Concept regularization loss:", float(concept_regularization_loss(concept_space)))
print("Explainer classes:", expl_classes.shape)
print("Fake image:", fake_img.shape)

images = from_jax(fake_img)
print("Images:", images.shape)

if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for i in range(2):
        plt.imshow(images[i])
        plt.savefig(f"example_output_{i}.png")
    print("Saved example_output_{0,1}.png")
