"""viscoin_tpu — a TPU-native JAX/Flax/Optax/Orbax/Pallas framework with the
capabilities of the reference VisCoIN implementation (GnRlLeclerc/VisCoIN-Next).

Layout:
    ops/       Pallas TPU kernels + XLA implementations (upfirdn2d, bias_act,
               modulated conv) replacing the reference's CUDA plugins
               (reference: stylegan2_ada/torch_utils/ops/*).
    models/    Flax modules: ResNet-50 classifier `f`, ConceptExtractor `Psi`,
               Explainer `Theta`, StyleGAN2 synthesis + adapted generator,
               LPIPS VGG, CLIP ViT, Inception FID, Concept2CLIP
               (reference: viscoin/models/*).
    data/      CUB-200-2011 / FunnyBirds datasets, device-side transform graph
               (reference: viscoin/datasets/*).
    train/     losses and jitted training steps (reference: viscoin/training/*).
    eval/      model evaluation: test_viscoin, concept analytics, amplification,
               FID (reference: viscoin/testing/*).
    parallel/  device mesh / sharding helpers (new capability — the reference is
               single-GPU, SURVEY.md §2.4).
    utils/     logging, metrics, result types, images, gradcam
               (reference: viscoin/utils/*).
    cli/       click CLI with the reference's public surface
               (reference: main.py + viscoin/cli/*).
"""

__version__ = "0.1.0"
