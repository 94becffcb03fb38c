"""Flax model zoo (reference: viscoin/models/* + stylegan2_ada networks)."""

from viscoin_tpu.models.bundle import VisCoINModels, default_models, init_models
from viscoin_tpu.models.concept2clip import Concept2CLIP, Concept2CLIPStyleGAN
from viscoin_tpu.models.concept_extractor import ConceptExtractor, max_pool_concepts
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.lpips import LPIPS
from viscoin_tpu.models.resnet import Classifier, ResNetBackbone
from viscoin_tpu.models.stylegan import (
    Discriminator,
    Generator,
    GeneratorAdapted,
    MappingNetwork,
    MappingNetworkAdapted,
    SynthesisNetwork,
    adapted_params_from_gan,
)

__all__ = [
    "VisCoINModels", "default_models", "init_models",
    "Concept2CLIP", "Concept2CLIPStyleGAN",
    "ConceptExtractor", "max_pool_concepts", "Explainer", "LPIPS",
    "Classifier", "ResNetBackbone",
    "Discriminator", "Generator", "GeneratorAdapted", "MappingNetwork",
    "MappingNetworkAdapted", "SynthesisNetwork", "adapted_params_from_gan",
]
