"""Model evaluation (reference: viscoin/testing/*)."""

from viscoin_tpu.eval.classifiers import test_classifier
from viscoin_tpu.eval.concept2clip import TensorLoader, test_concept2clip
from viscoin_tpu.eval.concepts import ConceptTestResults, test_concepts
from viscoin_tpu.eval.fid import FeatureStats, fid_from_stats, frechet_distance
from viscoin_tpu.eval.spaces import compute_concept_space, compute_w_space
from viscoin_tpu.eval.viscoin import (
    AmplifiedConceptsResults,
    Selection,
    amplify_concepts,
    amplify_specific_concepts,
    make_amplify_fns,
    test_viscoin,
)

__all__ = [
    "test_classifier", "TensorLoader", "test_concept2clip",
    "ConceptTestResults", "test_concepts",
    "FeatureStats", "fid_from_stats", "frechet_distance",
    "compute_concept_space", "compute_w_space",
    "AmplifiedConceptsResults", "Selection", "amplify_concepts",
    "amplify_specific_concepts", "make_amplify_fns", "test_viscoin",
]
