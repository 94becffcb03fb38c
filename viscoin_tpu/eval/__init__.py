"""Model evaluation (reference: viscoin/testing/*).

Lazy exports (PEP 562) — see viscoin_tpu/train/__init__.py."""

_EXPORTS = {
    "test_classifier": "viscoin_tpu.eval.classifiers",
    "TensorLoader": "viscoin_tpu.eval.concept2clip",
    "test_concept2clip": "viscoin_tpu.eval.concept2clip",
    "ConceptTestResults": "viscoin_tpu.eval.concepts",
    "test_concepts": "viscoin_tpu.eval.concepts",
    "FeatureStats": "viscoin_tpu.eval.fid",
    "fid_from_stats": "viscoin_tpu.eval.fid",
    "frechet_distance": "viscoin_tpu.eval.fid",
    "compute_concept_space": "viscoin_tpu.eval.spaces",
    "compute_w_space": "viscoin_tpu.eval.spaces",
    "AmplifiedConceptsResults": "viscoin_tpu.eval.viscoin",
    "Selection": "viscoin_tpu.eval.viscoin",
    "amplify_concepts": "viscoin_tpu.eval.viscoin",
    "amplify_specific_concepts": "viscoin_tpu.eval.viscoin",
    "faithfulness_probe": "viscoin_tpu.eval.viscoin",
    "make_amplify_fns": "viscoin_tpu.eval.viscoin",
    "make_faithfulness_fn": "viscoin_tpu.eval.viscoin",
    "test_viscoin": "viscoin_tpu.eval.viscoin",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(name)
