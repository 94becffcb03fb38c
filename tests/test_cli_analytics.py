"""Integration tests for the analytics CLIs (amplify, amplify-pca, concepts,
concept-heatmaps) against a saved tiny bundle + synthetic dataset."""

import os

import matplotlib

matplotlib.use("Agg")

import pytest
from click.testing import CliRunner

import jax

from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted
from viscoin_tpu.utils.checkpoints import save_viscoin

IMG, NC, NK = 32, 10, 8


@pytest.fixture(scope="module")
def bundle_path(tmp_path_factory):
    models = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models = init_models(models, jax.random.PRNGKey(0), image_size=IMG)
    path = str(tmp_path_factory.mktemp("ckpt") / "viscoin-tiny")
    save_viscoin(models, path)
    return path


@pytest.fixture(autouse=True)
def synth_env(monkeypatch, tmp_path):
    monkeypatch.setenv("VISCOIN_SYNTH_N", "6")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", str(IMG))
    monkeypatch.chdir(tmp_path)


def test_cli_amplify(bundle_path):
    from main import main

    result = CliRunner().invoke(main, [
        "amplify", "--viscoin-pickle-path", bundle_path, "--dataset", "synthetic",
        "--concept-top-k", "2", "--image-indices", "0,1",
    ])
    assert result.exit_code == 0, result.output


def test_cli_amplify_indices(bundle_path):
    from main import main

    result = CliRunner().invoke(main, [
        "amplify", "--viscoin-pickle-path", bundle_path, "--dataset", "synthetic",
        "--concept-indices", "0,3", "--image-indices", "0",
    ])
    assert result.exit_code == 0, result.output


def test_cli_concepts(bundle_path):
    from main import main

    result = CliRunner().invoke(main, [
        "concepts", "--viscoin-pickle-path", bundle_path, "--dataset", "synthetic",
        "--batch-size", "3",
    ])
    assert result.exit_code == 0, result.output
    assert os.path.exists("concept_results.pkl")
    assert "Classifier accuracy" in result.output

    # cached second run (no --force)
    result2 = CliRunner().invoke(main, [
        "concepts", "--viscoin-pickle-path", bundle_path, "--dataset", "synthetic",
    ])
    assert result2.exit_code == 0


def test_cli_concept_heatmaps(bundle_path):
    from main import main

    result = CliRunner().invoke(main, [
        "concept-heatmaps", "--viscoin-pickle-path", bundle_path,
        "--dataset", "synthetic",
    ])
    assert result.exit_code == 0, result.output


def test_cli_amplify_pca(bundle_path):
    from main import main

    result = CliRunner().invoke(main, [
        "amplify-pca", "--viscoin-pickle-path", bundle_path,
        "--dataset", "synthetic", "--pca", "3", "--image", "0",
    ])
    assert result.exit_code == 0, result.output
    # non-256 decode sizes join the cache key (a stale 256² cache must not
    # satisfy this IMG-sized run — eval/spaces._cache_path)
    assert os.path.exists(f"checkpoints/gan-w/synthetic_{IMG}.npz")
