"""End-to-end smoke tests: classifier training epoch, example forward,
Inception FID detector, concept2clip training round."""

import json
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.data.datasets import SyntheticDataset
from viscoin_tpu.data.loader import DataLoader
from viscoin_tpu.models.resnet import Classifier

IMG, NC = 32, 4


def test_train_classifier_epoch(tmp_path):
    from viscoin_tpu.train.classifiers import ClassifierTrainingParams, train_classifier
    from viscoin_tpu.utils.logging import configure_score_logging

    log_path = str(tmp_path / "classifier.jsonl")
    configure_score_logging(log_path)

    train_ds = SyntheticDataset(n=16, n_classes=NC, image_size=IMG, mode="train")
    test_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=8, num_threads=0)
    test_loader = DataLoader(test_ds, batch_size=8, shuffle=False, num_threads=0)

    model = Classifier(output_classes=NC, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
                           train=False)
    params = ClassifierTrainingParams(epochs=2, learning_rate=1e-3, batch_size=8)
    best, best_acc = train_classifier(model, variables, train_loader, test_loader, params)

    assert 0 <= best_acc <= 1
    assert "params" in best and "batch_stats" in best

    logging.shutdown()
    lines = [json.loads(line) for line in open(log_path)]
    assert len(lines) == 2
    for k in ["train_loss", "train_accuracy", "test_loss", "test_accuracy"]:
        assert k in lines[0]


def test_inception_features_shape(rng):
    from viscoin_tpu.models.inception import InceptionV3Features, fid_preprocess

    model = InceptionV3Features()
    x = jnp.asarray(rng.standard_normal((2, 75, 75, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)

    y = fid_preprocess(jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32)))
    assert y.shape == (1, 299, 299, 3)
    assert float(jnp.min(y)) >= -1.0 and float(jnp.max(y)) <= 1.0


def test_concept2clip_training_round(rng):
    from viscoin_tpu.models.concept2clip import Concept2CLIP
    from viscoin_tpu.train.concept2clip import (
        Concept2ClipTrainingParams,
        train_concept2clip,
    )

    nk, dim = 4, 8
    model = Concept2CLIP(n_concepts=nk, clip_dim=dim)
    spaces = rng.standard_normal((24, 3, 3, nk)).astype(np.float32)
    emb = rng.standard_normal((24, dim)).astype(np.float32)
    init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(spaces[:1]))["params"]
    best, best_loss = train_concept2clip(
        model, init_params, spaces[:16], emb[:16], spaces[16:], emb[16:],
        Concept2ClipTrainingParams(epochs=2, batch_size=8),
    )
    assert np.isfinite(best_loss)


def test_inception_converter_keys():
    """convert_torch_inception maps a synthetic torchvision-style state dict
    onto the module tree (smoke: key structure only, torchvision not installed)."""
    from viscoin_tpu.utils.porting import convert_torch_inception

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
        "Mixed_5b.branch1x1.conv.weight": np.zeros((64, 192, 1, 1), np.float32),
        "Mixed_5b.branch1x1.bn.weight": np.zeros(64, np.float32),
        "Mixed_5b.branch1x1.bn.bias": np.zeros(64, np.float32),
        "Mixed_5b.branch1x1.bn.running_mean": np.zeros(64, np.float32),
        "Mixed_5b.branch1x1.bn.running_var": np.ones(64, np.float32),
        "AuxLogits.conv0.conv.weight": np.zeros((128, 768, 1, 1), np.float32),
        "AuxLogits.conv0.bn.weight": np.zeros(128, np.float32),
        "AuxLogits.conv0.bn.bias": np.zeros(128, np.float32),
        "AuxLogits.conv0.bn.running_mean": np.zeros(128, np.float32),
        "AuxLogits.conv0.bn.running_var": np.ones(128, np.float32),
    }
    out = convert_torch_inception(sd)
    assert out["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert out["params"]["Mixed_5b"]["branch1x1"]["bn"]["scale"].shape == (64,)
    assert out["batch_stats"]["Mixed_5b"]["branch1x1"]["bn"]["mean"].shape == (64,)
    assert "AuxLogits" not in out["params"]


def test_port_weights_script_classifier(tmp_path, monkeypatch):
    """scripts/port_weights.py classifier path: torch checkpoint → orbax."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import subprocess
    import sys as _sys

    torch.manual_seed(0)
    config = transformers.ResNetConfig(embedding_size=8, hidden_sizes=[8, 16, 32, 64],
                                       depths=[1, 1, 1, 1])

    class T(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = transformers.ResNetModel(config)
            self.linear = torch.nn.Linear(64, 5)

    src = str(tmp_path / "cls.pt")
    dst = str(tmp_path / "cls-orbax")
    torch.save(T().state_dict(), src)
    result = subprocess.run(
        [_sys.executable, "scripts/port_weights.py", "classifier", src, dst],
        capture_output=True, text=True, cwd=".",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert result.returncode == 0, result.stderr[-2000:]

    from viscoin_tpu.utils.checkpoints import restore_pytree

    variables = restore_pytree(dst)
    model = Classifier(output_classes=5, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    logits, hidden = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert logits.shape == (1, 5) and len(hidden) == 5
