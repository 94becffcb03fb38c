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


def test_train_concept2clip_mesh_matches_single_device(rng):
    """Data-parallel concept2clip training == single-device training (the
    third and last trainer to gain a mesh; GSPMD all-reduces the MSE
    gradients). Loose Adam-scale bound: post-Adam params move ±lr·sign(g)
    per step, so near-zero-grad elements flip on reassociation noise —
    worst case 2·steps·lr = 8e-5 over the 4 steps."""
    from viscoin_tpu.models.concept2clip import Concept2CLIP
    from viscoin_tpu.parallel.mesh import make_mesh
    from viscoin_tpu.train.concept2clip import (
        Concept2ClipTrainingParams,
        train_concept2clip,
    )

    nk, dim = 4, 8
    model = Concept2CLIP(n_concepts=nk, clip_dim=dim)
    spaces = rng.standard_normal((24, 3, 3, nk)).astype(np.float32)
    emb = rng.standard_normal((24, dim)).astype(np.float32)
    init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(spaces[:1]))["params"]

    def run(mesh):
        return train_concept2clip(
            model, init_params, spaces[:16], emb[:16], spaces[16:], emb[16:],
            Concept2ClipTrainingParams(epochs=2, batch_size=8), mesh=mesh,
        )

    best_1, loss_1 = run(None)
    best_m, loss_m = run(make_mesh())  # 8 virtual CPU devices
    np.testing.assert_allclose(loss_1, loss_m, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(best_1),
                    jax.tree_util.tree_leaves(best_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


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


def test_classifier_step_mesh_matches_single_device():
    """ONE sharded classifier train step == the single-device step, tightly:
    with SGD the update is linear in the gradient, so this asserts that the
    GSPMD gradient all-reduce AND the BatchNorm batch statistics (mean/var
    over the sharded batch axis) are globally exact — no Adam sign noise."""
    import optax

    from viscoin_tpu.parallel.mesh import make_mesh
    from viscoin_tpu.train.classifiers import ClassifierState, make_classifier_train_step

    model = Classifier(output_classes=NC, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
                           train=False)
    imgs = np.random.default_rng(0).integers(0, 256, (8, IMG, IMG, 3),
                                             dtype=np.uint8)
    labels = np.arange(8, dtype=np.int32) % NC
    tx = optax.sgd(1e-2)

    def run(mesh):
        state = ClassifierState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.array,
                                               variables["batch_stats"]),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        step = make_classifier_train_step(model, tx, mesh=mesh)
        images_d, labels_d = jnp.asarray(imgs), jnp.asarray(labels)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from viscoin_tpu.parallel.mesh import image_spec, replicate

            state = replicate(mesh, state)
            images_d = jax.device_put(images_d,
                                      NamedSharding(mesh, image_spec(mesh)))
            labels_d = jax.device_put(labels_d, NamedSharding(mesh, P("data")))
        new_state, loss, correct = step(state, images_d, labels_d,
                                        jax.random.PRNGKey(1))
        return new_state, float(loss), int(correct)

    s1, loss1, correct1 = run(None)
    sm, lossm, correctm = run(make_mesh())
    np.testing.assert_allclose(loss1, lossm, rtol=1e-5)
    assert correct1 == correctm
    for a, b in zip(jax.tree_util.tree_leaves((s1.params, s1.batch_stats)),
                    jax.tree_util.tree_leaves((sm.params, sm.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_classifier_step_bf16_mixed_precision():
    """compute_dtype='bfloat16': the step runs with a finite fp32 loss,
    params AND BatchNorm running statistics stay fp32 (flax forces float32
    stat reductions; the Adam masters are never cast), and the step is
    deterministic in its inputs."""
    import optax

    from viscoin_tpu.train.classifiers import (
        ClassifierState,
        make_classifier_train_step,
    )

    model = Classifier(output_classes=NC, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
                           train=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.arange(8, dtype=jnp.int32) % NC
    tx = optax.adam(1e-3)
    step = make_classifier_train_step(model, tx, compute_dtype="bfloat16")

    def run():
        state = ClassifierState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.array,
                                               variables["batch_stats"]),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        return step(state, imgs, labels, jax.random.PRNGKey(1))

    state, loss, correct = run()
    assert np.isfinite(float(loss)) and np.asarray(loss).dtype == np.float32
    assert 0 <= int(correct) <= 8
    for leaf in jax.tree_util.tree_leaves((state.params, state.batch_stats)):
        assert np.asarray(leaf).dtype == np.float32

    state2, loss2, _ = run()
    np.testing.assert_array_equal(np.asarray(loss), np.asarray(loss2))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_classifier_mesh_matches_single_device():
    """Data-parallel classifier training == single-device training: the
    sharded step's gradients AND BatchNorm batch statistics reduce globally
    under GSPMD, so the resulting weights match (loose Adam-scale bound;
    the tight single-step equality is asserted above)."""
    from viscoin_tpu.parallel.mesh import make_mesh
    from viscoin_tpu.train.classifiers import ClassifierTrainingParams, train_classifier

    def run(mesh):
        train_ds = SyntheticDataset(n=16, n_classes=NC, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="test")
        train_loader = DataLoader(train_ds, batch_size=8, num_threads=0)
        test_loader = DataLoader(test_ds, batch_size=8, shuffle=False,
                                 num_threads=0)
        model = Classifier(output_classes=NC, embedding_size=8,
                           hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, IMG, IMG, 3)), train=False)
        params = ClassifierTrainingParams(epochs=1, learning_rate=1e-3,
                                          batch_size=8)
        return train_classifier(model, variables, train_loader, test_loader,
                                params, mesh=mesh)

    best_1, acc_1 = run(None)
    best_m, acc_m = run(make_mesh())  # 8 virtual CPU devices

    assert acc_1 == acc_m
    flat_1 = jax.tree_util.tree_leaves(best_1)
    flat_m = jax.tree_util.tree_leaves(best_m)
    # lr-scaled bound: post-Adam params move +-lr*sign(g) per step, so
    # near-zero-grad elements legitimately flip on GSPMD reassociation
    # noise — worst case 2*steps*lr = 4e-3 over the 2-step epoch (same
    # reasoning as the spatial-sharding tests).
    for a, b in zip(flat_1, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4.5e-3, rtol=1e-3)

def test_train_classifier_mesh_refuses_indivisible_batch():
    """An indivisible batch fails fast with a clear ValueError instead of a
    cryptic XLA sharding error at the first mid-epoch device_put."""
    import pytest

    from viscoin_tpu.parallel.mesh import make_mesh
    from viscoin_tpu.train.classifiers import (
        ClassifierTrainingParams,
        train_classifier,
    )

    train_ds = SyntheticDataset(n=6, n_classes=NC, image_size=IMG, mode="train")
    loader = DataLoader(train_ds, batch_size=6, num_threads=0)
    model = Classifier(output_classes=NC, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
                           train=False)
    params = ClassifierTrainingParams(epochs=1, batch_size=6)
    with pytest.raises(ValueError, match="does not divide"):
        train_classifier(model, variables, loader, loader, params,
                         mesh=make_mesh())  # 8 devices, batch 6


def test_train_classifier_sgd(tmp_path):
    """optimizer="sgd" (the reference README's Stanford-Cars recipe,
    README.md:203 — its hardcoded-Adam code cannot run it) trains through
    the same StepLR schedule; an unknown optimizer refuses."""
    from viscoin_tpu.train.classifiers import ClassifierTrainingParams, train_classifier
    from viscoin_tpu.utils.logging import configure_score_logging

    configure_score_logging(str(tmp_path / "classifier_sgd.jsonl"))
    train_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="train")
    test_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=8, num_threads=0)
    test_loader = DataLoader(test_ds, batch_size=8, shuffle=False, num_threads=0)

    model = Classifier(output_classes=NC, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
                           train=False)
    params = ClassifierTrainingParams(epochs=1, learning_rate=0.1, batch_size=8,
                                      optimizer="sgd", momentum=0.9)
    best, best_acc = train_classifier(model, variables, train_loader,
                                      test_loader, params)
    assert 0 <= best_acc <= 1
    assert all(np.all(np.isfinite(leaf))
               for leaf in jax.tree_util.tree_leaves(best))

    bad = ClassifierTrainingParams(epochs=1, batch_size=8, optimizer="rmsprop")
    with pytest.raises(ValueError, match=r"expected adam\|sgd"):
        train_classifier(model, variables, train_loader, test_loader, bad)
