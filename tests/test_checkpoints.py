"""Checkpoint I/O roundtrips: joint save/load, self-describing bundle, and
train-state resume (the reference has save-only checkpointing, SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted
from viscoin_tpu.utils import checkpoints as ckpt

IMG, NC, NK = 32, 5, 8


def _tiny_models():
    m = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    return init_models(m, jax.random.PRNGKey(0), image_size=IMG)


def _trees_equal(a, b) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_save_load_viscoin_roundtrip(tmp_path):
    models = _tiny_models()
    path = str(tmp_path / "bundle")
    ckpt.save_viscoin(models, path)

    fresh = _tiny_models()
    # scramble, then load must restore
    fresh.concept_params = jax.tree_util.tree_map(lambda x: x * 0, fresh.concept_params)
    fresh = ckpt.load_viscoin(fresh, path)
    assert _trees_equal(fresh.concept_params, models.concept_params)
    assert _trees_equal(fresh.gan_vars, models.gan_vars)


def test_load_viscoin_bundle_self_describing(tmp_path):
    models = _tiny_models()
    path = str(tmp_path / "bundle")
    ckpt.save_viscoin(models, path)

    loaded = ckpt.load_viscoin_bundle(path)  # no module config supplied
    assert loaded.gan.z_dim == NK and loaded.gan.img_resolution == IMG
    assert loaded.explainer.n_classes == NC
    assert _trees_equal(loaded.explainer_params, models.explainer_params)

    # and it runs
    x = jnp.zeros((1, IMG, IMG, 3))
    out = loaded.forward_all(x, noise_mode="const")
    assert out["reconstruction"].shape == (1, IMG, IMG, 3)


def test_train_state_resume(tmp_path):
    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, create_train_state

    models = _tiny_models()
    cfg = VisCoINTrainingParams(iterations=10, batch_size=2)
    state = create_train_state(models, cfg)
    state = state.replace(step=state.step + 7)
    path = str(tmp_path / "state")
    ckpt.save_train_state(state, path)

    fresh = create_train_state(models, cfg)
    restored = ckpt.restore_train_state(fresh, path)
    assert int(restored.step) == 7
    assert _trees_equal(restored.params, state.params)
    assert _trees_equal(restored.opt_state, state.opt_state)


def test_resume_meta_mismatch_and_absent_key_refuse(tmp_path):
    """expect_meta refuses BOTH a differing value and a key the checkpoint
    never recorded: a pre-compute_dtype checkpoint resumed under the bf16
    CLI default would otherwise silently switch training numerics."""
    import pytest

    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, create_train_state

    models = _tiny_models()
    cfg = VisCoINTrainingParams(iterations=10, batch_size=2)
    state = create_train_state(models, cfg)
    path = str(tmp_path / "state")
    ckpt.save_train_state(state, path, meta={"batch_size": 2, "seed": 0})

    fresh = create_train_state(models, cfg)
    # Subset + equal values: fine.
    ckpt.restore_train_state(fresh, path, expect_meta={"batch_size": 2})
    # Differing value: refuse.
    with pytest.raises(ValueError, match="batch_size"):
        ckpt.restore_train_state(fresh, path, expect_meta={"batch_size": 4})
    # Key absent from the saved meta: refuse (not silently accept).
    with pytest.raises(ValueError, match="compute_dtype"):
        ckpt.restore_train_state(
            fresh, path,
            expect_meta={"batch_size": 2, "compute_dtype": "bfloat16"})
