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


def test_atomic_save_crash_mid_write_keeps_previous(tmp_path, monkeypatch):
    """A crash DURING a checkpoint write must leave the previous checkpoint
    loadable (the reference's torch.save overwrite has no such guarantee;
    orbax force=True deletes the target before writing). The atomic install
    writes into a .tmp sibling and swaps via renames."""
    path = str(tmp_path / "state")
    v1 = {"a": np.arange(4.0), "b": {"c": np.ones((2, 2))}}
    ckpt.save_pytree(v1, path)

    # v2's write dies partway through (after producing partial output)
    real_install = ckpt._atomic_install

    def exploding_write(p, write_fn):
        def bad(tmp):
            import os
            os.makedirs(tmp, exist_ok=True)
            open(os.path.join(tmp, "partial"), "w").write("x")
            raise RuntimeError("disk died mid-write")
        real_install(p, bad)

    monkeypatch.setattr(ckpt, "_atomic_install", exploding_write)
    with pytest.raises(RuntimeError, match="disk died"):
        ckpt.save_pytree({"a": np.zeros(4), "b": {"c": np.zeros((2, 2))}}, path)
    monkeypatch.undo()

    got = ckpt.restore_pytree(path)
    np.testing.assert_array_equal(got["a"], v1["a"])
    np.testing.assert_array_equal(got["b"]["c"], v1["b"]["c"])


def test_atomic_save_crash_between_renames_falls_back_to_old(tmp_path):
    """The one window where the final path does not exist (old renamed away,
    new not yet renamed in): restore falls back to the `.old` sibling."""
    import os

    path = str(tmp_path / "state")
    v1 = {"a": np.arange(3.0)}
    ckpt.save_pytree(v1, path)
    # simulate the crash window: committed dir moved to .old, nothing at path
    os.rename(path, path + ".old")
    assert not os.path.exists(path)
    got = ckpt.restore_pytree(path)
    np.testing.assert_array_equal(got["a"], v1["a"])


def test_async_save_commits_and_is_ordered(tmp_path):
    """async_save returns immediately; wait_for_saves commits; the LAST
    submitted save wins; restore_pytree drains pending saves itself."""
    path = str(tmp_path / "state")
    for i in range(3):
        ckpt.save_pytree({"v": np.full(4, float(i))}, path, async_save=True)
    # restore without an explicit wait: must drain the writer first
    got = ckpt.restore_pytree(path)
    np.testing.assert_array_equal(got["v"], np.full(4, 2.0))
    ckpt.wait_for_saves()  # no-op now, and must not raise


def test_async_save_error_surfaces_in_wait(tmp_path, monkeypatch):
    """A writer-thread failure is re-raised by wait_for_saves, not lost."""
    path = str(tmp_path / "state")

    def bad_install(p, write_fn):
        raise OSError("no space left")

    monkeypatch.setattr(ckpt, "_atomic_install", bad_install)
    ckpt.save_pytree({"v": np.zeros(2)}, path, async_save=True)
    with pytest.raises(OSError, match="no space"):
        ckpt.wait_for_saves()


def test_train_state_async_save_meta_is_atomic(tmp_path):
    """save_train_state(async_save=True): meta rides the same atomic unit as
    the arrays — after the commit both are present and resume validates."""
    import os

    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, create_train_state

    models = _tiny_models()
    cfg = VisCoINTrainingParams(iterations=4, batch_size=2, cd_fid_iteration=-1)
    state = create_train_state(models, cfg)
    path = str(tmp_path / "ts")
    meta = {"batch_size": 2, "seed": 0}
    ckpt.save_train_state(state, path, meta=meta, async_save=True)
    ckpt.wait_for_saves()
    assert os.path.exists(os.path.join(path, "train_state_meta.json"))
    restored = ckpt.restore_train_state(create_train_state(models, cfg), path,
                                        expect_meta=meta)
    assert int(restored.step) == int(state.step)
    with pytest.raises(ValueError, match="resume mismatch"):
        ckpt.restore_train_state(create_train_state(models, cfg), path,
                                 expect_meta={"batch_size": 4, "seed": 0})
