"""End-to-end tests of the jitted VisCoIN train step on tiny models, single
device and on the 8-device CPU mesh (data parallel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.lpips import LPIPS
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import Generator, GeneratorAdapted
from viscoin_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from viscoin_tpu.train.viscoin import (
    VisCoINTrainingParams,
    create_train_state,
    make_frozen,
    make_jitted_train_step,
    make_lr_schedule,
)

IMG = 32  # tiny everything
N_CLASSES = 5
N_CONCEPTS = 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    models = VisCoINModels(
        classifier=Classifier(output_classes=N_CLASSES, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=N_CONCEPTS, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=N_CONCEPTS, n_classes=N_CLASSES),
        gan=GeneratorAdapted(z_dim=N_CONCEPTS, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models = init_models(models, key, image_size=IMG)

    generator = Generator(z_dim=16, w_dim=32, img_resolution=IMG,
                          channel_base=256, channel_max=16, mapping_layers=2)
    gvars = generator.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, 16)), noise_mode="const")
    lpips = LPIPS()
    lvars = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, IMG, IMG, 3)),
                       jnp.zeros((1, IMG, IMG, 3)))
    # cd_fid_iteration=-1: the cr/of gate (step > cd) is on from step 0, so
    # the explainer receives gradients in the very first test steps.
    cfg = VisCoINTrainingParams(iterations=100, batch_size=4, cd_fid_iteration=-1)
    return models, generator, gvars, lpips, lvars["params"], cfg


def test_lr_schedule():
    sched = make_lr_schedule(1e-4, 100_000)
    np.testing.assert_allclose(float(sched(0)), 1e-4)
    np.testing.assert_allclose(float(sched(50_000)), 1e-4)
    np.testing.assert_allclose(float(sched(51_000)), 1e-4 * 0.8, rtol=1e-6)
    np.testing.assert_allclose(float(sched(51_999)), 1e-4 * 0.8, rtol=1e-6)
    np.testing.assert_allclose(float(sched(53_000)), 1e-4 * 0.8**3, rtol=1e-6)


def test_single_device_step(setup, rng):
    models, generator, gvars, lpips, lparams, cfg = setup
    step = make_jitted_train_step(models, generator, lpips, cfg)
    frozen = make_frozen(models, gvars, lparams)
    state = create_train_state(models, cfg)

    images = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, N_CLASSES, 4).astype(np.int32)

    p0 = jax.tree_util.tree_map(np.copy, state.params)
    state, metrics = step(state, frozen, jnp.asarray(images), jnp.asarray(labels),
                          jax.random.PRNGKey(3))
    state, metrics = step(state, frozen, jnp.asarray(images), jnp.asarray(labels),
                          jax.random.PRNGKey(4))

    assert int(state.step) == 2
    for k in ["acc_loss", "cr_loss", "of_loss", "ortho_loss", "rec_loss",
              "gan_loss", "inter_loss", "total_loss"]:
        assert np.isfinite(float(metrics[k])), k

    # all three trainable groups actually moved
    for group in ["concept_extractor", "explainer", "mapping"]:
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(p0[group]),
                            jax.tree_util.tree_leaves(state.params[group]))
        )
        assert moved, f"{group} params did not update"


def test_gate_masks_losses(setup, rng):
    """cr/of losses must be zero before cd_fid_iteration (reference:
    viscoin.py:183-188)."""
    models, generator, gvars, lpips, lparams, cfg = setup
    cfg2 = VisCoINTrainingParams(iterations=100, batch_size=4, cd_fid_iteration=10)
    step = make_jitted_train_step(models, generator, lpips, cfg2)
    frozen = make_frozen(models, gvars, lparams)
    state = create_train_state(models, cfg2)
    images = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, N_CLASSES, 4).astype(np.int32)
    _, metrics = step(state, frozen, jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(0))
    assert float(metrics["cr_loss"]) == 0.0
    assert float(metrics["of_loss"]) == 0.0


def test_data_parallel_step_matches_mesh(setup, rng):
    """The step must run sharded over the 8-device CPU mesh."""
    models, generator, gvars, lpips, lparams, cfg = setup
    mesh = make_mesh(8)
    assert mesh.devices.size == 8

    step = make_jitted_train_step(models, generator, lpips, cfg, mesh=mesh)
    frozen = replicate(mesh, make_frozen(models, gvars, lparams))
    state = create_train_state(models, cfg)
    state = replicate(mesh, state)

    images = rng.integers(0, 256, (16, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, N_CLASSES, 16).astype(np.int32)
    im_sh, lb_sh = shard_batch(mesh, images, labels)

    state, metrics = step(state, frozen, im_sh, lb_sh, jax.random.PRNGKey(5))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))


def test_bf16_compute_dtype(setup, rng):
    """The bf16 mixed-precision step must run, keep fp32 master params, and
    produce a loss close to the fp32 one."""
    models, generator, gvars, lpips, lparams, _ = setup
    images = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, N_CLASSES, 4).astype(np.int32)

    losses = {}
    for dtype in ["float32", "bfloat16"]:
        cfg = VisCoINTrainingParams(iterations=100, batch_size=4,
                                    cd_fid_iteration=-1, compute_dtype=dtype)
        step = make_jitted_train_step(models, generator, lpips, cfg)
        frozen = make_frozen(models, gvars, lparams)
        state = create_train_state(models, cfg)
        state, metrics = step(state, frozen, jnp.asarray(images),
                              jnp.asarray(labels), jax.random.PRNGKey(0))
        losses[dtype] = float(metrics["total_loss"])
        # master params stay fp32
        assert all(x.dtype == jnp.float32
                   for x in jax.tree_util.tree_leaves(state.params)
                   if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))
    assert np.isfinite(losses["bfloat16"])
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"], rtol=0.15)


def test_gradient_accumulation(setup, rng):
    models, generator, gvars, lpips, lparams, _ = setup
    cfg = VisCoINTrainingParams(iterations=100, batch_size=4,
                                gradient_accumulation=2, cd_fid_iteration=-1)
    step = make_jitted_train_step(models, generator, lpips, cfg)
    frozen = make_frozen(models, gvars, lparams)
    state = create_train_state(models, cfg)
    images = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, N_CLASSES, 4).astype(np.int32)

    p0 = jax.tree_util.tree_map(np.copy, state.params)
    state, _ = step(state, frozen, jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(0))
    # after 1 of 2 accumulation steps, params must be unchanged
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, _ = step(state, frozen, jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(1))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state.params))
    )
    assert moved


def test_external_fake_presampling(setup, rng):
    """The production path: make_sample_fakes + external_fakes step. The
    sampled batch for a step is a pure per-key function (invariant to K and
    to group position), and the step runs/updates normally."""
    from viscoin_tpu.train.viscoin import make_sample_fakes

    models, generator, gvars, lpips, lparams, cfg = setup
    sampler = make_sample_fakes(generator, cfg)
    frozen = make_frozen(models, gvars, lparams)

    k0, k1 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
    pair = sampler(frozen, jnp.stack([k0, k1]))
    assert pair.shape == (2, cfg.batch_size, IMG, IMG, 3)
    # deterministic: the same group keys regenerate identical samples (the
    # resume contract — groups are aligned to absolute step numbers)
    again = sampler(frozen, jnp.stack([k0, k1]))
    np.testing.assert_array_equal(np.asarray(pair), np.asarray(again))
    # different step keys draw different latents
    other = sampler(frozen, jnp.stack([k1, k0]))
    assert not np.allclose(np.asarray(pair[0]), np.asarray(other[0]))

    step = make_jitted_train_step(models, generator, lpips, cfg,
                                  external_fakes=True)
    state = create_train_state(models, cfg)
    images = jnp.asarray(rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, N_CLASSES, 4).astype(np.int32))
    state, metrics = step(state, frozen, images, labels, k0, pair[0])
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1
