"""Spatial (H-axis) sharding of the synthesis forward over a 2-D mesh —
the sequence-parallel analogue for this vision workload (SURVEY.md §2.4).
GSPMD propagates the output sharding up the pyramid and inserts the conv
halo exchanges; no model-code changes are needed."""

import numpy as np

import jax
import jax.numpy as jnp

from viscoin_tpu.models.stylegan import GeneratorAdapted
from viscoin_tpu.parallel.mesh import image_sharding, make_mesh_2d

IMG, NK = 32, 8


def test_spatially_sharded_reconstruction():
    mesh = make_mesh_2d(2, 4)
    gan = GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                           channel_base=256, channel_max=16)
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((4, 3, 3, NK)), jnp.float32)
    pp = jnp.asarray(rng.standard_normal((4, 9 * NK)), jnp.float32)
    variables = gan.init({"params": jax.random.PRNGKey(0)}, phi, pp,
                         noise_mode="const")

    ref = gan.apply(variables, phi, pp, noise_mode="const")

    sharded = jax.jit(
        lambda v, a, b: gan.apply(v, a, b, noise_mode="const"),
        out_shardings=image_sharding(mesh),
    )(variables, phi, pp)

    # output really is sharded over (data, model)
    assert sharded.sharding.is_equivalent_to(image_sharding(mesh), 4)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatially_sharded_train_step_matches_single_device():
    """The FULL VisCoIN train step on a 2-D (data, model) mesh — batch on
    'data', image H on 'model', GSPMD halo exchanges through all five
    forwards and the backward — must reproduce the unsharded step's loss
    and post-step params (fp32)."""
    from viscoin_tpu.models.bundle import VisCoINModels, init_models
    from viscoin_tpu.models.concept_extractor import ConceptExtractor
    from viscoin_tpu.models.explainer import Explainer
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.parallel.mesh import replicate
    from viscoin_tpu.train.viscoin import (
        VisCoINTrainingParams,
        create_train_state,
        fake_sample_keys,
        make_frozen,
        make_jitted_train_step,
        make_sample_fakes,
    )

    NC = 4
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
    generator = Generator(z_dim=16, w_dim=32, img_resolution=IMG,
                          channel_base=256, channel_max=16, mapping_layers=2)
    gvars = generator.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 16)),
                           noise_mode="const")
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    cfg = VisCoINTrainingParams(iterations=10, batch_size=2, cd_fid_iteration=-1)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.integers(0, NC, 2).astype(np.int32)
    key = jax.random.PRNGKey(3)

    def run(mesh):
        step = make_jitted_train_step(models, generator, lpips, cfg, mesh=mesh,
                                      external_fakes=True)
        sampler = make_sample_fakes(generator, cfg, mesh=mesh)
        frozen = make_frozen(models, gvars, lparams)
        state = create_train_state(models, cfg)
        if mesh is not None:
            frozen = replicate(mesh, frozen)
            state = replicate(mesh, state)
        fakes = sampler(frozen, fake_sample_keys(key, 0, 1))
        state, m = step(state, frozen, jnp.asarray(images), jnp.asarray(labels),
                        key, fakes[0])
        return (float(m["total_loss"]),
                jax.tree_util.tree_leaves(jax.device_get(state.params)))

    loss_1d, params_1d = run(None)
    loss_2d, params_2d = run(make_mesh_2d(2, 4))
    np.testing.assert_allclose(loss_2d, loss_1d, rtol=1e-4)
    for a, b in zip(params_2d, params_1d):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
