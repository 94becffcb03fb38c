"""Reverse weight porting (flax → torch state_dict, utils/exporting.py).

Every exporter must be the exact inverse of its porting.py converter
(roundtrip bit-equality on random-initialized models), the NVlabs constant
buffers must come back so the reference's strict ``load_state_dict``
succeeds, and the synthesis export is checked against the INDEPENDENT torch
twin of NVlabs semantics (test_synthesis_torch_twin) — a key-naming or
layout mistake in the export direction cannot hide behind our own importer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.utils import exporting as ex
from viscoin_tpu.utils import porting as po

IMG = 16


def assert_trees_equal(got, want):
    gl, gt = jax.tree_util.tree_flatten(got)
    wl, wt = jax.tree_util.tree_flatten(want)
    assert gt == wt
    for g, w in zip(gl, wl):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_export_classifier_roundtrip():
    from viscoin_tpu.models.resnet import Classifier

    model = Classifier(output_classes=7, embedding_size=8,
                       hidden_sizes=(8, 16, 32, 64), depths=(1, 2, 1, 1))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    sd = ex.export_classifier_torch(variables)
    # torch BN state includes num_batches_tracked (a strict-load requirement)
    assert "resnet.embedder.embedder.normalization.num_batches_tracked" in sd
    # depths are inferred from the exported keys (stage1 has 2 blocks)
    assert "resnet.encoder.stages.1.layers.1.layer.0.convolution.weight" in sd
    back = po.convert_torch_classifier(sd)
    assert_trees_equal(back, {"params": variables["params"],
                              "batch_stats": variables["batch_stats"]})


def test_export_concept_extractor_roundtrip():
    from viscoin_tpu.models.concept_extractor import ConceptExtractor

    model = ConceptExtractor(n_concepts=8, latent_channels=8,
                             input_channels1=16, input_channels2=32,
                             input_channels3=64)
    hidden = (jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 32)),
              jnp.zeros((1, 2, 2, 64)))
    params = model.init(jax.random.PRNGKey(0), hidden)["params"]
    back = po.convert_torch_concept_extractor(
        ex.export_concept_extractor_torch(params))
    assert_trees_equal(back, params)


def test_export_explainer_roundtrip_both_variants():
    from viscoin_tpu.models.explainer import Explainer

    phi = jnp.zeros((1, 3, 3, 8))
    for weight_norm in (True, False):
        model = Explainer(n_concepts=8, n_classes=5, normalized=weight_norm)
        params = model.init(jax.random.PRNGKey(1), phi)["params"]
        sd = ex.export_explainer_torch(params)
        if weight_norm:
            # the modern torch parametrization keys (reference
            # explainers.py:36-41 applies nn.utils.parametrizations.weight_norm)
            assert "linear.parametrizations.weight.original0" in sd
            assert sd["linear.parametrizations.weight.original0"].ndim == 2
        back = po.convert_torch_explainer(sd)
        assert_trees_equal(back, params)


def test_export_concept2clip_roundtrip():
    from viscoin_tpu.models.concept2clip import Concept2CLIP

    model = Concept2CLIP(n_concepts=8, clip_dim=12)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 72)))["params"]
    back = po.convert_torch_concept2clip(ex.export_concept2clip_torch(params))
    assert_trees_equal(back, params)


def _tiny_generator():
    from viscoin_tpu.models.stylegan import Generator

    return Generator(z_dim=8, w_dim=16, img_resolution=IMG,
                     channel_base=256, channel_max=16, mapping_layers=2)


def test_export_generator_roundtrip_and_buffers():
    generator = _tiny_generator()
    variables = generator.init({"params": jax.random.PRNGKey(3)},
                               jnp.zeros((1, 8)), noise_mode="const")
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd = ex.export_generator_torch(variables)

    # NVlabs buffer reconstruction: resample_filter on every SynthesisLayer
    # and SynthesisBlock (setup_filter([1,3,3,1]) = outer/64), w_avg on the
    # mapping — a strict load_state_dict finds every key.
    f = np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0
    for key in ("synthesis.b4.resample_filter",
                "synthesis.b8.conv0.resample_filter",
                "synthesis.b16.conv1.resample_filter"):
        np.testing.assert_allclose(sd[key], f)
    assert "mapping.w_avg" in sd and "synthesis.b8.conv0.noise_const" in sd

    back = po.convert_torch_generator(sd, img_resolution=IMG, mapping_layers=2)
    assert_trees_equal(back, variables)


def test_export_generator_adapted_roundtrip():
    from viscoin_tpu.models.stylegan import GeneratorAdapted

    gan = GeneratorAdapted(z_dim=8, w_dim=32, img_resolution=IMG,
                           channel_base=256, channel_max=16)
    variables = gan.init({"params": jax.random.PRNGKey(4)},
                         jnp.zeros((1, 3, 3, 8)), jnp.zeros((1, 72)),
                         noise_mode="const")
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd = ex.export_generator_adapted_torch(
        variables, num_ws=gan.num_ws, num_layers=gan.mapping_num_layers,
        coarse_layer=gan.coarse_layer, mid_layer=gan.mid_layer)
    # per-index MLPs restored (reference gan.py:189-209 naming)
    assert "mapping.s0.0.weight" in sd and "mapping.fixed_w_avg" in sd
    back = po.convert_torch_generator_adapted(
        sd, img_resolution=IMG, num_layers=gan.mapping_num_layers,
        coarse_layer=gan.coarse_layer, mid_layer=gan.mid_layer)
    assert_trees_equal(back, {"params": variables["params"],
                              "noise": variables["noise"]})


def test_export_discriminator_roundtrip():
    from viscoin_tpu.models.stylegan import Discriminator

    disc = Discriminator(img_resolution=IMG, channel_base=256, channel_max=16,
                         mbstd_group_size=2)
    params = disc.init(jax.random.PRNGKey(5),
                       jnp.zeros((2, IMG, IMG, 3)))["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = ex.export_discriminator_torch(params)
    assert "b16.fromrgb.resample_filter" in sd  # Conv2dLayer buffer
    back = po.convert_torch_discriminator(sd, img_resolution=IMG)
    assert_trees_equal(back, params)


def test_export_synthesis_matches_torch_twin():
    """The EXPORT direction against the independent NVlabs-semantics twin:
    a random flax synthesis, exported to the torch layout, must produce the
    same image through the twin's grouped-conv/naive-upfirdn forward."""
    torch = pytest.importorskip("torch")
    from test_synthesis_torch_twin import synthesis_t

    from viscoin_tpu.models.stylegan import SynthesisNetwork

    model = SynthesisNetwork(w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=32)
    num_ws = model.num_ws
    ws = np.random.default_rng(6).standard_normal((2, num_ws, 32))
    variables = model.init({"params": jax.random.PRNGKey(6)},
                           jnp.zeros((1, num_ws, 32)), noise_mode="const")

    img_j = model.apply(variables, jnp.asarray(ws, jnp.float32),
                        noise_mode="const")

    sd = ex.export_synthesis_torch(variables["params"], variables["noise"],
                                   prefix="", include_buffers=False)
    sd_t = {k: torch.as_tensor(np.asarray(v), dtype=torch.float64)
            for k, v in sd.items()}
    channels = lambda res: min(256 // res, 32)  # noqa: E731
    img_t = synthesis_t(torch.as_tensor(ws, dtype=torch.float64), sd_t,
                        IMG, channels)

    ref = np.transpose(img_t.numpy(), (0, 2, 3, 1))
    got = np.asarray(img_j, np.float64)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale, rtol=2e-4)


def test_export_viscoin_joint_roundtrip():
    """The joint dict matches the reference save_viscoin layout
    (models/utils.py:177-192) and every member converts back exactly."""
    from viscoin_tpu.models.bundle import VisCoINModels, init_models
    from viscoin_tpu.models.concept_extractor import ConceptExtractor
    from viscoin_tpu.models.explainer import Explainer
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.models.stylegan import GeneratorAdapted

    models = VisCoINModels(
        classifier=Classifier(output_classes=5, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=8, latent_channels=8,
                                           input_channels1=16,
                                           input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=8, n_classes=5),
        gan=GeneratorAdapted(z_dim=8, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models = init_models(models, jax.random.PRNGKey(7), image_size=32)
    joint = ex.export_viscoin_torch(models)
    assert set(joint) == {"classifier", "concept_extractor", "explainer", "gan"}

    assert_trees_equal(po.convert_torch_classifier(joint["classifier"]),
                       {"params": models.classifier_vars["params"],
                        "batch_stats": models.classifier_vars["batch_stats"]})
    assert_trees_equal(
        po.convert_torch_concept_extractor(joint["concept_extractor"]),
        models.concept_params)
    assert_trees_equal(po.convert_torch_explainer(joint["explainer"]),
                       models.explainer_params)
    assert_trees_equal(
        po.convert_torch_generator_adapted(
            joint["gan"], img_resolution=IMG,
            num_layers=models.gan.mapping_num_layers,
            coarse_layer=models.gan.coarse_layer,
            mid_layer=models.gan.mid_layer),
        {"params": models.gan_vars["params"],
         "noise": models.gan_vars["noise"]})


def test_port_weights_export_stylegan_script(tmp_path, monkeypatch):
    """scripts/port_weights.py export-stylegan end to end: a `train gan`
    export (+ sibling discriminator) becomes torch-loadable state_dicts that
    roundtrip through the import converters."""
    torch = pytest.importorskip("torch")
    import sys

    from viscoin_tpu.models.stylegan import Discriminator
    from viscoin_tpu.utils.checkpoints import save_pytree

    generator = _tiny_generator()
    gvars = generator.init({"params": jax.random.PRNGKey(8)},
                           jnp.zeros((1, 8)), noise_mode="const")
    src = str(tmp_path / "gan-tiny")
    save_pytree(gvars, src)
    disc = Discriminator(img_resolution=IMG, channel_base=256, channel_max=16,
                         mbstd_group_size=2)
    d_params = disc.init(jax.random.PRNGKey(9),
                         jnp.zeros((2, IMG, IMG, 3)))["params"]
    save_pytree(d_params, f"{src}.discriminator")

    sys.path.insert(0, "scripts")
    import port_weights

    dst = str(tmp_path / "gan.pth")
    monkeypatch.setattr(sys, "argv",
                        ["port_weights.py", "export-stylegan", src, dst])
    port_weights.main()

    sd = torch.load(dst, map_location="cpu", weights_only=True)
    back = po.convert_torch_generator(po.state_dict_to_numpy(sd),
                                      img_resolution=IMG, mapping_layers=2)
    assert_trees_equal(back, jax.tree_util.tree_map(np.asarray, gvars))

    d_sd = torch.load(f"{dst}.discriminator", map_location="cpu",
                      weights_only=True)
    d_back = po.convert_torch_discriminator(po.state_dict_to_numpy(d_sd),
                                            img_resolution=IMG)
    assert_trees_equal(d_back, jax.tree_util.tree_map(np.asarray, d_params))


def test_port_weights_export_classifier_and_concept2clip_script(tmp_path,
                                                                monkeypatch):
    torch = pytest.importorskip("torch")
    import sys

    from viscoin_tpu.models.concept2clip import Concept2CLIP
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.utils.checkpoints import save_pytree

    cls = Classifier(output_classes=5, embedding_size=8,
                     hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    cls_vars = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        train=False)
    c2c = Concept2CLIP(n_concepts=8, clip_dim=12)
    c2c_params = c2c.init(jax.random.PRNGKey(1), jnp.zeros((1, 72)))["params"]

    sys.path.insert(0, "scripts")
    import port_weights

    for kind, variables, conv in (
        ("export-classifier", cls_vars,
         lambda sd: po.convert_torch_classifier(po.state_dict_to_numpy(sd))),
        ("export-concept2clip", c2c_params,
         lambda sd: po.convert_torch_concept2clip(po.state_dict_to_numpy(sd))),
    ):
        src = str(tmp_path / kind)
        save_pytree(variables, src)
        dst = str(tmp_path / f"{kind}.pth")
        monkeypatch.setattr(sys, "argv", ["port_weights.py", kind, src, dst])
        port_weights.main()
        sd = torch.load(dst, map_location="cpu", weights_only=True)
        want = (variables if kind == "export-concept2clip"
                else {"params": variables["params"],
                      "batch_stats": variables["batch_stats"]})
        assert_trees_equal(conv(sd), jax.tree_util.tree_map(np.asarray, want))


def test_converters_infer_resolution_and_mapping_depth():
    """convert_torch_generator / convert_torch_discriminator infer the
    resolution (and mapping depth) from the state_dict keys — non-256²
    pickles port without the caller hardcoding the reference shape."""
    from viscoin_tpu.models.stylegan import Discriminator

    generator = _tiny_generator()  # res 16, 2 mapping layers
    gvars = generator.init({"params": jax.random.PRNGKey(10)},
                           jnp.zeros((1, 8)), noise_mode="const")
    gvars = jax.tree_util.tree_map(np.asarray, gvars)
    back = po.convert_torch_generator(ex.export_generator_torch(gvars))
    assert_trees_equal(back, gvars)

    disc = Discriminator(img_resolution=IMG, channel_base=256, channel_max=16,
                         mbstd_group_size=2)
    d_params = jax.tree_util.tree_map(np.asarray, disc.init(
        jax.random.PRNGKey(11), jnp.zeros((2, IMG, IMG, 3)))["params"])
    d_back = po.convert_torch_discriminator(
        ex.export_discriminator_torch(d_params))
    assert_trees_equal(d_back, d_params)
