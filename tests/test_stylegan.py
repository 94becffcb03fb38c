"""Tests for the Flax StyleGAN2 modules (shapes, invariants, w-indexing).

Reference parity targets: stylegan2_ada/training/networks.py and
viscoin/models/gan.py (see docstrings in viscoin_tpu/models/stylegan.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.models.stylegan import (
    FullyConnected,
    Generator,
    GeneratorAdapted,
    MappingNetwork,
    MappingNetworkAdapted,
    SynthesisNetwork,
    adapted_params_from_gan,
    flatten_concepts,
    normalize_2nd_moment,
)

KEY = jax.random.PRNGKey(0)


def test_normalize_2nd_moment():
    x = jax.random.normal(KEY, (4, 16))
    y = normalize_2nd_moment(x)
    np.testing.assert_allclose(np.mean(np.asarray(y) ** 2, axis=1), 1.0, rtol=1e-4)


def test_flatten_concepts_order():
    """Must match torch's view(-1, K*9) of a (B, K, 3, 3) tensor."""
    x = np.arange(2 * 4 * 3 * 3).reshape(2, 4, 3, 3).astype(np.float32)  # (B,K,3,3)
    nhwc = np.transpose(x, (0, 2, 3, 1))  # our layout (B,3,3,K)
    got = np.asarray(flatten_concepts(jnp.asarray(nhwc)))
    want = x.reshape(2, -1)
    np.testing.assert_array_equal(got, want)


def test_fully_connected_equalized_lr():
    """Effective output magnitude must be invariant to lr_multiplier at init."""
    x = jax.random.normal(KEY, (8, 32))
    m1 = FullyConnected(32, 16, lr_multiplier=1.0)
    m2 = FullyConnected(32, 16, lr_multiplier=0.01)
    y1 = m1.apply(m1.init(KEY, x), x)
    y2 = m2.apply(m2.init(KEY, x), x)
    # Same init distribution scale (weights stored /lr, runtime *lr).
    assert abs(float(jnp.std(y1)) - float(jnp.std(y2))) < 0.3


def test_fully_connected_bias_init_lrelu():
    x = jnp.zeros((2, 8))
    m = FullyConnected(8, 4, bias_init=1.0, activation="linear")
    y = m.apply(m.init(KEY, x), x)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


@pytest.mark.parametrize("res,num_ws", [(32, 8), (64, 10), (256, 14)])
def test_synthesis_num_ws(res, num_ws):
    net = SynthesisNetwork(img_resolution=res)
    assert net.num_ws == num_ws


def test_synthesis_channels_default_and_auto():
    net = SynthesisNetwork(img_resolution=256)
    assert net.channels(4) == 512 and net.channels(128) == 256 and net.channels(256) == 128
    auto = SynthesisNetwork(img_resolution=256, channel_base=16384)
    assert auto.channels(64) == 256 and auto.channels(256) == 64


def test_synthesis_forward_shapes():
    net = SynthesisNetwork(img_resolution=32, channel_base=1024, channel_max=64)
    ws = jax.random.normal(KEY, (2, net.num_ws, 512))
    variables = net.init({"params": KEY, "noise": KEY}, ws, noise_mode="const")
    img = net.apply(variables, ws, noise_mode="const")
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    # noise buffers exist per layer
    assert "noise" in variables


def test_synthesis_const_noise_deterministic():
    net = SynthesisNetwork(img_resolution=16, channel_base=512, channel_max=32)
    ws = jax.random.normal(KEY, (1, net.num_ws, 512))
    v = net.init({"params": KEY}, ws, noise_mode="const")
    a = net.apply(v, ws, noise_mode="const")
    b = net.apply(v, ws, noise_mode="const")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synthesis_random_noise_varies():
    net = SynthesisNetwork(img_resolution=16, channel_base=512, channel_max=32)
    ws = jax.random.normal(KEY, (1, net.num_ws, 512))
    v = net.init({"params": KEY}, ws, noise_mode="none")
    # noise_strength initializes to 0 (reference: SynthesisLayer), so bump it
    # to make the noise path observable.
    v = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 1.0 if any(getattr(p, "key", "") == "noise_strength" for p in path) else x,
        v,
    )
    a = net.apply(v, ws, noise_mode="random", rngs={"noise": jax.random.PRNGKey(1)})
    b = net.apply(v, ws, noise_mode="random", rngs={"noise": jax.random.PRNGKey(2)})
    c = net.apply(v, ws, noise_mode="const")
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_mapping_network_shapes_and_truncation():
    m = MappingNetwork(z_dim=64, w_dim=32, num_ws=6, num_layers=2)
    z = jax.random.normal(KEY, (4, 64))
    v = m.init(KEY, z)
    ws = m.apply(v, z)
    assert ws.shape == (4, 6, 32)
    # psi=0 collapses to w_avg (zeros buffer at init)
    ws0 = m.apply(v, z, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(ws0), 0.0, atol=1e-6)


def test_mapping_adapted_group_routing():
    """Layers coarse..mid must depend only on z1; the rest only on z2."""
    m = MappingNetworkAdapted(z1_dim=18, z2_dim=18, w_dim=8, num_ws=6,
                              coarse_layer=2, mid_layer=4)
    z1 = jax.random.normal(KEY, (3, 18))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (3, 18))
    v = m.init(KEY, z1, z2)
    base = np.asarray(m.apply(v, z1, z2))

    z1b = z1 + 10.0  # NOTE: normalize_2nd_moment makes this a real change
    out = np.asarray(m.apply(v, z1b, z2))
    changed = ~np.isclose(base, out, atol=1e-6).all(axis=(0, 2))  # per ws index
    assert changed[2] and changed[3] and changed[4]
    assert not changed[0] and not changed[1] and not changed[5]

    z2b = z2 * -3.0 + 1.0
    out2 = np.asarray(m.apply(v, z1, z2b))
    changed2 = ~np.isclose(base, out2, atol=1e-6).all(axis=(0, 2))
    assert changed2[0] and changed2[1] and changed2[5]
    assert not changed2[2] and not changed2[3] and not changed2[4]


def test_mapping_adapted_accepts_nhwc_phi():
    m = MappingNetworkAdapted(z1_dim=9 * 4, z2_dim=9 * 4, w_dim=8, num_ws=6,
                              coarse_layer=2, mid_layer=4)
    phi = jax.random.normal(KEY, (2, 3, 3, 4))  # NHWC concept maps
    z2 = jax.random.normal(KEY, (2, 36))
    v = m.init(KEY, phi, z2)
    ws = m.apply(v, phi, z2)
    assert ws.shape == (2, 6, 8)


def test_mapping_adapted_fixed_w_avg_bias():
    m = MappingNetworkAdapted(z1_dim=9, z2_dim=9, w_dim=4, num_ws=3,
                              coarse_layer=1, mid_layer=1)
    z = jnp.ones((1, 9))
    v = m.init(KEY, z, z)
    base = np.asarray(m.apply(v, z, z))
    v2 = jax.tree_util.tree_map(lambda x: x, v)
    v2 = {"params": dict(v2["params"])}
    v2["params"]["fixed_w_avg"] = v["params"]["fixed_w_avg"] + 1.0
    shifted = np.asarray(m.apply(v2, z, z))
    np.testing.assert_allclose(shifted, base + 1.0, rtol=1e-5)


def test_generator_adapted_end_to_end():
    g = GeneratorAdapted(z_dim=8, w_dim=32, img_resolution=16,
                         channel_base=512, channel_max=32)
    phi = jax.random.normal(KEY, (2, 3, 3, 8))
    phi_prime = jax.random.normal(KEY, (2, 72))
    v = g.init({"params": KEY}, phi, phi_prime, noise_mode="const")
    img, ws = g.apply(v, phi, phi_prime, return_latents=True, noise_mode="const")
    assert img.shape == (2, 16, 16, 3)
    assert ws.shape == (2, g.num_ws, 32)
    # gen_from_w reproduces the same image from the returned latents
    img2 = g.apply(v, ws, noise_mode="const", method=g.gen_from_w)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), rtol=1e-4, atol=1e-5)


def test_generator_original_synthetic_samples():
    g = Generator(z_dim=16, w_dim=32, img_resolution=16,
                  channel_base=512, channel_max=32, mapping_layers=2)
    z = jax.random.normal(KEY, (4, 16))
    v = g.init({"params": KEY}, z, noise_mode="const")
    img = g.apply(v, z, noise_mode="const")
    assert img.shape == (4, 16, 16, 3)


def test_adapted_params_from_gan_transplant():
    gan = Generator(z_dim=16, w_dim=32, img_resolution=16, channel_base=512, channel_max=32)
    adapted = GeneratorAdapted(z_dim=8, w_dim=32, img_resolution=16,
                               channel_base=512, channel_max=32)
    z = jax.random.normal(KEY, (1, 16))
    phi = jax.random.normal(KEY, (1, 3, 3, 8))
    phip = jax.random.normal(KEY, (1, 72))
    vg = gan.init({"params": jax.random.PRNGKey(7)}, z, noise_mode="const")
    va = adapted.init({"params": KEY}, phi, phip, noise_mode="const")
    out = adapted_params_from_gan(va, vg)
    # synthesis params must now be the pretrained ones
    leaf = out["params"]["synthesis"]["b4"]["conv1"]["weight"]
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(vg["params"]["synthesis"]["b4"]["conv1"]["weight"])
    )
    # and the transplanted tree still runs
    img = adapted.apply(out, phi, phip, noise_mode="const")
    assert img.shape == (1, 16, 16, 3)


def test_generator_adapted_low_res256():
    """low_res256 post-processing: center-crop (384, 512) + resize to 256²
    (reference: gan.py:66-68,102-103; used by a 512-res baseline model)."""
    g = GeneratorAdapted(z_dim=4, w_dim=16, img_resolution=512,
                         channel_base=4096, channel_max=8, low_res256=True)
    phi = jax.random.normal(KEY, (1, 3, 3, 4))
    pp = jax.random.normal(KEY, (1, 36))
    v = g.init({"params": KEY}, phi, pp, noise_mode="const")
    img = g.apply(v, phi, pp, noise_mode="const")
    assert img.shape == (1, 256, 256, 3)


def test_low_res256_resize_matches_torchvision():
    """The low_res256 crop+resize must match the reference's torchvision
    ``Resize((256, 256))`` on tensors (antialiased bilinear, the torchvision
    default since 0.17) — jax.image.resize defaults to antialias=True and
    agrees to float32 rounding (~2.4e-7 measured on this geometry)."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(2, 3, 512, 512)).astype(np.float32)
    # reference pipeline: CenterCrop((384, 512)) then Resize((256, 256))
    t = torch.from_numpy(x)[:, :, 64 : 64 + 384, :]
    t = F.interpolate(t, size=(256, 256), mode="bilinear", antialias=True)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    yj = xj[:, 64 : 64 + 384, :, :]
    yj = jax.image.resize(yj, (2, 256, 256, 3), "bilinear")
    np.testing.assert_allclose(np.asarray(yj),
                               t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=2e-6)


def test_discriminator_forward_and_grads():
    from viscoin_tpu.models.stylegan import Discriminator

    d = Discriminator(img_resolution=32, channel_base=512, channel_max=32)
    img = jax.random.normal(KEY, (4, 32, 32, 3))
    v = d.init(KEY, img)
    logits = d.apply(v, img)
    assert logits.shape == (4, 1)

    g = jax.grad(lambda p: jnp.sum(d.apply(p, img)))(v)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_minibatch_std_layer():
    from viscoin_tpu.models.stylegan import MinibatchStdLayer

    m = MinibatchStdLayer(group_size=2)
    x = jax.random.normal(KEY, (4, 8, 8, 6))
    y = m.apply({}, x)
    assert y.shape == (4, 8, 8, 7)
    # identical samples within a group → zero stddev channel
    x0 = jnp.broadcast_to(x[:1], x.shape)
    y0 = m.apply({}, x0)
    np.testing.assert_allclose(np.asarray(y0[..., -1]), 0.0, atol=1e-3)


def test_synthesis_grad_flows_to_mapping_only_when_frozen():
    """The VisCoIN loop freezes synthesis and trains only the mapping —
    check grads exist and are finite w.r.t. mapping params."""
    g = GeneratorAdapted(z_dim=4, w_dim=16, img_resolution=8,
                         channel_base=256, channel_max=16)
    phi = jax.random.normal(KEY, (1, 3, 3, 4))
    phip = jax.random.normal(KEY, (1, 36))
    v = g.init({"params": KEY}, phi, phip, noise_mode="const")
    params, noise = v["params"], v.get("noise", {})

    def loss(mapping_params):
        p = {"params": {**params, "mapping": mapping_params}, "noise": noise}
        img = g.apply(p, phi, phip, noise_mode="const")
        return jnp.mean(img**2)

    grads = jax.grad(loss)(params["mapping"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert sum(float(jnp.abs(x).sum()) for x in flat) > 0
