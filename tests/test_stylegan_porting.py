"""StyleGAN weight-porting roundtrip: build a torch-layout state dict FROM a
randomly initialized Flax generator (inverse mapping in-test), run the
converters, and require exact tree equality plus a working forward — proving
key mapping, transposes and noise-buffer routing are self-consistent."""

import numpy as np

import jax
import jax.numpy as jnp

from viscoin_tpu.models.stylegan import Generator, GeneratorAdapted
from viscoin_tpu.utils.porting import (
    convert_torch_generator,
    convert_torch_generator_adapted,
)

KEY = jax.random.PRNGKey(0)


def _to_torch_conv(k):  # HWIO -> OIHW
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _synthesis_to_torch_sd(params, noise, prefix="synthesis"):
    sd = {}
    for bname, bp in params.items():
        base = f"{prefix}.{bname}"
        for lname, lp in bp.items():
            if lname == "const":
                sd[f"{base}.const"] = np.transpose(np.asarray(lp), (2, 0, 1))
            elif lname in ("conv0", "conv1"):
                sd[f"{base}.{lname}.affine.weight"] = np.asarray(lp["affine"]["weight"])
                sd[f"{base}.{lname}.affine.bias"] = np.asarray(lp["affine"]["bias"])
                sd[f"{base}.{lname}.weight"] = _to_torch_conv(lp["weight"])
                sd[f"{base}.{lname}.bias"] = np.asarray(lp["bias"])
                sd[f"{base}.{lname}.noise_strength"] = np.asarray(lp["noise_strength"])
                sd[f"{base}.{lname}.noise_const"] = np.asarray(
                    noise[bname][lname]["noise_const"])
            elif lname == "torgb":
                sd[f"{base}.torgb.affine.weight"] = np.asarray(lp["affine"]["weight"])
                sd[f"{base}.torgb.affine.bias"] = np.asarray(lp["affine"]["bias"])
                sd[f"{base}.torgb.weight"] = _to_torch_conv(lp["weight"])
                sd[f"{base}.torgb.bias"] = np.asarray(lp["bias"])
    return sd


def _trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_generator_porting_roundtrip():
    g = Generator(z_dim=16, w_dim=32, img_resolution=16, channel_base=512,
                  channel_max=32, mapping_layers=2)
    v = g.init({"params": KEY}, jnp.zeros((1, 16)), noise_mode="const")

    sd = _synthesis_to_torch_sd(v["params"]["synthesis"], v["noise"]["synthesis"])
    for i in range(2):
        sd[f"mapping.fc{i}.weight"] = np.asarray(v["params"]["mapping"][f"fc{i}"]["weight"])
        sd[f"mapping.fc{i}.bias"] = np.asarray(v["params"]["mapping"][f"fc{i}"]["bias"])
    sd["mapping.w_avg"] = np.zeros(32, np.float32)

    out = convert_torch_generator(sd, img_resolution=16, mapping_layers=2)
    _trees_equal(out["params"], v["params"])
    _trees_equal(out["noise"], v["noise"])

    # ported variables run and reproduce the original output exactly
    z = jax.random.normal(KEY, (2, 16))
    a = g.apply(v, z, noise_mode="const")
    b = g.apply(out, z, noise_mode="const")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_adapted_porting_roundtrip():
    g = GeneratorAdapted(z_dim=8, w_dim=32, img_resolution=16,
                         channel_base=512, channel_max=32,
                         coarse_layer=2, mid_layer=4)
    phi = jax.random.normal(KEY, (1, 3, 3, 8))
    pp = jax.random.normal(KEY, (1, 72))
    v = g.init({"params": KEY}, phi, pp, noise_mode="const")

    sd = _synthesis_to_torch_sd(v["params"]["synthesis"], v["noise"]["synthesis"])
    # inverse of convert_torch_adapted_mapping: unstack the two groups back
    # into the reference's per-index s{i} modules
    mp = v["params"]["mapping"]
    num_ws = g.num_ws
    g1 = [i for i in range(num_ws) if 2 <= i <= 4]
    g2 = [i for i in range(num_ws) if i < 2 or i > 4]
    for gi, idxs in (("g1", g1), ("g2", g2)):
        for pos, i in enumerate(idxs):
            sd[f"mapping.s{i}.0.weight"] = np.asarray(mp[f"{gi}_w0"][pos])
            sd[f"mapping.s{i}.0.bias"] = np.asarray(mp[f"{gi}_b0"][pos])
    sd["mapping.fixed_w_avg"] = np.asarray(mp["fixed_w_avg"])

    out = convert_torch_generator_adapted(sd, img_resolution=16,
                                          coarse_layer=2, mid_layer=4)
    _trees_equal(out["params"], v["params"])

    a = g.apply(v, phi, pp, noise_mode="const")
    b = g.apply({"params": out["params"], "noise": out["noise"]}, phi, pp,
                noise_mode="const")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
