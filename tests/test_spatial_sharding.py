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
