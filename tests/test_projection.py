"""Latent projection (the stylegan2-ada projector.py analogue): convergence
on a recoverable target, determinism, W+ mode, CLI e2e."""

import numpy as np
import pytest
from click.testing import CliRunner

import jax
import jax.numpy as jnp

from viscoin_tpu.models.lpips import LPIPS
from viscoin_tpu.models.stylegan import Generator, num_ws_for_resolution

CFG = dict(z_dim=8, w_dim=16, img_resolution=32, mapping_layers=2,
           channel_base=256, channel_max=16)
NUM_WS = num_ws_for_resolution(CFG["img_resolution"])


@pytest.fixture(scope="module")
def gan_and_lpips():
    gen = Generator(**CFG)
    gvars = gen.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8)),
                     noise_mode="const")
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, 32, 32, 3)))["params"]
    return gen, gvars, lpips, lparams


def test_projection_converges_and_is_deterministic(gan_and_lpips):
    """Projecting an image the generator itself produced: the perceptual
    loss falls (a recoverable target); identical seeds → identical
    results."""
    from viscoin_tpu.eval.projection import project_image

    gen, gvars, lpips, lparams = gan_and_lpips
    target = np.asarray(gen.apply(gvars, jnp.ones((1, 8)) * 0.5,
                                  noise_mode="const"))[0]
    w, losses, render = project_image(gen, gvars, lpips, lparams, target,
                                      num_steps=48, w_avg_samples=64)
    assert w.shape == (NUM_WS, CFG["w_dim"])
    assert losses.shape == (48,) and np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # converging toward the target
    assert render.shape == (32, 32, 3) and render.dtype == np.uint8
    # single-w mode: one w broadcast over layers
    assert np.array_equal(w[0], w[1])

    w2, losses2, _ = project_image(gen, gvars, lpips, lparams, target,
                                   num_steps=48, w_avg_samples=64)
    np.testing.assert_array_equal(w, w2)
    np.testing.assert_array_equal(losses, losses2)


def test_noise_regularization_oracle():
    """The multi-scale autocorrelation penalty vs a from-scratch numpy
    translation of the upstream formula (roll-products at every 2×-pooled
    scale down to 8²)."""
    from viscoin_tpu.eval.projection import noise_regularization

    rng = np.random.default_rng(0)
    n = rng.normal(size=(32, 32)).astype(np.float32)

    expect, cur = 0.0, n.copy()
    while True:
        expect += np.mean(cur * np.roll(cur, 1, axis=1)) ** 2
        expect += np.mean(cur * np.roll(cur, 1, axis=0)) ** 2
        if cur.shape[0] <= 8:
            break
        h = cur.shape[0] // 2
        cur = cur.reshape(h, 2, h, 2).mean(axis=(1, 3))
    got = float(noise_regularization(jnp.asarray(n)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # white noise scores near zero; structured (constant) noise scores high
    flat = float(noise_regularization(jnp.ones((32, 32))))
    assert flat > got


def test_projection_optimizes_noise(gan_and_lpips):
    """Noise co-optimization (upstream always on): the optimized buffers
    come back renormalized (zero mean, unit RMS) and differ from the
    generator's; optimize_noise=False leaves them untouched."""
    from viscoin_tpu.eval.projection import make_projector

    gen, gvars, lpips, lparams = gan_and_lpips
    target = np.asarray(gen.apply(gvars, jnp.ones((1, 8)) * 0.5,
                                  noise_mode="const"))
    project = make_projector(gen, lpips, num_steps=8, w_avg_samples=16)
    _, noise, _ = project(gvars, lparams, jnp.asarray(target),
                          jax.random.PRNGKey(0))
    for got, orig in zip(jax.tree_util.tree_leaves(noise),
                         jax.tree_util.tree_leaves(gvars["noise"])):
        assert got.shape == orig.shape
        assert not np.array_equal(np.asarray(got), np.asarray(orig))
        np.testing.assert_allclose(float(jnp.mean(got)), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(jnp.mean(got ** 2)), 1.0, atol=1e-3)

    frozen = make_projector(gen, lpips, num_steps=4, w_avg_samples=16,
                            optimize_noise=False)
    _, noise2, _ = frozen(gvars, lparams, jnp.asarray(target),
                          jax.random.PRNGKey(0))
    for got, orig in zip(jax.tree_util.tree_leaves(noise2),
                         jax.tree_util.tree_leaves(gvars["noise"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(orig))


def test_projection_w_plus(gan_and_lpips):
    """W+ mode optimizes per-layer latents (rows may diverge)."""
    from viscoin_tpu.eval.projection import project_image

    gen, gvars, lpips, lparams = gan_and_lpips
    target = np.asarray(gen.apply(gvars, jnp.ones((1, 8)) * 0.5,
                                  noise_mode="const"))[0]
    w, losses, _ = project_image(gen, gvars, lpips, lparams, target,
                                 num_steps=24, w_plus=True, w_avg_samples=64)
    assert w.shape == (NUM_WS, CFG["w_dim"])
    assert not np.array_equal(w[0], w[-1])  # layers moved independently
    assert np.isfinite(losses).all()


def test_cli_project(tmp_path, monkeypatch, gan_and_lpips):
    """CLI e2e: writes proj.png/target.png/projected_w.npz; refuses without
    LPIPS weights."""
    from PIL import Image

    from viscoin_tpu.utils.checkpoints import save_pytree

    gen, gvars, lpips, lparams = gan_and_lpips
    monkeypatch.chdir(tmp_path)
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)).save(
        tmp_path / "target.jpg")
    from main import main

    args = ["project", "--gan", str(tmp_path / "gan-tiny"), "--target",
            str(tmp_path / "target.jpg"), "--steps", "8", "--outdir", "p"]
    result = CliRunner().invoke(main, args)  # no LPIPS weights yet
    assert result.exit_code != 0 and "lpips-vgg" in result.output

    save_pytree(lparams, str(tmp_path / "checkpoints" / "lpips-vgg"))
    result = CliRunner().invoke(main, args)
    assert result.exit_code == 0, result.output
    data = np.load(tmp_path / "p" / "projected_w.npz")
    assert data["w"].shape == (NUM_WS, CFG["w_dim"])
    assert data["losses"].shape == (8,)
    assert Image.open(tmp_path / "p" / "proj.png").size == (32, 32)
    assert Image.open(tmp_path / "p" / "target.png").size == (32, 32)
