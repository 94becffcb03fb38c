"""`generate` command (the stylegan2-ada generate.py analogue): per-seed
reproducibility, seed parsing, truncation knob."""

import numpy as np
import pytest
from click.testing import CliRunner

import jax
import jax.numpy as jnp


def _save_tiny_gan(tmp_path):
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = dict(z_dim=8, w_dim=16, img_resolution=32, mapping_layers=2,
               channel_base=256, channel_max=16)
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    return str(tmp_path / "gan-tiny")


def test_parse_seeds():
    from viscoin_tpu.cli.generate import parse_seeds

    assert parse_seeds("0-3,7,10-11") == [0, 1, 2, 3, 7, 10, 11]
    assert parse_seeds("5") == [5]
    for bad in ("", "a-b", "3-1", "1,,x"):
        with pytest.raises(Exception):
            parse_seeds(bad)


def test_cli_generate_seed_reproducible(tmp_path, monkeypatch):
    """Each image is a pure function of its seed: seed 3 rendered inside a
    0-5 batch equals seed 3 rendered alone (upstream per-seed RandomState
    semantics); ragged final batches are padded+sliced; --trunc changes the
    output."""
    monkeypatch.chdir(tmp_path)
    gan = _save_tiny_gan(tmp_path)
    from PIL import Image

    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["generate", "--gan", gan, "--seeds", "0-5",
                                  "--batch-size", "4", "--outdir", "a"])
    assert result.exit_code == 0, result.output
    files = sorted((tmp_path / "a").iterdir())
    assert [f.name for f in files] == [f"seed{i:04d}.png" for i in range(6)]
    assert Image.open(files[0]).size == (32, 32)

    result = runner.invoke(main, ["generate", "--gan", gan, "--seeds", "3",
                                  "--batch-size", "4", "--outdir", "b"])
    assert result.exit_code == 0, result.output
    a3 = np.asarray(Image.open(tmp_path / "a" / "seed0003.png"))
    b3 = np.asarray(Image.open(tmp_path / "b" / "seed0003.png"))
    np.testing.assert_array_equal(a3, b3)

    result = runner.invoke(main, ["generate", "--gan", gan, "--seeds", "3",
                                  "--batch-size", "4", "--outdir", "c",
                                  "--trunc", "0.2"])
    assert result.exit_code == 0, result.output
    c3 = np.asarray(Image.open(tmp_path / "c" / "seed0003.png"))
    assert not np.array_equal(a3, c3)
