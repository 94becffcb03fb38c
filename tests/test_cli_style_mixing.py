"""`style-mixing` command (the stylegan2-ada style_mixing.py analogue):
mixing semantics (all-layer mask == column image, self-mix == pure image),
grid geometry, out-of-range style refusal."""

import numpy as np
from click.testing import CliRunner

import jax
import jax.numpy as jnp

from viscoin_tpu.models.stylegan import num_ws_for_resolution

RES = 32
NUM_WS = num_ws_for_resolution(RES)


def _save_tiny_gan(tmp_path):
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = dict(z_dim=8, w_dim=16, img_resolution=RES, mapping_layers=2,
               channel_base=256, channel_max=16)
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    return str(tmp_path / "gan-tiny")


def test_cli_style_mixing(tmp_path, monkeypatch):
    from PIL import Image

    from main import main

    monkeypatch.chdir(tmp_path)
    gan = _save_tiny_gan(tmp_path)
    runner = CliRunner()
    result = runner.invoke(main, [
        "style-mixing", "--gan", gan, "--rows", "0-1", "--cols", "5,7",
        "--col-styles", "0-2", "--outdir", "m", "--batch-size", "4"])
    assert result.exit_code == 0, result.output

    # every cell + pure row/col self-pairs exist
    names = {f.name for f in (tmp_path / "m").iterdir()}
    expect = {f"{r}-{c}.png" for r in (0, 1) for c in (5, 7)}
    expect |= {"0-0.png", "1-1.png", "5-5.png", "7-7.png", "grid.png"}
    assert names == expect

    # grid geometry: (cols+1) x (rows+1) cells, black top-left corner,
    # top row / left column are the pure images
    grid = np.asarray(Image.open(tmp_path / "m" / "grid.png"))
    assert grid.shape == ((2 + 1) * RES, (2 + 1) * RES, 3)
    assert (grid[:RES, :RES] == 0).all()
    pure5 = np.asarray(Image.open(tmp_path / "m" / "5-5.png"))
    np.testing.assert_array_equal(grid[:RES, RES : 2 * RES], pure5)
    pure1 = np.asarray(Image.open(tmp_path / "m" / "1-1.png"))
    np.testing.assert_array_equal(grid[2 * RES :, :RES], pure1)
    mixed = np.asarray(Image.open(tmp_path / "m" / "1-7.png"))
    np.testing.assert_array_equal(grid[2 * RES :, 2 * RES :], mixed)

    # a partial mask produces a genuine mix (differs from both parents)
    pure7 = np.asarray(Image.open(tmp_path / "m" / "7-7.png"))
    assert not np.array_equal(mixed, pure1)
    assert not np.array_equal(mixed, pure7)


def test_cli_style_mixing_full_mask_equals_column(tmp_path, monkeypatch):
    """--col-styles covering ALL layers: the mixed cell IS the column seed's
    image (the mask semantics, pixel-exact through the shared const-noise
    synthesis)."""
    from PIL import Image

    from main import main

    monkeypatch.chdir(tmp_path)
    gan = _save_tiny_gan(tmp_path)
    result = CliRunner().invoke(main, [
        "style-mixing", "--gan", gan, "--rows", "0", "--cols", "5",
        "--col-styles", f"0-{NUM_WS - 1}", "--outdir", "m",
        "--batch-size", "4"])
    assert result.exit_code == 0, result.output
    mixed = np.asarray(Image.open(tmp_path / "m" / "0-5.png"))
    pure = np.asarray(Image.open(tmp_path / "m" / "5-5.png"))
    np.testing.assert_array_equal(mixed, pure)


def test_cli_style_mixing_refuses_bad_styles(tmp_path, monkeypatch):
    from main import main

    monkeypatch.chdir(tmp_path)
    gan = _save_tiny_gan(tmp_path)
    result = CliRunner().invoke(main, [
        "style-mixing", "--gan", gan, "--col-styles", f"{NUM_WS}",
        "--outdir", "m"])
    assert result.exit_code != 0
    assert "out of range" in result.output
