"""Offline `fid` command (the stylegan2-ada calc_metrics.py analogue) +
generator config inference from a checkpoint."""

import json

import numpy as np
from click.testing import CliRunner

import jax
import jax.numpy as jnp


def _tiny_generator_cfg():
    return dict(z_dim=8, w_dim=16, img_resolution=32, mapping_layers=2,
                channel_base=256, channel_max=16)


def test_generator_config_inference_roundtrip():
    from viscoin_tpu.models.stylegan import (
        Generator,
        generator_config_from_params,
    )

    cfg = _tiny_generator_cfg()
    generator = Generator(**cfg)
    gvars = generator.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, cfg["z_dim"])), noise_mode="const")
    got = generator_config_from_params(gvars["params"])
    assert got == {**cfg, "img_channels": 3}

    # non-RGB checkpoints rebuild with their true channel count (a grayscale
    # port must not silently come back as a 3-channel Generator)
    gray = Generator(**cfg, img_channels=1)
    gray_vars = gray.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, cfg["z_dim"])), noise_mode="const")
    assert generator_config_from_params(
        gray_vars["params"])["img_channels"] == 1

    # the reference 256² config's widths follow the schedule too
    from viscoin_tpu.models.stylegan import SynthesisNetwork

    assert SynthesisNetwork(channel_base=16384).channels(256) == 64


def test_cli_fid_offline(tmp_path, monkeypatch):
    """`fid --gan <export> --dataset synthetic`: architecture inferred from
    the checkpoint, real side from one deterministic training-set pass,
    fake side from fresh z — one JSON line out (detector stubbed; the real
    detectors have their own parity tests)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    generator = Generator(**cfg)
    gvars = generator.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, cfg["z_dim"])), noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))

    def fake_loader(path):
        return lambda images: np.asarray(images).reshape(
            images.shape[0], -1)[:, :8]

    monkeypatch.setattr(cli_train, "_load_fid_detector", fake_loader)
    (tmp_path / "fakedet").mkdir()
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "8", "--batch-size", "4", "--fid-detector", "fakedet"])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert np.isfinite(out["fid"]) and out["fid"] > 0
    assert out["real_items"] >= 8


def test_cli_fid_resolution_mismatch_refused(tmp_path, monkeypatch):
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "64")  # != generator's 32²
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    monkeypatch.setattr(cli_train, "_load_fid_detector",
                        lambda path: (lambda images: np.zeros((4, 8))))
    (tmp_path / "fakedet").mkdir()
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "8", "--batch-size", "4", "--fid-detector", "fakedet"])
    assert result.exit_code != 0
    assert "resolution" in result.output


def test_cli_fid_dataset_smaller_than_batch_refused(tmp_path, monkeypatch):
    """A dataset with fewer images than --batch-size can never form a full
    real-side batch — refused with a pointer instead of a NoneType crash in
    the moment accumulator."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "2")  # < batch-size 4
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    monkeypatch.setattr(cli_train, "_load_fid_detector",
                        lambda path: (lambda images: np.zeros((4, 8))))
    (tmp_path / "fakedet").mkdir()
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "8", "--batch-size", "4", "--fid-detector", "fakedet"])
    assert result.exit_code != 0
    assert "--batch-size" in result.output


def test_cli_fid_zero_samples_refused(tmp_path, monkeypatch):
    """--samples 0 is a flag error, not a (misleading) dataset-size one."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    monkeypatch.setattr(cli_train, "_load_fid_detector",
                        lambda path: (lambda images: np.zeros((4, 8))))
    (tmp_path / "fakedet").mkdir()
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "0", "--batch-size", "4", "--fid-detector", "fakedet"])
    assert result.exit_code != 0
    assert "--samples" in result.output


def test_cli_fid_kid_metric(tmp_path, monkeypatch):
    """--metric kid (repeatable with fid): both metrics computed over the
    SAME detector features; fid-only output omits the kid key."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))

    def fake_loader(path):
        return lambda images: np.asarray(images).reshape(
            images.shape[0], -1)[:, :8]

    monkeypatch.setattr(cli_train, "_load_fid_detector", fake_loader)
    (tmp_path / "fakedet").mkdir()
    from main import main

    args = ["fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset",
            "synthetic", "--samples", "8", "--batch-size", "4",
            "--fid-detector", "fakedet"]
    result = CliRunner().invoke(main, args + ["--metric", "fid",
                                              "--metric", "kid"])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert np.isfinite(out["fid"]) and np.isfinite(out["kid"])

    result = CliRunner().invoke(main, args)  # default: fid only
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert "kid" not in out and np.isfinite(out["fid"])


def test_cli_fid_ppl_metric(tmp_path, monkeypatch):
    """--metric ppl: needs only the generator + LPIPS weights (no dataset
    pass, no FID detector); refused with a pointer when LPIPS weights are
    absent."""
    monkeypatch.chdir(tmp_path)
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    from main import main

    args = ["fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset",
            "synthetic", "--samples", "8", "--batch-size", "4",
            "--metric", "ppl"]
    result = CliRunner().invoke(main, args)  # no LPIPS weights yet
    assert result.exit_code != 0
    assert "lpips-vgg" in result.output

    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, 32, 32, 3)))["params"]
    save_pytree(lparams, str(tmp_path / "checkpoints" / "lpips-vgg"))
    result = CliRunner().invoke(main, args)
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert np.isfinite(out["ppl"]) and "fid" not in out


def test_cli_fid_pr_metric(tmp_path, monkeypatch):
    """--metric pr: precision/recall over the same detector features."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))

    def fake_loader(path):
        return lambda images: np.asarray(images).reshape(
            images.shape[0], -1)[:, :8]

    monkeypatch.setattr(cli_train, "_load_fid_detector", fake_loader)
    (tmp_path / "fakedet").mkdir()
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "8", "--batch-size", "4", "--fid-detector", "fakedet",
        "--metric", "pr"])
    assert result.exit_code == 0, result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert 0.0 <= out["precision"] <= 1.0 and 0.0 <= out["recall"] <= 1.0
    assert "fid" not in out


def _save_fake_vgg16_pt(path):
    """A TorchScript stand-in for the NVlabs vgg16.pt: same call signature
    (x NCHW in [0,255]; resize_images / return_lpips kwargs), returns a
    per-image embedding whose squared-L2 difference is the 'perceptual'
    distance."""
    import torch

    class FakePerceptual(torch.nn.Module):
        def forward(self, x, resize_images: bool = True,
                    return_lpips: bool = False):
            v1 = x.mean(dim=[2, 3])
            v2 = x.amax(dim=[2, 3])
            return torch.cat([v1, v2], dim=1)

    torch.jit.script(FakePerceptual()).save(path)


def test_ppl_torchscript_matches_numpy_oracle(tmp_path):
    """compute_ppl_torchscript == a from-scratch numpy pipeline over the
    SAME pair images: upstream (img+1)*255/2 scaling, the module's features
    (mean/amax over HW per channel), squared-L2 / eps², [p1,p99] mean."""
    from viscoin_tpu.eval.ppl import (
        compute_ppl_torchscript,
        make_ppl_pair_fn,
        ppl_from_distances,
    )
    from viscoin_tpu.models.stylegan import Generator

    cfg = _tiny_generator_cfg()
    generator = Generator(**cfg)
    gvars = generator.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, cfg["z_dim"])), noise_mode="const")
    ts = str(tmp_path / "vgg16.pt")
    _save_fake_vgg16_pt(ts)

    eps, bs, n = 1e-4, 4, 8
    got = compute_ppl_torchscript(generator, gvars, ts, n, bs, seed=3,
                                  epsilon=eps)

    pair_fn = make_ppl_pair_fn(generator, bs, eps)
    dists = []
    for j in range(n // bs):
        img = np.asarray(pair_fn(gvars, jax.random.fold_in(
            jax.random.PRNGKey(3), j)), np.float32)
        x = np.transpose(img, (0, 3, 1, 2)).astype(np.float32)
        x = (x + 1.0) * (255.0 / 2.0)
        feats = np.concatenate([x.mean(axis=(2, 3)), x.max(axis=(2, 3))],
                               axis=1)
        d = ((feats[:bs] - feats[bs:]) ** 2).sum(axis=1) / (eps * eps)
        dists.append(d.astype(np.float64))
    want = ppl_from_distances(np.concatenate(dists))
    # torch reduces in float32, the oracle in float64 — order-of-summation
    # differences on the huge d/eps^2 values bound the agreement at ~1e-4
    np.testing.assert_allclose(got, want, rtol=1e-3)

    # deterministic in seed; a different seed measures different segments
    again = compute_ppl_torchscript(generator, gvars, ts, n, bs, seed=3,
                                    epsilon=eps)
    other = compute_ppl_torchscript(generator, gvars, ts, n, bs, seed=4,
                                    epsilon=eps)
    assert got == again and got != other


def test_cli_fid_ppl_torchscript_detector(tmp_path, monkeypatch):
    """--metric ppl --lpips-detector vgg16.pt: the upstream-comparable
    route — runs without any ported LPIPS checkpoint."""
    monkeypatch.chdir(tmp_path)
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils.checkpoints import save_pytree

    cfg = _tiny_generator_cfg()
    gvars = Generator(**cfg).init({"params": jax.random.PRNGKey(1)},
                                  jnp.zeros((1, cfg["z_dim"])),
                                  noise_mode="const")
    save_pytree(gvars, str(tmp_path / "gan-tiny"))
    ts = str(tmp_path / "vgg16.pt")
    _save_fake_vgg16_pt(ts)
    from main import main

    result = CliRunner().invoke(main, [
        "fid", "--gan", str(tmp_path / "gan-tiny"), "--dataset", "synthetic",
        "--samples", "8", "--batch-size", "4", "--metric", "ppl",
        "--lpips-detector", ts])
    assert result.exit_code == 0, result.output
    assert "TorchScript perceptual net" in result.output
    out = json.loads(result.output.strip().splitlines()[-1])
    assert np.isfinite(out["ppl"]) and "fid" not in out
