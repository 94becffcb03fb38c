"""CLI integration tests via click's CliRunner (reference surface parity:
main.py + viscoin/cli/*)."""

import json

import numpy as np
import pytest
from click.testing import CliRunner


def test_cli_registers_all_reference_commands():
    from main import main

    commands = set(main.commands)
    # the reference's 8 subcommands (reference main.py:38-45)
    assert {"train", "test", "to-pickle", "amplify", "concepts",
            "concept-heatmaps", "logs", "amplify-pca"} <= commands


@pytest.mark.parametrize("cmd,flags", [
    ("train", ["--batch-size", "--epochs", "--learning-rate", "--device",
               "--dataset", "--output-weights", "--checkpoints",
               "--gradient-accumulation-steps", "--latent-type"]),
    ("test", ["--batch-size", "--device", "--dataset", "--checkpoints"]),
    ("amplify", ["--concept-threshold", "--concept-top-k", "--concept-indices",
                 "--image-indices", "--viscoin-pickle-path"]),
    ("amplify-pca", ["--pca", "--image", "--viscoin-pickle-path"]),
    ("concepts", ["--force", "--viscoin-pickle-path", "--batch-size"]),
    ("logs", ["--logs-path"]),
])
def test_cli_flag_surface(cmd, flags):
    """Every reference CLI flag exists (viscoin/cli/utils.py + per-command)."""
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, [cmd, "--help"])
    assert result.exit_code == 0
    for flag in flags:
        assert flag in result.output, f"{cmd} missing {flag}"


def test_cli_test_classifier_synthetic(tmp_path, monkeypatch):
    """`test classifier --dataset synthetic` end-to-end (random weights)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "64")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["test", "classifier", "--dataset", "synthetic",
                                  "--batch-size", "4"])
    assert result.exit_code == 0, result.output
    assert "Accuracy:" in result.output and "Loss:" in result.output


def test_cli_prewarm_synthetic(tmp_path, monkeypatch):
    """`prewarm` AOT-compiles the train step + sampler under the given flags
    (the compile-cache warm-up for `train viscoin`) and reports progress."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    result = CliRunner().invoke(main, [
        "prewarm", "--dataset", "synthetic", "--batch-size", "2",
        "--epochs", "10", "--no-data-parallel"])
    assert result.exit_code == 0, result.output
    assert "train step:" in result.output and "done" in result.output
    # round 5: the in-loop cadence programs (eval step at its i=0 firing,
    # the batched faithfulness probe) are warmed too
    assert "eval step:" in result.output and "probe:" in result.output


def test_cli_logs_roundtrip(tmp_path):
    """`logs` parses the jsonl schema (non-interactive matplotlib)."""
    import matplotlib

    matplotlib.use("Agg")
    log = tmp_path / "viscoin_10.jsonl"
    record = {f"train_{k}": 0.1 for k in
              ["acc_loss", "cr_loss", "of_loss", "ortho_loss", "rec_loss",
               "gan_loss", "inter_loss"]}
    record.update({f"test_{k}": 0.2 for k in
                   ["acc_loss", "cr_loss", "of_loss", "lp_loss", "rec_loss_l1",
                    "rec_loss_l2", "preds_overlap", "correct_preds",
                    "correct_expl_preds"]})
    with open(log, "w") as f:
        f.write(json.dumps(record) + "\n")
        f.write(json.dumps(record) + "\n")

    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["logs", "--logs-path", str(log)])
    assert result.exit_code == 0, result.output


def test_cli_train_gan_synthetic(tmp_path, monkeypatch):
    """`train gan --dataset synthetic`: the in-framework StyleGAN2 trainer is
    reachable from the CLI, logs jsonl, and saves EMA generator variables in
    the orbax layout that `train viscoin` consumes."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "gan", "--dataset", "synthetic",
                                  "--epochs", "2", "--batch-size", "4",
                                  "--no-data-parallel",
                                  "--channel-base", "256", "--channel-max", "16",
                                  "--output-weights", "gan-synth"])
    assert result.exit_code == 0, result.output

    log = tmp_path / "gan_2.jsonl"
    assert log.exists()
    records = [json.loads(line) for line in log.read_text().splitlines()]
    assert records and all(np.isfinite(r["g_loss"]) and np.isfinite(r["d_loss"])
                           for r in records)

    from viscoin_tpu.utils import checkpoints as ckpt

    gvars = ckpt.restore_pytree(str(tmp_path / "gan-synth"))
    assert "params" in gvars and "moving_stats" in gvars
    # restored variables drive the generator (the `train viscoin` handoff)
    import jax.numpy as jnp

    from viscoin_tpu.models.stylegan import Generator

    g = Generator(z_dim=512, w_dim=512, img_resolution=32, channel_base=256,
                  channel_max=16, mapping_layers=2)
    img = g.apply(gvars, jnp.zeros((1, 512)), noise_mode="const")
    assert img.shape == (1, 32, 32, 3) and bool(jnp.all(jnp.isfinite(img)))


def test_cli_train_gan_fid(tmp_path, monkeypatch):
    """`train gan --fid-every`: the upstream trainer's snapshot metric —
    real-side moments accumulate once from the training set, FID of EMA
    samples is logged as `fid` jsonl records on cadence (the detector is
    stubbed with flattened-pixel features; the real Inception detectors have
    their own parity tests)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import viscoin_tpu.cli.train as cli_train

    def fake_loader(path):
        return lambda images: np.asarray(images).reshape(
            images.shape[0], -1)[:, :8]

    monkeypatch.setattr(cli_train, "_load_fid_detector", fake_loader)
    (tmp_path / "fakedet").mkdir()
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "gan", "--dataset", "synthetic",
                                  "--epochs", "3", "--batch-size", "4",
                                  "--no-data-parallel",
                                  "--channel-base", "256", "--channel-max", "16",
                                  "--fid-every", "2", "--fid-samples", "8",
                                  "--fid-detector", "fakedet",
                                  "--output-weights", "gan-synth"])
    assert result.exit_code == 0, result.output
    records = [json.loads(line)
               for line in (tmp_path / "gan_3.jsonl").read_text().splitlines()]
    fids = {r["iteration"]: r["fid"] for r in records if "fid" in r}
    # i=2 satisfies both the cadence (i>0, i%2==0) and last-iteration — ONE
    # record; losses still log separately.
    assert set(fids) == {2}, records
    assert all(np.isfinite(v) for v in fids.values())
    assert any("g_loss" in r for r in records)


def test_cli_train_gan_snapshots(tmp_path, monkeypatch):
    """`train gan --snapshot-every`: fakes_<it>.png grids of 16 EMA samples
    from fixed latents (the upstream trainer's per-tick fakes grid)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "gan", "--dataset", "synthetic",
                                  "--epochs", "3", "--batch-size", "4",
                                  "--no-data-parallel",
                                  "--channel-base", "256", "--channel-max", "16",
                                  "--snapshot-every", "2",
                                  "--output-weights", "gan-synth"])
    assert result.exit_code == 0, result.output
    from PIL import Image

    for it in (0, 2):
        png = tmp_path / f"fakes_{it:06d}.png"
        assert png.exists(), result.output
        img = Image.open(png)
        assert img.size == (4 * 32, 4 * 32) and img.mode == "RGB"


def test_cli_train_gan_init_from(tmp_path, monkeypatch):
    """`train gan --init-from`: transfer-learning warm start from exported
    generator variables (upstream `--resume <pickle>` semantics) — loads,
    trains, refuses combined with --resume, and refuses a config mismatch."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    base = ["train", "gan", "--dataset", "synthetic", "--batch-size", "4",
            "--no-data-parallel", "--channel-base", "256", "--channel-max", "16"]
    result = runner.invoke(main, base + ["--epochs", "1",
                                         "--output-weights", "gan-donor"])
    assert result.exit_code == 0, result.output

    result = runner.invoke(main, base + ["--epochs", "1",
                                         "--init-from", "gan-donor",
                                         "--output-weights", "gan-warm"])
    assert result.exit_code == 0, result.output
    assert "warm start from gan-donor" in result.output

    # --init-from + --resume is contradictory
    result = runner.invoke(main, base + [
        "--epochs", "2", "--init-from", "gan-donor",
        "--resume", "gan-warm.train_state", "--output-weights", "gan-warm"])
    assert result.exit_code != 0
    assert "pick one" in result.output

    # config mismatch refuses loudly instead of training garbage
    result = runner.invoke(main, [
        "train", "gan", "--dataset", "synthetic", "--batch-size", "4",
        "--no-data-parallel", "--channel-base", "128", "--channel-max", "8",
        "--epochs", "1", "--init-from", "gan-donor",
        "--output-weights", "gan-bad"])
    assert result.exit_code != 0
    assert isinstance(result.exception, ValueError)


def test_cli_train_gan_resume(tmp_path, monkeypatch):
    """`train gan --resume`: the saved train state (written next to
    --output-weights) resumes mid-run — the loop starts at the saved step
    and a mismatched batch size refuses (invariant metadata)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    args = ["train", "gan", "--dataset", "synthetic", "--batch-size", "4",
            "--no-data-parallel", "--channel-base", "256", "--channel-max", "16",
            "--output-weights", "gan-synth"]
    result = runner.invoke(main, args + ["--epochs", "2"])
    assert result.exit_code == 0, result.output
    assert (tmp_path / "gan-synth.train_state").is_dir()

    # resume to 3 iterations: exactly one more step runs (jsonl logs it 2)
    result = runner.invoke(main, args + ["--epochs", "3", "--resume",
                                         "gan-synth.train_state"])
    assert result.exit_code == 0, result.output
    records = [json.loads(line)
               for line in (tmp_path / "gan_3.jsonl").read_text().splitlines()]
    assert [r["iteration"] for r in records] == [2]

    # invariant mismatch refuses
    result = runner.invoke(main, [
        "train", "gan", "--dataset", "synthetic", "--batch-size", "8",
        "--no-data-parallel", "--channel-base", "256", "--channel-max", "16",
        "--output-weights", "gan-synth", "--epochs", "4",
        "--resume", "gan-synth.train_state"])
    assert result.exit_code != 0
    assert "resume mismatch" in str(result.exception)


def test_cli_train_model_parallel_validation():
    """--model-parallel flag surface + fast-fail validation (the 2-D step
    itself is shard-invariance-tested in test_spatial.py)."""
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "--help"])
    assert "--model-parallel" in result.output

    # requires data-parallel
    result = runner.invoke(main, [
        "train", "viscoin", "--dataset", "synthetic", "--no-data-parallel",
        "--model-parallel", "2"])
    assert result.exit_code != 0
    assert "requires --data-parallel" in result.output

    # must divide the device count (8-device CPU mesh in tests)
    result = runner.invoke(main, [
        "train", "viscoin", "--dataset", "synthetic", "--model-parallel", "3"])
    assert result.exit_code != 0
    assert "does not divide" in result.output


def test_cli_logs_gan_schema(tmp_path):
    """`logs` plots `train gan` jsonl (capability extension — the reference
    has no GAN-training logs)."""
    import matplotlib

    matplotlib.use("Agg")
    log = tmp_path / "gan_200.jsonl"
    with open(log, "w") as f:
        for i in (0, 100):
            f.write(json.dumps({"iteration": i, "g_loss": 1.0, "d_loss": 1.2,
                                "r1": 0.01, "pl_lengths": 0.5,
                                "pl_mean": 0.1}) + "\n")
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["logs", "--logs-path", str(log)])
    assert result.exit_code == 0, result.output


@pytest.mark.parametrize("record", [
    {"train_loss": 1.0, "train_accuracy": 0.5, "test_loss": 1.1,
     "test_accuracy": 0.4},  # classifier schema
    {"train_loss": 0.2, "test_loss": 0.3, "matching_accuracy": 0.7},  # c2c
])
def test_cli_logs_other_schemas(tmp_path, record):
    """`logs` plots classifier and concept2clip jsonl (the reference's own
    command crashes on both of its non-viscoin schemas)."""
    import matplotlib

    matplotlib.use("Agg")
    log = tmp_path / "log.jsonl"
    log.write_text(json.dumps(record) + "\n" + json.dumps(record) + "\n")
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["logs", "--logs-path", str(log)])
    assert result.exit_code == 0, result.output


def test_cli_logs_gan_schema_fid_first_record(tmp_path):
    """Schema sniff scans ALL records, not records[0]: a resumed `train gan`
    with --fid-every < 100 writes a fid-only record before the first %100
    loss record, which a records[0]-keyed sniff misrouted to the viscoin
    parser (ValueError on its own output)."""
    import matplotlib

    matplotlib.use("Agg")
    log = tmp_path / "gan_20000.jsonl"
    with open(log, "w") as f:
        f.write(json.dumps({"iteration": 10020, "fid": 12.3}) + "\n")
        f.write(json.dumps({"iteration": 10100, "g_loss": 1.0, "d_loss": 1.2,
                            "r1": 0.01, "pl_lengths": 0.5,
                            "pl_mean": 0.1}) + "\n")
    from main import main

    result = CliRunner().invoke(main, ["logs", "--logs-path", str(log)])
    assert result.exit_code == 0, result.output


def test_cli_train_concept2clip_image_size_plumbed(tmp_path, monkeypatch):
    """--image-size reaches _train_concept2clip's dataset construction (it
    was validated by the dispatcher but silently dropped for this one
    subcommand — spaces were computed at the 256 default)."""
    import viscoin_tpu.cli.train as cli_train

    seen = {}
    monkeypatch.setattr(
        cli_train, "_train_concept2clip",
        lambda *a, ds_kwargs=None, **k: seen.update(ds_kwargs=ds_kwargs))
    root = tmp_path / "cars"
    (root / "train" / "a").mkdir(parents=True)
    from main import main

    result = CliRunner().invoke(main, [
        "train", "concept2clip", "--dataset", str(root), "--image-size", "128"])
    assert result.exit_code == 0, result.output
    assert seen["ds_kwargs"] == {"out_size": 128}


def test_cli_train_viscoin_cadence_flags(tmp_path, monkeypatch):
    """--eval-every/--checkpoint-every/--faithfulness-every reach the loop:
    0 disables (no eval records, no checkpoints), N=1 checkpoints."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    import os

    from main import main

    r = CliRunner().invoke(main, [
        "train", "viscoin", "--dataset", "synthetic", "--epochs", "2",
        "--batch-size", "2", "--no-data-parallel", "--eval-every", "0",
        "--checkpoint-every", "0", "--faithfulness-every", "0"])
    assert r.exit_code == 0, r.output
    assert not os.path.isdir("train_state")
    log = [line for line in open("viscoin_2.jsonl")] \
        if os.path.exists("viscoin_2.jsonl") else []
    assert log == []  # eval disabled -> no records

    r = CliRunner().invoke(main, [
        "train", "viscoin", "--dataset", "synthetic", "--epochs", "2",
        "--batch-size", "2", "--no-data-parallel", "--eval-every", "0",
        "--checkpoint-every", "1", "--faithfulness-every", "0"])
    assert r.exit_code == 0, r.output
    assert os.path.isdir("train_state")


def test_cli_prewarm_gan(tmp_path, monkeypatch):
    """`prewarm gan`: AOT-compiles the GAN step under the exact train-gan
    flags (shared build_gan_modules construction)."""
    monkeypatch.setenv("VISCOIN_SYNTH_N", "8")
    monkeypatch.setenv("VISCOIN_SYNTH_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    result = CliRunner().invoke(main, [
        "prewarm", "gan", "--dataset", "synthetic", "--batch-size", "4",
        "--epochs", "10", "--no-data-parallel",
        "--channel-base", "256", "--channel-max", "16"])
    assert result.exit_code == 0, result.output
    assert "gan step:" in result.output and "done" in result.output
