"""Generic image-folder datasets: ``--dataset <path>`` loads any
``{root}/{train|test}/{class}/{image}`` layout (new capability — the
reference README documents CelebA-HQ / Stanford-Cars classifier recipes,
README.md:199-203, but its registry only knows cub/funnybirds)."""

import json

import numpy as np
import pytest


def _make_tree(root, n_train=4, n_test=2, size=40, classes=("cat", "dog")):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("test", n_test)):
        for c in classes:
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(
                    rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                ).save(d / f"img{i}.png")
            # non-image clutter must be ignored
            (d / "notes.txt").write_text("not an image")


def test_imagefolder_dataset_basics(tmp_path):
    from viscoin_tpu.data.datasets import ImageFolderDataset

    _make_tree(tmp_path)
    train = ImageFolderDataset(mode="train", root=str(tmp_path), out_size=32)
    test = ImageFolderDataset(mode="test", root=str(tmp_path), out_size=32)

    assert len(train) == 8 and len(test) == 4
    assert train.class_names == ["cat", "dog"] and train.N_CLASSES == 2
    assert sorted(set(train.labels)) == [0, 1]

    img, label = train[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert label == 0  # sorted class dirs: cat first

    # test split: deterministic center-crop transform
    a, _ = test[1]
    b, _ = test[1]
    np.testing.assert_array_equal(a, b)


def test_imagefolder_label_space_is_split_union(tmp_path):
    """A class present only in one split still gets a stable index, so train
    and test label spaces agree."""
    from PIL import Image

    from viscoin_tpu.data.datasets import ImageFolderDataset

    _make_tree(tmp_path)
    extra = tmp_path / "test" / "zebra"
    extra.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(extra / "img0.png")

    train = ImageFolderDataset(mode="train", root=str(tmp_path), out_size=32)
    test = ImageFolderDataset(mode="test", root=str(tmp_path), out_size=32)
    assert train.N_CLASSES == test.N_CLASSES == 3
    assert train.class_names == ["cat", "dog", "zebra"]
    assert test.labels.count(2) == 1  # the zebra image
    assert 2 not in train.labels


def test_imagefolder_refuses_bad_roots(tmp_path):
    from viscoin_tpu.data.datasets import ImageFolderDataset

    with pytest.raises(ValueError, match="requires root"):
        ImageFolderDataset(mode="train")
    with pytest.raises(FileNotFoundError, match="not found"):
        ImageFolderDataset(mode="train", root=str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    (empty / "train" / "a").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="no images"):
        ImageFolderDataset(mode="train", root=str(empty))


def test_registry_accepts_paths(tmp_path):
    from viscoin_tpu.data.datasets import ImageFolderDataset
    from viscoin_tpu.data.utils import (
        dataset_key,
        default_checkpoints,
        get_datasets,
    )

    _make_tree(tmp_path)
    train, test = get_datasets(str(tmp_path), out_size=32)
    assert isinstance(train, ImageFolderDataset) and train.mode == "train"
    assert test.mode == "test" and train.N_CLASSES == 2

    with pytest.raises(ValueError, match="unknown dataset"):
        get_datasets("not-a-dataset-or-path")

    # checkpoint conventions key path datasets by basename
    assert dataset_key("cub") == "cub"
    assert dataset_key("/data/CelebA-HQ/") == "CelebA-HQ"
    row = default_checkpoints("/data/CelebA-HQ")
    assert row["classifier"] == "checkpoints/CelebA-HQ/classifier-CelebA-HQ"
    assert row["viscoin"] == "checkpoints/CelebA-HQ/viscoin-CelebA-HQ"
    # registry names keep the exact reference conventions
    assert default_checkpoints("cub")["gan"] == "checkpoints/cub/gan-cub"


def test_cli_train_gan_imagefolder(tmp_path, monkeypatch):
    """`train gan --dataset <path>`: the full CLI path runs on an
    image-folder dataset end to end."""
    from click.testing import CliRunner

    data = tmp_path / "MyCars"
    _make_tree(data, n_train=4, size=32)
    monkeypatch.setenv("VISCOIN_IMAGEFOLDER_SIZE", "32")
    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "gan", "--dataset", str(data),
                                  "--epochs", "2", "--batch-size", "4",
                                  "--no-data-parallel",
                                  "--channel-base", "256", "--channel-max", "16",
                                  "--output-weights", "gan-cars"])
    assert result.exit_code == 0, result.output
    records = [json.loads(line)
               for line in (tmp_path / "gan_2.jsonl").read_text().splitlines()]
    assert records and np.isfinite(records[0]["g_loss"])


def test_cli_dataset_param_rejects_unknown(tmp_path, monkeypatch):
    from click.testing import CliRunner

    monkeypatch.chdir(tmp_path)
    from main import main

    runner = CliRunner()
    result = runner.invoke(main, ["train", "gan", "--dataset", "imagenet-21k"])
    assert result.exit_code != 0
    assert "neither a known dataset" in result.output


def test_cli_train_gan_train_only_root_and_image_size(tmp_path, monkeypatch):
    """A GAN-only dataset root WITHOUT a test/ split (the typical CelebA-HQ
    layout) trains fine — `train gan` never evaluates, so get_datasets
    builds the train split only — and --image-size sets the decode/train
    resolution from the CLI (no env var needed)."""
    from click.testing import CliRunner

    data = tmp_path / "celeba_like"
    _make_tree(data, n_train=4, n_test=0, size=48)
    import shutil

    shutil.rmtree(data / "test")  # train-only root
    monkeypatch.chdir(tmp_path)
    from main import main

    result = CliRunner().invoke(main, [
        "train", "gan", "--dataset", str(data), "--image-size", "32",
        "--epochs", "2", "--batch-size", "4", "--no-data-parallel",
        "--channel-base", "256", "--channel-max", "16",
        "--output-weights", "gan-celeba"])
    assert result.exit_code == 0, result.output
    records = [json.loads(line)
               for line in (tmp_path / "gan_2.jsonl").read_text().splitlines()]
    assert records and np.isfinite(records[0]["g_loss"])


def test_cli_image_size_refused_for_registry_datasets(tmp_path, monkeypatch):
    from click.testing import CliRunner

    monkeypatch.chdir(tmp_path)
    from main import main

    result = CliRunner().invoke(main, [
        "train", "classifier", "--dataset", "synthetic", "--image-size", "128"])
    assert result.exit_code != 0
    assert "image-size" in result.output


def test_get_datasets_train_only(tmp_path):
    from viscoin_tpu.data.utils import get_datasets

    data = tmp_path / "root"
    _make_tree(data, n_train=2, n_test=0)
    import shutil

    shutil.rmtree(data / "test")
    train, test = get_datasets(str(data), train_only=True, out_size=32)
    assert test is None and len(train) == 4
    with pytest.raises(FileNotFoundError):
        get_datasets(str(data), out_size=32)  # test split required by default
