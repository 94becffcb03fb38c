"""dataset-tool packing + StyleGANZipDataset reading (the stylegan2-ada
dataset_tool.py analogue — reference ecosystem anchor:
viscoin/datasets/funnybirds.py:116-144 exports this archive convention for
the upstream trainer; the reference's pretrained CUB GAN was trained from
one, reference README.md:209-241)."""

import json
import os
import zipfile

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from viscoin_tpu.data.stylegan_zip import StyleGANZipDataset, pack_stylegan_zip
from viscoin_tpu.data.transforms import host_gan_transform
from viscoin_tpu.data.utils import dataset_key, get_datasets


def _write_img(path, h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img, "RGB").save(path)
    return img


@pytest.fixture
def class_tree(tmp_path):
    """Folder-per-class tree with mixed sizes (center-crop exercises both
    orientations)."""
    root = tmp_path / "src"
    imgs = {
        "birds/a.png": _write_img(str(root / "birds/a.png"), 40, 64, 0),
        "birds/b.png": _write_img(str(root / "birds/b.png"), 64, 40, 1),
        "cats/c.png": _write_img(str(root / "cats/c.png"), 32, 32, 2),
    }
    return str(root), imgs


def test_pack_layout_labels_and_geometry(class_tree, tmp_path):
    root, imgs = class_tree
    dest = str(tmp_path / "out.zip")
    count, res = pack_stylegan_zip(root, dest, resolution=32)
    assert (count, res) == (3, 32)
    with zipfile.ZipFile(dest) as zf:
        names = sorted(n for n in zf.namelist() if n.endswith(".png"))
        # upstream layout: {idx//1000:05d}/img{idx:08d}.png, sorted source order
        assert names == [f"00000/img{i:08d}.png" for i in range(3)]
        labels = json.loads(zf.read("dataset.json"))["labels"]
        # birds/a=0, birds/b=0, cats/c=1 (sorted class names)
        assert labels == [["00000/img00000000.png", 0],
                          ["00000/img00000001.png", 0],
                          ["00000/img00000002.png", 1]]
        # pixel content == the framework's gan-transform geometry
        packed = np.asarray(Image.open(zf.open(names[0])).convert("RGB"))
        np.testing.assert_array_equal(
            packed, host_gan_transform(imgs["birds/a.png"], size=32))


def test_flat_tree_is_unlabeled(tmp_path):
    root = tmp_path / "flat"
    _write_img(str(root / "x.png"), 16, 16, 0)
    _write_img(str(root / "y.png"), 16, 16, 1)
    dest = str(tmp_path / "flat.zip")
    count, res = pack_stylegan_zip(str(root), dest)
    assert (count, res) == (2, 16)
    with zipfile.ZipFile(dest) as zf:
        assert json.loads(zf.read("dataset.json"))["labels"] is None
    ds = StyleGANZipDataset(dest)
    assert ds.labels == [0, 0] and ds.N_CLASSES == 1


def test_zip_roundtrip_dataset(class_tree, tmp_path):
    root, imgs = class_tree
    dest = str(tmp_path / "rt.zip")
    pack_stylegan_zip(root, dest, resolution=32)
    ds = StyleGANZipDataset(dest, transform="gan")
    assert len(ds) == 3
    assert ds.out_size == 32 and ds.N_CLASSES == 2
    assert [ds._label(i) for i in range(3)] == [0, 0, 1]
    # images were packed at 32² so the gan transform is identity: raw pixels
    # out of the archive come back exactly
    img, label = ds[2]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(
        img, host_gan_transform(imgs["cats/c.png"], size=32))
    assert label == 1


def test_repack_existing_zip_keeps_labels(class_tree, tmp_path):
    root, _ = class_tree
    first = str(tmp_path / "a.zip")
    second = str(tmp_path / "b.zip")
    pack_stylegan_zip(root, first, resolution=32)
    count, res = pack_stylegan_zip(first, second, resolution=16)
    assert (count, res) == (3, 16)
    ds = StyleGANZipDataset(second)
    assert ds.out_size == 16
    assert [ds._label(i) for i in range(3)] == [0, 0, 1]


def test_partial_labels_are_a_corrupted_archive(class_tree, tmp_path):
    """dataset.json that covers only part of the archive: the dataset
    refuses (upstream's reader raises KeyError there — silent zero-label
    fallback would quietly train a labeled archive as unlabeled), and a
    re-pack of such an archive warns + drops the labels."""
    root, _ = class_tree
    dest = str(tmp_path / "part.zip")
    pack_stylegan_zip(root, dest, resolution=32)
    with zipfile.ZipFile(dest) as zf:
        recs = json.loads(zf.read("dataset.json"))["labels"]
        members = {n: zf.read(n) for n in zf.namelist() if n != "dataset.json"}
    with zipfile.ZipFile(dest, "w") as zf:
        for n, data in members.items():
            zf.writestr(n, data)
        zf.writestr("dataset.json", json.dumps({"labels": recs[:-1]}))

    with pytest.raises(ValueError, match="corrupted labeled archive"):
        StyleGANZipDataset(dest)

    with pytest.warns(UserWarning, match="only part"):
        pack_stylegan_zip(dest, str(tmp_path / "repacked.zip"), resolution=32)
    ds = StyleGANZipDataset(str(tmp_path / "repacked.zip"))
    assert ds.labels == [0, 0, 0] and ds.N_CLASSES == 1


def test_get_datasets_zip_dispatch(class_tree, tmp_path):
    root, _ = class_tree
    dest = str(tmp_path / "ds.zip")
    pack_stylegan_zip(root, dest, resolution=32)
    train, test = get_datasets(dest, "gan", train_only=True)
    assert isinstance(train, StyleGANZipDataset) and test is None
    assert train.out_size == 32
    # out_size kwarg re-decodes at another resolution (fid/--image-size path)
    train16, _ = get_datasets(dest, "gan", train_only=True, out_size=16)
    assert train16.out_size == 16 and train16[0][0].shape == (16, 16, 3)
    with pytest.raises(ValueError, match="train-only"):
        get_datasets(dest)
    assert dataset_key(dest) == "ds"


def test_pack_refusals(class_tree, tmp_path):
    root, _ = class_tree
    # mixed sizes without a resolution
    with pytest.raises(ValueError, match="resolution"):
        pack_stylegan_zip(root, str(tmp_path / "x.zip"))
    # transform='none' refuses non-matching images
    with pytest.raises(ValueError, match="center-crop"):
        pack_stylegan_zip(root, str(tmp_path / "y.zip"), resolution=32,
                          transform="none")
    with pytest.raises(ValueError, match="unknown source"):
        pack_stylegan_zip(str(tmp_path / "missing"), str(tmp_path / "z.zip"))
    with pytest.raises(ValueError, match="no images"):
        pack_stylegan_zip(root, str(tmp_path / "w.zip"), resolution=32,
                          max_images=0)


def test_max_images_truncates(class_tree, tmp_path):
    root, _ = class_tree
    dest = str(tmp_path / "trunc.zip")
    count, _ = pack_stylegan_zip(root, dest, resolution=32, max_images=2)
    assert count == 2
    ds = StyleGANZipDataset(dest)
    assert len(ds) == 2 and [ds._label(i) for i in range(2)] == [0, 0]


def test_cli_dataset_tool_e2e(class_tree, tmp_path):
    import main as main_mod

    root, _ = class_tree
    dest = str(tmp_path / "cli.zip")
    r = CliRunner().invoke(main_mod.main, [
        "dataset-tool", "--source", root, "--dest", dest,
        "--resolution", "32"])
    assert r.exit_code == 0, r.output
    assert "packed 3 images at 32x32" in r.output
    assert zipfile.is_zipfile(dest)
    # non-power-of-two warning
    r = CliRunner().invoke(main_mod.main, [
        "dataset-tool", "--source", root, "--dest",
        str(tmp_path / "odd.zip"), "--resolution", "24"])
    assert r.exit_code == 0 and "power of two" in r.output
    # refusal surfaces as a usage error, not a traceback
    r = CliRunner().invoke(main_mod.main, [
        "dataset-tool", "--source", root, "--dest",
        str(tmp_path / "bad.zip")])
    assert r.exit_code != 0 and "resolution" in r.output


def test_train_gan_on_packed_zip(tmp_path, monkeypatch):
    """The round trip the upstream ecosystem runs: pack a folder with
    dataset-tool, then train the GAN directly on the archive."""
    root = tmp_path / "imgs"
    for i in range(8):
        _write_img(str(root / f"cls/{i}.png"), 20, 24, i)
    dest = str(tmp_path / "train.zip")
    pack_stylegan_zip(str(root), dest, resolution=16)

    monkeypatch.chdir(tmp_path)
    import main as main_mod

    r = CliRunner().invoke(main_mod.main, [
        "train", "gan", "--dataset", dest, "--epochs", "2",
        "--batch-size", "4", "--no-data-parallel",
        "--channel-base", "256", "--channel-max", "16",
        "--output-weights", "gan-zip"])
    assert r.exit_code == 0, r.output
    log = tmp_path / "gan_2.jsonl"
    assert log.exists()
    records = [json.loads(line) for line in log.read_text().splitlines()
               if line.strip()]
    assert records and all(np.isfinite(rec["g_loss"]) and
                           np.isfinite(rec["d_loss"]) for rec in records)
    assert (tmp_path / "gan-zip").exists()
