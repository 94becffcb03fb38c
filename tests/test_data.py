"""Data pipeline tests: transform parity with torchvision semantics and the
loader contract (fixed uint8 shapes, device preprocessing)."""

import numpy as np
import pytest

import jax.numpy as jnp

from viscoin_tpu.data.datasets import SyntheticDataset
from viscoin_tpu.data.loader import DataLoader, loop_iter
from viscoin_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    denormalize,
    device_preprocess,
    host_test_transform,
    host_train_transform,
    random_resized_crop_params,
)


def test_host_train_transform_shape(rng):
    img = rng.integers(0, 256, (300, 431, 3), dtype=np.uint8)
    out = host_train_transform(img, rng)
    assert out.shape == (256, 256, 3) and out.dtype == np.uint8


def test_random_resized_crop_params_bounds(rng):
    for _ in range(50):
        t, l, h, w = random_resized_crop_params(120, 200, rng)
        assert 0 <= t and t + h <= 120 and 0 <= l and l + w <= 200
        assert 3 / 4 - 0.1 <= w / h <= 4 / 3 + 0.1


def test_host_test_transform_matches_torchvision(rng):
    torch = pytest.importorskip("torch")
    img = rng.integers(0, 256, (300, 431, 3), dtype=np.uint8)
    got = host_test_transform(img)
    assert got.shape == (256, 256, 3)
    # Compare against PIL-based resize + center crop (what torchvision v2
    # does for PIL inputs) — identical code path, so exact equality.
    from PIL import Image

    h, w = img.shape[:2]
    resize_to = 292
    nh, nw = resize_to, int(round(w * resize_to / h))
    ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    top, left = (nh - 256) // 2, (nw - 256) // 2
    ref = ref[top : top + 256, left : left + 256]
    np.testing.assert_array_equal(got, ref)


def test_host_gan_transform_geometry(rng):
    """GAN-side geometry: full-short-side center crop + resize (stylegan2-ada
    dataset_tool semantics) — square inputs are an EXACT resize (no border
    cut), non-square inputs keep the whole short side."""
    from PIL import Image

    from viscoin_tpu.data.transforms import host_gan_transform

    # square: pure Resize((size, size))
    sq = rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
    got = host_gan_transform(sq, size=64)
    ref = np.asarray(Image.fromarray(sq).resize((64, 64), Image.BILINEAR))
    np.testing.assert_array_equal(got, ref)

    # non-square: short side resized to size, center crop — the crop spans
    # the FULL short side (no 256/292 classifier-eval margin)
    img = rng.integers(0, 256, (300, 431, 3), dtype=np.uint8)
    got = host_gan_transform(img, size=64)
    nh, nw = 64, int(round(431 * 64 / 300))
    ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    left = (nw - 64) // 2
    np.testing.assert_array_equal(got, ref[:, left : left + 64])

    # deterministic: no RNG anywhere in the path
    np.testing.assert_array_equal(got, host_gan_transform(img, size=64))


def test_dataset_gan_transform_mode():
    """transform="gan" plumbs through get_datasets and is deterministic
    across epochs (unlike train mode — `train gan` and `fid` feed the
    discriminator/detector a fixed image distribution; mirror and ADA are
    the only GAN-side augmentations, applied inside the step)."""
    from viscoin_tpu.data.utils import get_datasets

    ds, _ = get_datasets("synthetic", "gan", train_only=True)
    assert ds.transform_mode == "gan"
    first, _ = ds[0]
    ds.set_epoch(7)
    again, _ = ds[0]
    np.testing.assert_array_equal(first, again)


def test_device_preprocess_normalization(rng):
    u8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(device_preprocess(jnp.asarray(u8)))
    want = (u8.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_device_preprocess_flip(rng):
    u8 = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    flip = jnp.asarray([True, False])
    out = np.asarray(device_preprocess(jnp.asarray(u8), flip))
    base = np.asarray(device_preprocess(jnp.asarray(u8)))
    np.testing.assert_allclose(out[0], base[0, :, ::-1, :], rtol=1e-6)
    np.testing.assert_allclose(out[1], base[1], rtol=1e-6)


def test_denormalize_roundtrip(rng):
    u8 = rng.integers(0, 256, (1, 4, 4, 3), dtype=np.uint8)
    x = device_preprocess(jnp.asarray(u8))
    back = np.asarray(denormalize(x))
    np.testing.assert_allclose(back, u8.astype(np.float32) / 255.0, rtol=1e-4, atol=1e-5)


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(n=10, n_classes=3, image_size=64)
    img, label = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert label == 0

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_threads=2)
    batches = list(loader)
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (4, 64, 64, 3) and labels.shape == (4,)
    sizes = [b[0].shape[0] for b in batches]
    assert sum(sizes) == 10

    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(dl) == 2 and all(b[0].shape[0] == 4 for b in dl)


def test_loop_iter():
    ds = SyntheticDataset(n=4, n_classes=2, image_size=32)
    loader = DataLoader(ds, batch_size=2, num_threads=0)
    it = loop_iter(loader)
    for _ in range(5):  # cycles past one epoch (2 batches)
        images, labels = next(it)
        assert images.shape[0] == 2


def test_train_augmentation_not_frozen():
    """Unlike the reference's transformed-tensor cache (cub.py:172-176), we
    re-augment every EPOCH (crop rng is a pure function of (seed, epoch,
    index) — thread-safe + resume-exact); cache_transformed=True restores the
    reference's frozen-augmentation behavior."""
    ds = SyntheticDataset(n=2, n_classes=2, image_size=64)
    a = ds[0][0]
    ds.set_epoch(1)
    b = ds[0][0]
    c = ds[0][0]
    assert not np.array_equal(a, b)  # new epoch, new crop
    np.testing.assert_array_equal(b, c)  # same epoch: deterministic

    frozen = SyntheticDataset(n=2, n_classes=2, image_size=64)
    frozen.cache_transformed = True
    a = frozen[0][0]
    frozen.set_epoch(1)
    b = frozen[0][0]
    np.testing.assert_array_equal(a, b)


def test_loader_thread_and_resume_determinism():
    """Batches are identical regardless of thread count, and augmentation
    replays exactly for the same (seed, epoch) — the crop rng is a pure
    function of (seed, epoch, index), never shared mutable state."""
    from viscoin_tpu.data.datasets import SyntheticDataset
    from viscoin_tpu.data.loader import DataLoader

    def batches(num_threads, seed=3):
        ds = SyntheticDataset(n=12, n_classes=4, image_size=32, mode="train",
                              seed=seed)
        loader = DataLoader(ds, batch_size=4, seed=seed,
                            num_threads=num_threads, use_native=False)
        out = []
        for _ in range(2):  # two epochs
            for images, labels in loader:
                out.append((images.copy(), labels.copy()))
        return out

    a = batches(0)
    b = batches(8)
    assert len(a) == len(b)
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

    # a fresh loader fast-forwarded by one epoch replays epoch 2 exactly
    ds = SyntheticDataset(n=12, n_classes=4, image_size=32, mode="train", seed=3)
    loader = DataLoader(ds, batch_size=4, seed=3, num_threads=0, use_native=False)
    loader.skip_batches(3)  # 3 batches per epoch
    replay = [(i.copy(), l.copy()) for i, l in loader]
    for (ia, la), (ib, lb) in zip(a[3:6], replay):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_sharded_loader_partitions_global_batches():
    """DataLoader(shard=(r, w)): the w rank-slices of every global batch
    concatenate to exactly the single-loader batch (same (seed, epoch)
    order), ragged tail dropped; and global_shard_batch == shard_batch of
    the concatenation on a single process."""
    ds = SyntheticDataset(n=18, n_classes=3, image_size=16)
    full = DataLoader(ds, batch_size=8, seed=3, num_threads=0, drop_last=True)
    shards = [DataLoader(ds, batch_size=8, seed=3, num_threads=0, shard=(r, 4))
              for r in range(4)]

    full_batches = list(full)
    shard_batches = [list(s) for s in shards]
    assert len(full_batches) == 2 and all(len(s) == 2 for s in shard_batches)
    for i, (imgs, labels) in enumerate(full_batches):
        cat_imgs = np.concatenate([shard_batches[r][i][0] for r in range(4)])
        cat_labels = np.concatenate([shard_batches[r][i][1] for r in range(4)])
        np.testing.assert_array_equal(cat_imgs, imgs)
        np.testing.assert_array_equal(cat_labels, labels)
        assert all(shard_batches[r][i][0].shape[0] == 2 for r in range(4))

    import pytest

    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=6, shard=(0, 4))

    # single-process global_shard_batch places the same values as shard_batch
    from viscoin_tpu.parallel.mesh import global_shard_batch, make_mesh

    mesh = make_mesh(8)
    imgs, labels = full_batches[0]
    gi, gl = global_shard_batch(mesh, imgs, labels)
    np.testing.assert_array_equal(np.asarray(gi), imgs)
    np.testing.assert_array_equal(np.asarray(gl), labels)
    assert gi.sharding.spec == ("data",)


def test_loader_propagates_producer_exception():
    """A dataset error inside the producer thread must surface to the
    consumer instead of hanging q.get() forever (corrupt-image scenario)."""

    class Corrupt(SyntheticDataset):
        def _load_raw(self, index):
            if index == 3:
                raise OSError("corrupt image")
            return super()._load_raw(index)

    ds = Corrupt(n=8, n_classes=2, image_size=16)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_threads=2)
    with pytest.raises(OSError, match="corrupt image"):
        list(loader)


def test_pad_final_loader_marks_padding():
    ds = SyntheticDataset(n=6, n_classes=4, image_size=16, mode="test")
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_threads=0,
                        pad_final=True)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    imgs, labels = batches[1]
    assert imgs.shape == (4, 16, 16, 3)  # full steady shape
    assert (labels[:2] >= 0).all()
    assert (labels[2:] == -1).all()  # sentinel-marked padding
    # the real tail rows match the unpadded loader's tail
    plain = list(DataLoader(ds, batch_size=4, shuffle=False, num_threads=0))
    np.testing.assert_array_equal(imgs[:2], plain[1][0])
    np.testing.assert_array_equal(labels[:2], plain[1][1])


def test_pad_final_sharded_slices_reassemble():
    ds = SyntheticDataset(n=6, n_classes=4, image_size=16, mode="test")
    full = list(DataLoader(ds, batch_size=4, shuffle=False, num_threads=0,
                           pad_final=True))
    shards = [list(DataLoader(ds, batch_size=4, shuffle=False, num_threads=0,
                              pad_final=True, shard=(r, 2))) for r in (0, 1)]
    assert len(shards[0]) == len(full) == 2  # tail NOT dropped when padded
    for b, (imgs, labels) in enumerate(full):
        np.testing.assert_array_equal(
            np.concatenate([shards[0][b][0], shards[1][b][0]]), imgs)
        np.testing.assert_array_equal(
            np.concatenate([shards[0][b][1], shards[1][b][1]]), labels)


def test_pad_final_drop_last_exclusive():
    ds = SyntheticDataset(n=6, n_classes=4, image_size=16)
    with pytest.raises(ValueError, match="mutually exclusive"):
        DataLoader(ds, batch_size=4, drop_last=True, pad_final=True)


def test_pad_batch_helper_masks_sentinels():
    from viscoin_tpu.data.loader import pad_batch

    imgs = np.zeros((3, 4, 4, 3), np.uint8)
    labels = np.array([2, -1, 1])
    p_imgs, p_labels, valid = pad_batch(4, imgs, labels)
    assert p_imgs.shape == (4, 4, 4, 3)
    np.testing.assert_array_equal(valid, [1, 0, 1, 0])  # sentinel + pad row
    assert (p_labels >= 0).all()  # sentinels clamped to legal indices
    i_only, valid2 = pad_batch(4, imgs)
    assert i_only.shape == (4, 4, 4, 3)
    np.testing.assert_array_equal(valid2, [1, 1, 1, 0])


def test_classifier_trainer_rejects_batch_mismatch():
    from viscoin_tpu.train.classifiers import (
        ClassifierTrainingParams,
        train_classifier,
    )

    ds = SyntheticDataset(n=8, n_classes=4, image_size=16)
    loader = DataLoader(ds, batch_size=4, num_threads=0)
    with pytest.raises(ValueError, match="batch_size"):
        train_classifier(None, None, loader, loader,
                         ClassifierTrainingParams(batch_size=8, epochs=1))
