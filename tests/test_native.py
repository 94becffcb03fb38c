"""Tests for the native C++ batch transform (build, correctness vs PIL,
loader integration, throughput sanity)."""

import time

import numpy as np
import pytest

from viscoin_tpu import native
from viscoin_tpu.data.datasets import SyntheticDataset
from viscoin_tpu.data.loader import DataLoader

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ toolchain unavailable")


def test_native_resize_matches_pil(rng):
    from PIL import Image

    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    boxes = np.asarray([[10, 20, 150, 250]], np.int32)
    got = native.transform_batch([img], boxes, 64)[0]

    crop = img[10:160, 20:270]
    want = np.asarray(Image.fromarray(crop).resize((64, 64), Image.BILINEAR))
    # PIL uses a slightly different filter footprint; allow small deviation.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.mean(diff) < 3.0
    assert np.percentile(diff, 99) <= 12


def test_native_identity_crop(rng):
    """Crop == full image, resize to same size → identity."""
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    boxes = np.asarray([[0, 0, 64, 64]], np.int32)
    out = native.transform_batch([img], boxes, 64)[0]
    np.testing.assert_array_equal(out, img)


def test_native_batch_multithreaded(rng):
    imgs = [rng.integers(0, 256, (100 + i, 120 + i, 3), dtype=np.uint8)
            for i in range(16)]
    boxes = native.crop_boxes([im.shape[:2] for im in imgs], "test", 32, rng)
    out = native.transform_batch(imgs, boxes, 32, n_threads=4)
    assert out.shape == (16, 32, 32, 3)
    out1 = native.transform_batch(imgs, boxes, 32, n_threads=1)
    np.testing.assert_array_equal(out, out1)


def test_crop_boxes_modes(rng):
    boxes_test = native.crop_boxes([(300, 400)], "test", 256, rng)
    t, l, ch, cw = boxes_test[0]
    # effective fraction is size/int(size/0.875) = 256/292 — matching the
    # PIL Resize(292)+CenterCrop(256) geometry exactly, not the nominal 7/8
    assert ch == cw == int(round(300 * 256 / 292))
    assert t == (300 - ch) // 2 and l == (400 - cw) // 2

    for _ in range(20):
        t, l, ch, cw = native.crop_boxes([(120, 200)], "train", 64, rng)[0]
        assert 0 <= t and t + ch <= 120 and 0 <= l and l + cw <= 200

    # gan: the FULL short side, centered (stylegan2-ada dataset_tool
    # center-crop geometry — no classifier-eval 256/292 margin)
    t, l, ch, cw = native.crop_boxes([(300, 400)], "gan", 256, rng)[0]
    assert ch == cw == 300 and t == 0 and l == 50
    t, l, ch, cw = native.crop_boxes([(256, 256)], "gan", 256, rng)[0]
    assert (t, l, ch, cw) == (0, 0, 256, 256)  # square input: exact resize


def test_loader_native_path(rng):
    ds = SyntheticDataset(n=12, n_classes=3, image_size=64, mode="test")
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_threads=2,
                        use_native=True)
    assert loader.use_native
    batches = list(loader)
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (4, 64, 64, 3) and images.dtype == np.uint8
    assert labels.tolist() == [0, 1, 2, 0]


def test_native_is_faster_than_pil(rng):
    """Throughput sanity: native batch transform beats per-image PIL."""
    imgs = [rng.integers(0, 256, (500, 600, 3), dtype=np.uint8) for _ in range(32)]
    boxes = native.crop_boxes([im.shape[:2] for im in imgs], "test", 256, rng)

    t0 = time.perf_counter()
    for _ in range(3):
        native.transform_batch(imgs, boxes, 256, n_threads=8)
    native_t = time.perf_counter() - t0

    from PIL import Image

    t0 = time.perf_counter()
    for _ in range(3):
        for im, (t, l, ch, cw) in zip(imgs, boxes):
            Image.fromarray(im[t:t + ch, l:l + cw]).resize((256, 256), Image.BILINEAR)
    pil_t = time.perf_counter() - t0
    # Only assert it's not drastically slower (CI machines vary; this box has
    # a single CPU core, so thread-pool speedups are not guaranteed here).
    assert native_t < pil_t * 3.0, (native_t, pil_t)


def test_stale_binary_sweep_and_atomic_build():
    """Rebuild path: binaries of OLDER source digests are swept, the current
    digest's binary is rebuilt via temp-name + atomic rename (no .tmp
    leftovers, and a concurrent builder's fresh .so can never be unlinked
    between its g++ and its CDLL — the sweep skips the current name)."""
    import glob
    import os

    import viscoin_tpu.native as native_mod

    d = os.path.dirname(native_mod.__file__)
    cur = glob.glob(os.path.join(d, "libvctransform-*.so"))
    assert len(cur) == 1, cur
    stale = os.path.join(d, "libvctransform-0000deadbeef0000.so")
    open(stale, "wb").close()
    try:
        native_mod._LIB = None  # force a fresh load decision
        os.remove(cur[0])
        assert native_mod.available()  # rebuilds under the digest name
        assert os.path.exists(cur[0])
        assert not os.path.exists(stale)  # older digest swept
        assert glob.glob(os.path.join(d, "*.tmp")) == []  # rename completed
    finally:
        if os.path.exists(stale):
            os.remove(stale)
        native_mod._LIB = None
        assert native_mod.available()
