"""CUB-200-2011 parser tests against a fabricated mini dataset tree
(same on-disk layout as the reference's kaggle download,
viscoin/datasets/cub.py:62-91)."""

import numpy as np
import pytest
from PIL import Image

from viscoin_tpu.data.datasets import CUB_200_2011, FunnyBirds, LabeledCUB


@pytest.fixture(scope="module")
def cub_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cub") / "CUB_200_2011"
    (root / "images" / "001.Black_footed_Albatross").mkdir(parents=True)
    (root / "attributes").mkdir()

    rng = np.random.default_rng(0)
    n = 6
    with open(root / "images.txt", "w") as f_img, \
         open(root / "image_class_labels.txt", "w") as f_lbl, \
         open(root / "train_test_split.txt", "w") as f_split, \
         open(root / "bounding_boxes.txt", "w") as f_bbox:
        for i in range(1, n + 1):
            rel = f"001.Black_footed_Albatross/img_{i}.jpg"
            img = rng.integers(0, 256, (80 + i, 100 + i, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / "images" / rel)
            f_img.write(f"{i} {rel}\n")
            f_lbl.write(f"{i} {1 + (i % 2)}\n")  # classes 1,2 (1-based)
            f_split.write(f"{i} {1 if i <= 4 else 0}\n")  # 4 train, 2 test
            f_bbox.write(f"{i} 10.0 12.0 40.0 30.0\n")

    with open(root / "classes.txt", "w") as f:
        f.write("1 001.Black_footed_Albatross\n2 002.Laysan_Albatross\n")
    with open(root / "attributes" / "attributes.txt", "w") as f:
        f.write("1 has_bill_shape::dagger\n2 has_wing_color::blue\n"
                "3 has_size::small\n")
    with open(root / "attributes" / "image_attribute_labels_clean.txt", "w") as f:
        for i in range(1, n + 1):
            for a in range(1, 4):
                present = 1 if (i + a) % 2 == 0 else 0
                f.write(f"{i} {a} {present} 3 1.0\n")
    return str(root)


def test_cub_split_and_labels(cub_root):
    train = CUB_200_2011(mode="train", root=cub_root)
    test = CUB_200_2011(mode="test", root=cub_root)
    assert len(train) == 4 and len(test) == 2
    # labels are 0-based (file is 1-based, cub.py:73): image 1 has class id
    # 1 + (1 % 2) = 2 → 0-based label 1
    assert train._label(0) == 1
    labels = [train._label(i) for i in range(4)]
    assert set(labels) <= {0, 1}


def test_cub_getitem_shapes(cub_root):
    train = CUB_200_2011(mode="train", root=cub_root)
    img, label = train[0]
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    test = CUB_200_2011(mode="test", root=cub_root)
    img, _ = test[0]
    assert img.shape == (256, 256, 3)


def test_cub_bbox_crop(cub_root):
    plain = CUB_200_2011(mode="train", root=cub_root)
    bbox = CUB_200_2011(mode="train", root=cub_root, bbox_only=True)
    raw_plain = plain.raw_image(0)
    raw_bbox = bbox.raw_image(0)
    assert raw_bbox.shape[0] <= 30 and raw_bbox.shape[1] <= 40
    assert raw_plain.shape[0] > raw_bbox.shape[0]


def test_cub_image_cache(cub_root):
    ds = CUB_200_2011(mode="train", root=cub_root)
    a = ds.raw_image(1)
    b = ds.raw_image(1)
    assert a is b  # decoded-image cache hit


def test_labeled_cub_captions(cub_root):
    ds = LabeledCUB(root=cub_root, mode="train", attributes_per_label=1)
    img, label, caption = ds[0]
    assert img.shape == (256, 256, 3)
    assert caption.startswith("A picture of a ")
    assert "Albatross" in caption


def test_labeled_cub_captions_deterministic(cub_root):
    """Captions are a pure function of (seed, epoch, index): thread-safe
    under the loader pool and resume-exact (the shared-rng form changed with
    call order), while epochs still re-draw the random attributes."""
    ds = LabeledCUB(root=cub_root, mode="train", attributes_per_label=1)
    ds2 = LabeledCUB(root=cub_root, mode="train", attributes_per_label=1)
    assert ds.get_caption(0) == ds.get_caption(0)  # call-order independent
    assert ds.get_caption(0) == ds2.get_caption(0)  # instance independent
    ds.set_epoch(1)
    e1 = [ds.get_caption(i) for i in range(2)]
    ds.set_epoch(2)
    ds.get_caption(0)
    ds.set_epoch(1)  # "resume": replaying epoch 1 reproduces its captions
    assert [ds.get_caption(i) for i in range(2)] == e1

    # concurrent access == serial access
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(4) as pool:
        concurrent = list(pool.map(ds.get_caption, range(4)))
    assert concurrent == [ds.get_caption(i) for i in range(4)]


def test_funnybirds_layout(tmp_path):
    root = tmp_path / "FunnyBirds"
    rng = np.random.default_rng(0)
    for cls in ["0", "1"]:
        d = root / "train" / cls
        d.mkdir(parents=True)
        for j in range(2):
            Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(
                d / f"{j}.png"
            )
    ds = FunnyBirds(mode="train", root=str(root))
    assert len(ds) == 4
    img, label = ds[0]
    assert img.shape == (256, 256, 3)
    assert sorted({ds._label(i) for i in range(4)}) == [0, 1]


def test_missing_dataset_raises():
    with pytest.raises(FileNotFoundError):
        CUB_200_2011(root="/nonexistent/CUB_200_2011")
