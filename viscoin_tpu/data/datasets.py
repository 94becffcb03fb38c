"""Datasets: CUB-200-2011, FunnyBirds, and a synthetic dataset for tests/bench.

Reference: viscoin/datasets/{cub.py,funnybirds.py}. Differences by design:

  * No kagglehub / HTTP auto-download (this environment has zero egress, and
    a framework should not hard-require a download service): the dataset root
    resolves from an explicit argument, then ``$VISCOIN_DATA_DIR``, then
    ``~/.cache/viscoin/datasets``. The on-disk layouts are identical to the
    reference's downloads, so a reference user can point at the same files.
  * Images are decoded once to uint8 and cached (like the reference's
    image_cache, cub.py:89-91) — but we cache the *decoded* image, not the
    transformed tensor, so train-mode augmentation stays random across epochs
    (the reference freezes the first epoch's random crops by caching the
    transformed tensor; set ``cache_transformed=True`` for that behavior).
  * __getitem__ returns fixed-size uint8 arrays; float conversion, flip and
    normalization run on-device (see data/transforms.py).
"""

from __future__ import annotations

import os
from typing import Literal

import numpy as np

from viscoin_tpu.data.transforms import (
    host_gan_transform,
    host_test_transform,
    host_train_transform,
)

Mode = Literal["train", "test"]
# transform override: dataset splits are train/test, but the TRANSFORM can
# additionally be "gan" (deterministic short-side resize + center crop — the
# stylegan2-ada dataset_tool geometry `train gan` and `fid` feed the
# discriminator/detector; mirror/ADA are the only GAN-side augmentations).
TransformMode = Literal["train", "test", "gan"]


def data_root() -> str:
    return os.environ.get(
        "VISCOIN_DATA_DIR", os.path.join(os.path.expanduser("~"), ".cache", "viscoin", "datasets")
    )


class ImageDataset:
    """Base: decoded-uint8 cache + host geometric transform to 256² uint8."""

    out_size: int = 256  # model input resolution the host transform targets

    def __init__(self, mode: Mode, transform: TransformMode | None = None, seed: int = 0,
                 cache_transformed: bool = False):
        self.mode: Mode = mode
        self.transform_mode: TransformMode = transform if transform is not None else mode
        self._cache: dict[int, np.ndarray] = {}
        self.seed = seed
        self._epoch = 0
        self._rng = np.random.default_rng(seed)  # kept for API compat
        self.cache_transformed = cache_transformed

    def set_epoch(self, epoch: int) -> None:
        """Called by the loader each epoch: augmentation randomness is a pure
        function of (seed, epoch, index), so it is thread-safe under the
        loader's pool (a shared np.Generator is not) and replays exactly
        across a resume."""
        self._epoch = epoch

    def _item_rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self._epoch, index))

    # subclasses implement:
    def _load_raw(self, index: int) -> np.ndarray:  # uint8 HWC, original size
        raise NotImplementedError

    def _label(self, index: int) -> int:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def raw_image(self, index: int) -> np.ndarray:
        if index in self._cache and not self.cache_transformed:
            return self._cache[index]
        img = self._load_raw(index)
        if not self.cache_transformed:
            self._cache[index] = img
        return img

    def __getitem__(self, index: int) -> tuple[np.ndarray, int]:
        if self.cache_transformed and index in self._cache:
            return self._cache[index], self._label(index)
        img = self.raw_image(index)
        if self.transform_mode == "train":
            out = host_train_transform(img, self._item_rng(index), size=self.out_size)
        elif self.transform_mode == "gan":
            out = host_gan_transform(img, size=self.out_size)
        else:
            out = host_test_transform(img, size=self.out_size,
                                      resize_to=int(self.out_size / 0.875))
        if self.cache_transformed:
            self._cache[index] = out
        return out, self._label(index)

    @property
    def labels_array(self) -> np.ndarray:
        return np.asarray([self._label(i) for i in range(len(self))], np.int64)


class CUB_200_2011(ImageDataset):
    """CUB-200-2011 (reference: viscoin/datasets/cub.py:30-180).

    Expects the standard extracted layout under ``root``:
    images.txt, image_class_labels.txt, train_test_split.txt,
    bounding_boxes.txt, images/, attributes/."""

    N_CLASSES = 200

    def __init__(self, mode: Mode = "train", bbox_only: bool = False,
                 transform: TransformMode | None = None, root: str | None = None, **kw):
        super().__init__(mode, transform, **kw)
        self.dataset_path = root or os.path.join(data_root(), "CUB_200_2011")
        if not os.path.isdir(self.dataset_path):
            raise FileNotFoundError(
                f"CUB_200_2011 not found at {self.dataset_path}; set VISCOIN_DATA_DIR "
                "or pass root= (layout: the extracted CUB_200_2011 directory)."
            )
        self.bbox_only = bbox_only

        split = np.loadtxt(os.path.join(self.dataset_path, "train_test_split.txt"),
                           dtype=int, delimiter=" ")
        self.train_indexes = split[split[:, 1] == 1][:, 0] - 1
        self.test_indexes = split[split[:, 1] == 0][:, 0] - 1

        labels = np.loadtxt(os.path.join(self.dataset_path, "image_class_labels.txt"),
                            dtype=int, delimiter=" ")
        self.labels = labels[:, 1] - 1  # file labels are 1-based

        paths = np.loadtxt(os.path.join(self.dataset_path, "images.txt"),
                           dtype=str, delimiter=" ")
        self.image_paths = paths[:, 1]

        bboxes = np.loadtxt(os.path.join(self.dataset_path, "bounding_boxes.txt"),
                            dtype=float, delimiter=" ").astype(int)
        self.bboxes = bboxes[:, 1:]

    def _abs_index(self, index: int) -> int:
        return int(self.train_indexes[index] if self.mode == "train" else self.test_indexes[index])

    def __len__(self):
        return len(self.train_indexes) if self.mode == "train" else len(self.test_indexes)

    def _label(self, index: int) -> int:
        return int(self.labels[self._abs_index(index)])

    def _load_raw(self, index: int) -> np.ndarray:
        from PIL import Image

        ai = self._abs_index(index)
        img = Image.open(os.path.join(self.dataset_path, "images", self.image_paths[ai]))
        if img.mode != "RGB":
            img = img.convert("RGB")
        if self.bbox_only:
            x, y, w, h = self.bboxes[ai]
            img = img.crop((x, y, min(x + w, img.width), min(y + h, img.height)))
        return np.asarray(img, np.uint8)


class LabeledCUB(CUB_200_2011):
    """CUB with generated captions from class + random attributes
    (reference: viscoin/datasets/cub.py:183-246)."""

    def __init__(self, attributes_per_label: int = 3, **kw):
        super().__init__(**kw)
        self.attributes_per_label = attributes_per_label
        self.class_labels = {
            int(k): v.split(".")[1].replace("_", " ")
            for k, v in np.loadtxt(os.path.join(self.dataset_path, "classes.txt"),
                                   dtype=str, delimiter=" ")
        }
        self.attributes_labels = {
            int(k): v
            for k, v in np.loadtxt(
                os.path.join(self.dataset_path, "attributes", "attributes.txt"),
                dtype=str, delimiter=" ",
            )
        }
        raw = np.loadtxt(
            os.path.join(self.dataset_path, "attributes", "image_attribute_labels_clean.txt"),
            dtype=float, delimiter=" ",
        ).astype(int)  # trailing columns are float confidences/times
        n_images = len(self.labels)
        # Group the ~1.2M present-attribute rows by image in ONE sorted pass
        # (a per-image boolean rescan is O(images x rows) — tens of seconds
        # of numpy time on real CUB at every dataset construction).
        present = raw[raw[:, 2] == 1]
        order = np.argsort(present[:, 0], kind="stable")
        ids, attrs = present[order, 0], present[order, 1]
        starts = np.searchsorted(ids, np.arange(1, n_images + 2))
        self.attributes: list[np.ndarray] = [
            attrs[starts[i]:starts[i + 1]] for i in range(n_images)
        ]

    # Decorrelates the caption-attribute draw from the crop rng (both are
    # keyed by (seed, epoch, index); without a tag they would share a stream).
    _CAPTION_TAG = 0xCA7

    def get_caption(self, index: int) -> str:
        ai = self._abs_index(index)
        class_name = self.class_labels[int(self.labels[ai]) + 1]
        attrs = self.attributes[ai]
        labels = [self.attributes_labels[int(a)].split("::") for a in attrs]
        n = min(self.attributes_per_label, len(labels))
        # Pure function of (seed, epoch, index): thread-safe under the
        # loader's pool (the shared self._rng is not) and resume-exact —
        # a resumed run regenerates the identical captions (the same
        # invariant the crop augmentation keeps, loader.py).
        rng = np.random.default_rng(
            (self.seed, self._epoch, index, self._CAPTION_TAG))
        chosen = rng.choice(len(labels), n, replace=False) if n else []
        parts = [
            f"with {labels[i][1].replace('_', ' ')}"
            f"{labels[i][0].lstrip('has').replace('_', ' ')}"
            for i in chosen
        ]
        return f"A picture of a {class_name} {', '.join(parts)}."

    def __getitem__(self, index: int):
        img, label = super().__getitem__(index)
        return img, label, self.get_caption(index)


class FunnyBirds(ImageDataset):
    """FunnyBirds (reference: viscoin/datasets/funnybirds.py:24-115):
    {root}/{train|test}/{class_id}/{image}.png, 50 classes."""

    N_CLASSES = 50

    def __init__(self, mode: Mode = "train", transform: TransformMode | None = None,
                 root: str | None = None, **kw):
        super().__init__(mode, transform, **kw)
        self.dataset_path = root or os.path.join(data_root(), "FunnyBirds")
        folder = os.path.join(self.dataset_path, mode)
        if not os.path.isdir(folder):
            raise FileNotFoundError(
                f"FunnyBirds not found at {folder}; set VISCOIN_DATA_DIR or pass root=."
            )
        self.image_paths: list[str] = []
        self.labels: list[int] = []
        for cls in sorted(os.listdir(folder)):
            sub = os.path.join(folder, cls)
            if not os.path.isdir(sub):
                continue
            for name in sorted(os.listdir(sub)):
                self.image_paths.append(os.path.join(cls, name))
                self.labels.append(int(cls))

    def __len__(self):
        return len(self.labels)

    def _label(self, index: int) -> int:
        return self.labels[index]

    def _load_raw(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.dataset_path, self.mode, self.image_paths[index]))
        return np.asarray(img.convert("RGB"), np.uint8)


def export_funnybirds_stylegan_zip(root: str | None = None,
                                   out_path: str = "funnybirds_dataset.zip"):
    """Export FunnyBirds (train + test) as a StyleGAN2-ADA training zip with
    dataset.json labels (reference: viscoin/datasets/funnybirds.py:116-144)."""
    import io
    import json
    import zipfile

    labels_data = {"labels": []}
    with zipfile.ZipFile(out_path, "w") as zipf:
        for mode in ("train", "test"):
            ds = FunnyBirds(mode=mode, root=root)
            for idx in range(len(ds)):
                path = os.path.join(ds.dataset_path, mode, ds.image_paths[idx])
                file_name = f"{mode}_{os.path.basename(path)}"
                zipf.write(path, arcname=file_name)
                labels_data["labels"].append([file_name, ds.labels[idx]])
        json_bytes = json.dumps(labels_data, indent=4).encode("utf-8")
        with io.BytesIO(json_bytes) as json_file:
            zipf.writestr("dataset.json", json_file.getvalue())
    print(f"Dataset saved as {out_path}")


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class ImageFolderDataset(ImageDataset):
    """Generic folder-per-class dataset: ``{root}/{train|test}/{class}/{img}``
    (the torchvision-ImageFolder layout).

    New capability: the reference README publishes classifier recipes for
    CelebA-HQ and Stanford-Cars (reference README.md:199-203) but its loader
    registry only knows cub/funnybirds (reference viscoin/datasets/utils.py:
    25-31) — this class makes any such dataset loadable by pointing
    ``--dataset`` at its root directory. Class names are directory names;
    labels are indices into the sorted union of train+test class dirs (so
    both splits agree even if one is missing a class)."""

    def __init__(self, mode: Mode = "train", transform: TransformMode | None = None,
                 root: str | None = None, out_size: int | None = None, **kw):
        super().__init__(mode, transform, **kw)
        if root is None:
            raise ValueError("ImageFolderDataset requires root= (the directory "
                             "holding train/ and test/ class folders)")
        self.dataset_path = root
        folder = os.path.join(root, mode)
        if not os.path.isdir(folder):
            raise FileNotFoundError(
                f"image-folder dataset: {folder} not found (expected layout "
                "{root}/{train|test}/{class}/{image})")
        # Stable label space across splits: sorted union of class dirs.
        names = set()
        for split in ("train", "test"):
            d = os.path.join(root, split)
            if os.path.isdir(d):
                names.update(c for c in os.listdir(d)
                             if os.path.isdir(os.path.join(d, c)))
        self.class_names: list[str] = sorted(names)
        self.class_to_idx = {c: i for i, c in enumerate(self.class_names)}
        self.N_CLASSES = len(self.class_names)
        if out_size is None:
            out_size = int(os.environ.get("VISCOIN_IMAGEFOLDER_SIZE", 256))
        self.out_size = out_size

        self.image_paths: list[str] = []
        self.labels: list[int] = []
        for cls in self.class_names:
            sub = os.path.join(folder, cls)
            if not os.path.isdir(sub):
                continue
            for name in sorted(os.listdir(sub)):
                if name.lower().endswith(_IMAGE_EXTS):
                    self.image_paths.append(os.path.join(cls, name))
                    self.labels.append(self.class_to_idx[cls])
        if not self.image_paths:
            raise FileNotFoundError(f"no images under {folder} "
                                    f"(extensions: {', '.join(_IMAGE_EXTS)})")

    def __len__(self):
        return len(self.labels)

    def _label(self, index: int) -> int:
        return self.labels[index]

    def _load_raw(self, index: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.dataset_path, self.mode,
                                      self.image_paths[index]))
        return np.asarray(img.convert("RGB"), np.uint8)


class SyntheticDataset(ImageDataset):
    """Deterministic random images — CI/bench stand-in when no dataset is on
    disk (the reference has no offline story at all; tests need one)."""

    def __init__(self, n: int | None = None, n_classes: int = 10,
                 image_size: int | None = None, mode: Mode = "train",
                 transform: TransformMode | None = None, seed: int = 0):
        super().__init__(mode, transform, seed=seed)
        # env knobs so the CLI can smoke-test with tiny configs
        if n is None:
            n = int(os.environ.get("VISCOIN_SYNTH_N", 64))
        if image_size is None:
            image_size = int(os.environ.get("VISCOIN_SYNTH_SIZE", 256))
        self.n = n
        self.n_classes = n_classes
        self.image_size = image_size
        self.out_size = image_size
        self.N_CLASSES = n_classes

    def __len__(self):
        return self.n

    def _label(self, index: int) -> int:
        return index % self.n_classes

    def _load_raw(self, index: int) -> np.ndarray:
        rng = np.random.default_rng(index + (0 if self.mode == "train" else 10_000))
        s = self.image_size
        return rng.integers(0, 256, (s + index % 7, s + index % 5, 3), dtype=np.uint8)
