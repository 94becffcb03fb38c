"""StyleGAN training-zip packing + reading — the stylegan2-ada
``dataset_tool.py`` analogue.

The reference ecosystem prepares every GAN dataset with that tool: the
pretrained CUB generator the reference loads was trained on a zip it
produced (reference README.md:209-241), and the reference's own FunnyBirds
exporter writes one for the upstream trainer
(reference viscoin/datasets/funnybirds.py:116-144). This module covers both
directions of that workflow inside the framework:

* :func:`pack_stylegan_zip` — pack an image tree (folder-per-class or flat),
  an existing zip, or one of this framework's registry datasets into the
  upstream archive convention: images stored as
  ``{idx//1000:05d}/img{idx:08d}.png`` (uncompressed — PNG is already
  compressed, and STORED members decode faster at train time) plus a
  ``dataset.json`` holding ``{"labels": [[arcname, int], ...]}`` — or
  ``{"labels": null}`` when the source carries no class structure.
* :class:`StyleGANZipDataset` — trains directly on such archives (ours or
  upstream-made): ``train gan --dataset packed.zip`` / ``fid --dataset
  packed.zip`` work like upstream's trainer, which consumes these zips
  natively.

The geometry of ``--transform center-crop`` is the same full-short-side
center crop + resize the framework's ``transform="gan"`` path uses
(data/transforms.py::host_gan_transform) — so packing at resolution R and
training on the zip feeds the discriminator pixels identical to training on
the raw folder with ``out_size=R``.
"""

from __future__ import annotations

import io
import json
import os
import threading
import zipfile
from typing import Iterator

import numpy as np

from viscoin_tpu.data.datasets import (
    _IMAGE_EXTS,
    ImageDataset,
    Mode,
    TransformMode,
)
from viscoin_tpu.data.transforms import host_gan_transform


def _is_image(name: str) -> bool:
    return name.lower().endswith(_IMAGE_EXTS)


def _iter_folder(source: str) -> Iterator[tuple[str, str]]:
    """Yield (abs_path, rel_path) for every image under ``source``, sorted
    by rel_path for a deterministic archive order."""
    rels = []
    for dirpath, dirnames, filenames in os.walk(source):
        dirnames.sort()
        for name in sorted(filenames):
            if _is_image(name):
                full = os.path.join(dirpath, name)
                rels.append((full, os.path.relpath(full, source)))
    rels.sort(key=lambda t: t[1])
    yield from rels


def _folder_labels(rel_paths: list[str]) -> list[int] | None:
    """Labels from top-level class directories: defined only when EVERY
    image sits inside a subdirectory (the torchvision-ImageFolder layout);
    a flat or mixed tree is unlabeled (upstream packs those with
    ``labels: null`` too)."""
    norm = [os.path.normpath(r) for r in rel_paths]
    if any(os.sep not in r for r in norm):
        return None  # at least one image sits at the root → unlabeled
    tops = [r.split(os.sep)[0] for r in norm]
    classes = sorted(set(tops))
    idx = {c: i for i, c in enumerate(classes)}
    return [idx[t] for t in tops]


def _decode(data: bytes) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        return np.asarray(img.convert("RGB"), np.uint8)


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, format="PNG")
    return buf.getvalue()


def _arcname(idx: int) -> str:
    return f"{idx // 1000:05d}/img{idx:08d}.png"


def pack_stylegan_zip(
    source: str,
    dest: str,
    resolution: int | None = None,
    transform: str = "center-crop",
    max_images: int | None = None,
) -> tuple[int, int]:
    """Pack ``source`` into a StyleGAN training zip at ``dest``.

    ``source`` is a directory of images (labels from top-level class
    folders when the whole tree has them), an existing training zip
    (re-packed — e.g. to a new resolution), or a dataset registry name
    ("cub", "funnybirds", "synthetic" — labels from the dataset).

    ``resolution=None`` keeps images as stored, which requires them uniform
    and square (a StyleGAN trainer needs one fixed shape). With a
    resolution, ``transform="center-crop"`` applies the full-short-side
    center crop + resize (stylegan2-ada dataset_tool semantics, identical
    to this framework's ``transform="gan"`` geometry), while
    ``transform="none"`` refuses images that are not already exactly
    ``resolution²``.

    Returns ``(num_images, resolution)``.
    """
    if transform not in ("center-crop", "none"):
        raise ValueError(f"unknown transform {transform!r}: "
                         "expected 'center-crop' or 'none'")
    if resolution is not None and resolution < 4:
        raise ValueError(f"--resolution {resolution}: must be >= 4")

    # Resolve the source into (load_fn, labels) pairs.
    loaders: list = []
    labels: list[int] | None
    src_zip: zipfile.ZipFile | None = None
    from viscoin_tpu.data.utils import DATASET_NAMES, get_datasets

    if source in DATASET_NAMES:
        # Registry dataset: pack its raw (undecimated) train images with the
        # dataset's own labels — e.g. `--source cub` produces the archive
        # the upstream trainer would train the reference's CUB GAN from.
        ds, _ = get_datasets(source, "gan", train_only=True)
        # _load_raw (not raw_image): packing is one streaming pass — the
        # base class's decoded-image cache would pin the whole dataset in
        # RAM for nothing.
        loaders = [(lambda i=i, ds=ds: ds._load_raw(i)) for i in range(len(ds))]
        labels = [int(ds._label(i)) for i in range(len(ds))]
    elif os.path.isdir(source):
        entries = list(_iter_folder(source))
        if not entries:
            raise ValueError(f"no images found under {source}")
        loaders = [
            (lambda p=p: _decode(open(p, "rb").read())) for p, _ in entries
        ]
        labels = _folder_labels([r for _, r in entries])
    elif os.path.isfile(source) and zipfile.is_zipfile(source):
        src_zip = zipfile.ZipFile(source)  # closed in the finally below
        names = sorted(n for n in src_zip.namelist() if _is_image(n))
        if not names:
            raise ValueError(f"no images found inside {source}")
        loaders = [(lambda n=n: _decode(src_zip.read(n))) for n in names]
        label_map = _read_zip_labels(src_zip)
        if label_map is not None and not all(n in label_map for n in names):
            import warnings
            warnings.warn(
                f"{source}: dataset.json covers only part of the archive — "
                "dropping labels (the re-packed zip will be unlabeled)",
                stacklevel=2)
            label_map = None
        labels = ([label_map[n] for n in names]
                  if label_map is not None else None)
    else:
        raise ValueError(
            f"unknown source {source!r}: expected an image directory, a "
            f"training zip, or one of {sorted(DATASET_NAMES)}")

    if max_images is not None:
        loaders = loaders[:max_images]
        labels = labels[:max_images] if labels is not None else None
    if not loaders:
        raise ValueError("no images selected (is --max-images 0?)")

    out_res: int | None = resolution
    records: list[list] | None = [] if labels is not None else None
    out_dir = os.path.dirname(os.path.abspath(dest))
    os.makedirs(out_dir, exist_ok=True)
    try:
        with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as zf:
            for idx, load in enumerate(loaders):
                img = load()
                h, w = img.shape[:2]
                if resolution is not None:
                    if transform == "center-crop":
                        img = host_gan_transform(img, size=resolution)
                    elif (h, w) != (resolution, resolution):
                        raise ValueError(
                            f"image {idx} is {w}x{h}, not {resolution}² — "
                            "use --transform center-crop or fix --resolution")
                else:
                    if h != w:
                        raise ValueError(
                            f"image {idx} is {w}x{h} (non-square); pass "
                            "--resolution to crop/resize")
                    if out_res is None:
                        out_res = h
                    elif h != out_res:
                        raise ValueError(
                            f"image {idx} is {h}², others are {out_res}²; "
                            "pass --resolution for a uniform archive")
                name = _arcname(idx)
                zf.writestr(name, _encode_png(img))
                if records is not None:
                    assert labels is not None
                    records.append([name, int(labels[idx])])
            zf.writestr("dataset.json",
                        json.dumps({"labels": records}, indent=2))
    finally:
        if src_zip is not None:
            src_zip.close()
    assert out_res is not None
    return len(loaders), out_res


def _read_zip_labels(zf: zipfile.ZipFile) -> dict[str, int] | None:
    """dataset.json → {arcname: label}, or None when absent/unlabeled."""
    try:
        raw = json.loads(zf.read("dataset.json"))
    except KeyError:
        return None
    recs = raw.get("labels")
    if not recs:
        return None
    return {name: int(label) for name, label in recs}


class StyleGANZipDataset(ImageDataset):
    """Train directly on a StyleGAN training zip (packed here or by the
    upstream dataset_tool — same archive convention).

    The archive IS the training set: like upstream's trainer there is no
    train/test split, so this dataset is **train-only** (``get_datasets``
    refuses to fabricate a test split from it). Labels come from
    ``dataset.json`` when present; unlabeled archives read as a single
    class 0 — `train gan` is unconditional and never looks at them.

    Zip member reads go through one handle per loader thread
    (``zipfile.ZipFile`` concurrent reads on a shared handle interleave
    seeks); decoded images ride the base class's uint8 cache like every
    other dataset here.
    """

    def __init__(self, path: str, mode: Mode = "train",
                 transform: TransformMode | None = None,
                 out_size: int | None = None, **kw):
        super().__init__(mode, transform, **kw)
        if not zipfile.is_zipfile(path):
            raise FileNotFoundError(f"not a zip archive: {path}")
        self.dataset_path = path
        self._local = threading.local()
        zf = self._zip()
        self.names = sorted(n for n in zf.namelist() if _is_image(n))
        if not self.names:
            raise ValueError(f"no images inside {path}")
        label_map = _read_zip_labels(zf)
        if label_map is None:
            self.labels = [0] * len(self.names)
        else:
            missing = [n for n in self.names if n not in label_map]
            if missing:
                # Upstream's dataset reader raises KeyError here: a present
                # dataset.json that covers only part of the archive is a
                # corrupted archive, not an unlabeled one.
                raise ValueError(
                    f"{path}: dataset.json labels {len(self.names) - len(missing)}"
                    f"/{len(self.names)} image members (first missing: "
                    f"{missing[0]!r}) — corrupted labeled archive")
            self.labels = [label_map[n] for n in self.names]
        self.N_CLASSES = max(self.labels) + 1
        native = _decode(zf.read(self.names[0])).shape[0]
        self.out_size = int(out_size) if out_size is not None else int(native)

    def _zip(self) -> zipfile.ZipFile:
        zf = getattr(self._local, "zf", None)
        if zf is None:
            zf = zipfile.ZipFile(self.dataset_path)
            self._local.zf = zf
        return zf

    def __len__(self) -> int:
        return len(self.names)

    def _label(self, index: int) -> int:
        return self.labels[index]

    def _load_raw(self, index: int) -> np.ndarray:
        return _decode(self._zip().read(self.names[index]))
