"""Native (C++) batch transform: build-on-first-use + ctypes bindings.

The library (transform.cpp) performs crop + bilinear-resize over a whole
batch with a thread pool — the host-side hot path of the data pipeline. The
Python side computes the crop boxes (RandomResizedCrop / Resize+CenterCrop
geometry, matching viscoin/datasets/transforms.py) and hands pointers over.

Gated: if no C++ toolchain is available the callers fall back to the PIL
path in data/transforms.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_FAILED = False


def _build_and_load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    import hashlib

    src = os.path.join(os.path.dirname(__file__), "transform.cpp")
    # The binary name carries the source hash: a stale build can never win
    # over edited source (git does not preserve mtimes, so an mtime check
    # can be fooled by checkout order).
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(__file__), f"libvctransform-{digest}.so")
    try:
        if not os.path.exists(out):
            # Sweep builds of OLDER source revisions (incl. the legacy
            # un-hashed name) — never the current digest's file: a sibling
            # process (pytest worker, concurrent CLI) may have just built
            # it, and removing a binary between its g++ and its CDLL would
            # ENOENT that process.
            import glob

            for stale in glob.glob(os.path.join(os.path.dirname(__file__),
                                                "libvctransform*.so")):
                if stale == out:
                    continue
                try:
                    os.remove(stale)
                except OSError:
                    pass
            # Build to a process-private temp name, then atomically rename:
            # two processes building concurrently each write their own file
            # and the renames race harmlessly (same content, same digest).
            tmp = f"{out}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        lib.vct_transform_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # srcs
            ctypes.POINTER(ctypes.c_int),  # hs
            ctypes.POINTER(ctypes.c_int),  # ws
            ctypes.POINTER(ctypes.c_int),  # tops
            ctypes.POINTER(ctypes.c_int),  # lefts
            ctypes.POINTER(ctypes.c_int),  # chs
            ctypes.POINTER(ctypes.c_int),  # cws
            ctypes.c_void_p,  # out
            ctypes.c_int,  # n
            ctypes.c_int,  # size
            ctypes.c_int,  # threads
        ]
        lib.vct_transform_batch.restype = None
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def transform_batch(images: list[np.ndarray], boxes: np.ndarray, size: int,
                    n_threads: int = 8) -> np.ndarray:
    """Crop+resize a list of HWC uint8 images into one (N, size, size, 3) batch.

    Args:
        images: list of (h, w, 3) contiguous uint8 arrays.
        boxes: (N, 4) int32 — (top, left, crop_h, crop_w) per image.
    """
    lib = _build_and_load()
    assert lib is not None, "native transform library unavailable"
    n = len(images)
    out = np.empty((n, size, size, 3), np.uint8)
    srcs = (ctypes.c_void_p * n)(
        *[img.ctypes.data_as(ctypes.c_void_p).value for img in images]
    )
    hs = np.asarray([img.shape[0] for img in images], np.int32)
    ws = np.asarray([img.shape[1] for img in images], np.int32)
    boxes = np.ascontiguousarray(boxes, np.int32)

    def iptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    tops = np.ascontiguousarray(boxes[:, 0])
    lefts = np.ascontiguousarray(boxes[:, 1])
    chs = np.ascontiguousarray(boxes[:, 2])
    cws = np.ascontiguousarray(boxes[:, 3])
    lib.vct_transform_batch(
        srcs, iptr(hs), iptr(ws), iptr(tops), iptr(lefts), iptr(chs), iptr(cws),
        out.ctypes.data_as(ctypes.c_void_p), n, size, n_threads,
    )
    return out


def crop_boxes(shapes: list[tuple[int, int]], mode: str, size: int,
               rng) -> np.ndarray:
    """Compute crop boxes for a batch.

    train: RandomResizedCrop geometry (viscoin/datasets/transforms.py:16).
    test: Resize(short=int(size/0.875))+CenterCrop(size) collapsed into ONE
          crop+resize — the center region of side short*size/resize_to,
          where resize_to = int(size/0.875) (e.g. 256/292 = 0.8767, NOT
          0.875: the int() truncation in the torchvision recipe shifts the
          effective fraction, and the PIL path reproduces exactly that).
    gan:  short-side center crop (the FULL short side) resized to size —
          stylegan2-ada dataset_tool 'center-crop' geometry; exact resize
          for square inputs (host_gan_transform).

    ``rng`` is one np.random.Generator for the whole batch, or a list of
    per-image Generators (the loader keys each by (seed, epoch, index), so
    the geometry of image i is independent of which batch — or which
    data-parallel shard — it lands in).
    """
    from viscoin_tpu.data.transforms import random_resized_crop_params

    rngs = rng if isinstance(rng, (list, tuple)) else [rng] * len(shapes)
    boxes = np.zeros((len(shapes), 4), np.int32)
    for i, (h, w) in enumerate(shapes):
        if mode == "train":
            boxes[i] = random_resized_crop_params(h, w, rngs[i])
        elif mode == "gan":
            side = min(h, w)
            boxes[i] = ((h - side) // 2, (w - side) // 2, side, side)
        else:
            side = int(round(min(h, w) * size / int(size / 0.875)))
            boxes[i] = ((h - side) // 2, (w - side) // 2, side, side)
    return boxes
