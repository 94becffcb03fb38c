"""Image transforms, split TPU-first.

Reference: viscoin/datasets/transforms.py (torchvision v2 pipelines).

The reference runs RandomResizedCrop/Resize/CenterCrop/flip/normalize on the
host CPU per sample. Here the pipeline is split so the arithmetic-heavy,
fusable parts run on-device inside the jitted step (the BASELINE.json north
star: "transforms fuse into an XLA preprocessing graph"):

  * host   (this module, numpy/PIL): decode → geometric crop/resize to a
    fixed 256² uint8 — the only genuinely shape-dynamic work.
  * device (:func:`device_preprocess`): uint8 → float scale (1/255),
    horizontal flip (train), ImageNet normalization — one fused VPU loop,
    executed inside the train step so the host ships only uint8 bytes
    (4x less PCIe/ICI traffic than float32).

Geometric semantics match torchvision:
  * train: RandomResizedCrop(256, scale=(0.08, 1.0), ratio=(3/4, 4/3)) +
    RandomHorizontalFlip (flip decided on device).
  * test: Resize(short side = int(256 / 0.875) = 292) + CenterCrop(256).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

TRAIN_SIZE = 256
TEST_RESIZE = int(256 / 0.875)  # 292


def _to_pil(img: np.ndarray):
    from PIL import Image

    return Image.fromarray(img)


def random_resized_crop_params(
    height: int,
    width: int,
    rng: np.random.Generator,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
) -> tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params: (top, left, h, w)."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # Fallback: center crop with clamped aspect (torchvision behavior).
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def host_train_transform(img: np.ndarray, rng: np.random.Generator,
                         size: int = TRAIN_SIZE) -> np.ndarray:
    """RandomResizedCrop to (size, size) uint8 HWC (flip happens on device)."""
    from PIL import Image

    h, w = img.shape[:2]
    top, left, ch, cw = random_resized_crop_params(h, w, rng)
    crop = img[top : top + ch, left : left + cw]
    out = _to_pil(crop).resize((size, size), Image.BILINEAR)
    return np.asarray(out, np.uint8)


def host_gan_transform(img: np.ndarray, size: int = TRAIN_SIZE) -> np.ndarray:
    """Deterministic full-frame geometry for GAN training/FID: short side
    resized to ``size`` + center crop (stylegan2-ada dataset_tool
    'center-crop' semantics). For square inputs this is exactly
    ``Resize((size, size))`` — no border is cut. Distinct from the test
    transform, whose 256/292 margin is a classifier-eval convention; the
    upstream GAN trainer consumes raw dataset images (mirror and ADA are the
    only augmentations, both applied inside the train step)."""
    return host_test_transform(img, size=size, resize_to=size)


def host_test_transform(img: np.ndarray, size: int = TRAIN_SIZE,
                        resize_to: int = TEST_RESIZE) -> np.ndarray:
    """Resize(short side) + CenterCrop to (size, size) uint8 HWC."""
    from PIL import Image

    h, w = img.shape[:2]
    if h < w:
        nh, nw = resize_to, max(1, int(round(w * resize_to / h)))
    else:
        nh, nw = max(1, int(round(h * resize_to / w))), resize_to
    out = np.asarray(_to_pil(img).resize((nw, nh), Image.BILINEAR), np.uint8)
    top = (nh - size) // 2
    left = (nw - size) // 2
    # torchvision CenterCrop pads if the image is smaller than the crop
    if top < 0 or left < 0:
        pad_h, pad_w = max(-top, 0), max(-left, 0)
        out = np.pad(out, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
        top, left = max(top, 0), max(left, 0)
    return out[top : top + size, left : left + size]


def device_preprocess(
    images_u8: jax.Array,
    flip: jax.Array | None = None,
) -> jax.Array:
    """(B, H, W, 3) uint8 → normalized float32 NHWC; fused under jit.

    Args:
        images_u8: raw uint8 batch.
        flip: optional (B,) bool — horizontal flip per sample (train mode).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if flip is not None:
        flipped = x[:, :, ::-1, :]
        x = jnp.where(flip[:, None, None, None], flipped, x)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def normalize_only(x: jax.Array) -> jax.Array:
    """ImageNet-normalize an already-[0,1] float NHWC batch."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def denormalize(x: jax.Array) -> jax.Array:
    """Invert ImageNet normalization (for display/export)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return x * std + mean
