"""Image display/conversion utilities (reference: viscoin/utils/images.py).

Arrays here are NHWC numpy/jax (the reference converts from NCHW torch)."""

from __future__ import annotations

import numpy as np


def normalize_image(x: np.ndarray) -> np.ndarray:
    """Min-max normalize for display (reference: normalize_tensor_image)."""
    x = np.asarray(x)
    mn, mx = x.min(), x.max()
    if np.issubdtype(x.dtype, np.floating):
        return (x - mn) / max(mx - mn, 1e-12)
    return (((x.astype(np.float32) - mn) / max(mx - mn, 1e-12)) * 255).astype(np.uint8)


def clip_image(x: np.ndarray) -> np.ndarray:
    """Clip values for display: float → [0,1], int → [0,255]."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating):
        return np.clip(x, 0, 1)
    return np.clip(x, 0, 255)


def from_jax(x) -> np.ndarray:
    """Device NHWC image (batched of 1, or unbatched) → display-ready numpy
    (reference: from_torch, images.py:42-54 — but no transpose needed: we are
    already channels-last)."""
    x = normalize_image(np.asarray(x))
    if x.ndim == 4:
        if x.shape[0] == 1:
            return x[0]
        return x
    return x


def imshow(x, title: str):
    import matplotlib.pyplot as plt

    img = from_jax(x)
    if img.ndim == 4:
        assert img.shape[0] == 1
        img = img[0]
    plt.title(title)
    plt.imshow(img)
    plt.show()


def heatmap_to_img(heatmap: np.ndarray, size: int = 256) -> np.ndarray:
    """Heatmap → RGB uint8 (JET colormap, resized to ``size``², reference:
    images.py:75-91). Uses cv2 when available, otherwise matplotlib's jet."""
    heatmap = np.asarray(heatmap).squeeze()
    try:
        import cv2

        norm = cv2.normalize(heatmap, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        colored = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
        resized = cv2.resize(colored, (size, size), interpolation=cv2.INTER_CUBIC)
        return cv2.cvtColor(resized, cv2.COLOR_BGR2RGB)
    except ImportError:
        from matplotlib import cm
        from PIL import Image

        norm = normalize_image(heatmap.astype(np.float32))
        rgba = cm.jet(norm)
        rgb = (rgba[..., :3] * 255).astype(np.uint8)
        return np.asarray(Image.fromarray(rgb).resize((size, size), Image.BICUBIC))


def overlay(image: np.ndarray, over: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Alpha-blend an overlay onto a base image (reference: images.py:94-98)."""
    assert image.dtype == over.dtype, "Image and overlay must have the same dtype"
    out = image.astype(np.float32) * (1 - alpha) + over.astype(np.float32) * alpha
    return out.astype(image.dtype)
