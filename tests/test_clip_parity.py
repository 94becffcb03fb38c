"""CLIP ViT-B/32 parity against transformers.CLIPModel with random weights
(no download; HF's default CLIPConfig is the ViT-B/32 layout and matches the
OpenAI architecture the reference uses via pip `clip`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.clip import CLIP  # noqa: E402
from viscoin_tpu.utils.porting import convert_hf_clip, state_dict_to_numpy  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    config = transformers.CLIPConfig()  # ViT-B/32 defaults
    assert config.vision_config.patch_size == 32
    model = transformers.CLIPModel(config).eval()
    return model


def test_clip_image_parity(hf_model, rng):
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.get_image_features(pixel_values=torch.from_numpy(x)).numpy()

    params = convert_hf_clip(state_dict_to_numpy(hf_model.state_dict()))
    clip = CLIP()
    got = clip.apply({"params": params},
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     method=clip.encode_image)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-4)


def _photo_like(rng, h, w):
    """Structured natural-image stand-in: smooth gradients + blobs + noise
    (pure noise would overstate resampler differences; flat images would
    understate them)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        0.5 + 0.4 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
        0.5 + 0.3 * np.cos(xx / 31.0 + yy / 13.0),
        0.4 + 0.4 * np.sin((xx + yy) / 41.0),
    ], axis=-1)
    cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
    blob = np.exp(-(((yy - cy) / (0.15 * h)) ** 2 + ((xx - cx) / (0.15 * w)) ** 2))
    img += 0.3 * blob[..., None]
    img += rng.normal(0, 0.02, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def test_clip_preprocess_pil_exact_geometry(rng):
    """clip_preprocess_pil == the clip.load transform: PIL bicubic short-side
    resize to 224 + center crop 224 + normalize, verified against independent
    PIL calls on a non-square image (reference: viscoin/models/clip.py:38)."""
    from PIL import Image

    from viscoin_tpu.models.clip import CLIP_MEAN, CLIP_STD, clip_preprocess_pil

    raw = _photo_like(rng, 300, 467)
    got = clip_preprocess_pil(raw)
    assert got.shape == (224, 224, 3)

    img = Image.fromarray(raw)
    # torchvision semantics: long side int-TRUNCATED (348, not round->349),
    # crop origin int(round((n - 224)/2.0)) — both verified against
    # torchvision's _compute_resized_output_size / F.center_crop sources.
    nw = int(224 * 467 / 300)
    assert nw == 348
    img = img.resize((nw, 224), Image.BICUBIC)
    left = int(round((nw - 224) / 2.0))
    ref = np.asarray(img.crop((left, 0, left + 224, 224)), np.float32) / 255.0
    ref = (ref - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
    np.testing.assert_array_equal(got, ref)

    # odd crop remainder: nw=int(224*471/300)=351, origin round(63.5)=64
    # (python banker's rounding, like torchvision's int(round(...)))
    raw2 = _photo_like(rng, 300, 471)
    got2 = clip_preprocess_pil(raw2)
    img2 = Image.fromarray(raw2).resize((351, 224), Image.BICUBIC)
    ref2 = np.asarray(img2.crop((64, 0, 64 + 224, 224)), np.float32) / 255.0
    ref2 = (ref2 - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
    np.testing.assert_array_equal(got2, ref2)


def test_clip_preprocess_drift_bound(hf_model, rng):
    """Measured bound for PARITY #6: embedding cosine between the EXACT
    clip.load geometry (clip_preprocess_pil on the original image) and the
    device fallback (256² test-crop → bilinear 224) through a real ViT-B/32
    tower. The exact path is the default whenever the dataset exposes
    original images, so this bound applies only to the fallback."""
    import jax

    from viscoin_tpu.models.clip import (CLIP, clip_preprocess_pil,
                                         clip_preprocess_u8)
    from viscoin_tpu.data.transforms import host_test_transform

    params = convert_hf_clip(state_dict_to_numpy(hf_model.state_dict()))
    clip = CLIP()

    raws = [_photo_like(rng, 375, 500) for _ in range(4)]
    exact = np.stack([clip_preprocess_pil(r) for r in raws])
    fallback_u8 = np.stack([np.asarray(host_test_transform(r)) for r in raws])

    e1 = np.asarray(jax.jit(lambda p, x: clip.apply(
        {"params": p}, x, method=clip.encode_image))(params, jnp.asarray(exact)))
    e2 = np.asarray(jax.jit(lambda p, u8: clip.apply(
        {"params": p}, clip_preprocess_u8(u8), method=clip.encode_image))(
        params, jnp.asarray(fallback_u8)))

    cos = np.sum(e1 * e2, 1) / (np.linalg.norm(e1, axis=1)
                                * np.linalg.norm(e2, axis=1))
    print(f"device-fallback vs exact-clip.load embedding cosine: "
          f"min {cos.min():.4f} mean {cos.mean():.4f}")
    assert cos.min() > 0.90  # measured ~0.99 on photo-like inputs; see PARITY


def test_clip_text_parity(hf_model, rng):
    tokens = np.zeros((2, 77), np.int64)
    tokens[:, 0] = 49406  # BOS
    tokens[0, 1:5] = [320, 1125, 539, 49407]  # arbitrary ids + EOS
    tokens[1, 1:3] = [1000, 49407]
    with torch.no_grad():
        want = hf_model.get_text_features(input_ids=torch.from_numpy(tokens)).numpy()

    params = convert_hf_clip(state_dict_to_numpy(hf_model.state_dict()))
    clip = CLIP()
    got = clip.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)),
                     method=clip.encode_text)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-4)


def test_clip_cache_names_key_path_datasets():
    """Embedding caches key by the dataset's short name: a directory-path
    dataset interpolated raw would embed path separators and scatter caches
    into never-created subdirectories of checkpoints/clip."""
    from viscoin_tpu.models.clip import _img_cache, _txt_cache

    p = _img_cache("train", "/data/celeba-hq", "ViT-B/32")
    assert p == "checkpoints/clip/ViT-B-32_celeba-hq_img_train.npz"
    t = _txt_cache("k", "rel/nested/root/", "ViT-B/32")
    assert t == "checkpoints/clip/ViT-B-32_root_txt_k.npz"
