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
