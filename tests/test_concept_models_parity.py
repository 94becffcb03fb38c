"""Parity tests for Psi / Theta / Concept2CLIP against torch twins.

The torch twins mirror the reference architectures
(viscoin/models/{concept_extractors,explainers,concept2clip}.py) with random
weights; weights are ported via utils/porting.py and outputs must match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.concept_extractor import ConceptExtractor, adaptive_avg_pool  # noqa: E402
from viscoin_tpu.models.concept2clip import Concept2CLIP, Concept2CLIPStyleGAN  # noqa: E402
from viscoin_tpu.models.explainer import Explainer  # noqa: E402
from viscoin_tpu.utils.porting import (  # noqa: E402
    convert_torch_concept2clip,
    convert_torch_concept_extractor,
    convert_torch_explainer,
    state_dict_to_numpy,
)


def _nhwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))


class _TorchPsi(torch.nn.Module):
    """Torch twin of the reference ConceptExtractor (concept_extractors.py:41-141)."""

    def __init__(self, n_concepts=16, lc=32, c1=24, c2=40, c3=56):
        super().__init__()
        self.n_concepts, self.lc = n_concepts, lc
        self.conv1 = torch.nn.Conv2d(c1, lc, 5, padding=2, stride=4)
        self.conv2 = torch.nn.Conv2d(c2, lc, 3, padding=1, stride=2)
        self.conv3 = torch.nn.Conv2d(c3, lc, 3, padding=1, stride=1)
        self.conv4 = torch.nn.Conv2d(3 * lc, 3 * lc, 3, padding=1)
        self.conv5 = torch.nn.Conv2d(3 * lc, n_concepts, 1)
        self.linear1 = torch.nn.Linear(lc * 3 * 9, 9 * n_concepts)
        self.linear2 = torch.nn.Linear(9 * n_concepts, 9 * n_concepts, bias=False)

    def forward(self, layers):
        a = F.relu(self.conv1(layers[0]))
        b = F.relu(self.conv2(layers[1]))
        c = F.relu(self.conv3(layers[2]))
        x = F.relu(self.conv4(torch.cat([a, b, c], 1)))
        phi = F.adaptive_avg_pool2d(F.relu(self.conv5(x)), 3)
        y = F.adaptive_avg_pool2d(x, 3).reshape(-1, self.lc * 3 * 9)
        y = F.relu(self.linear2(F.relu(self.linear1(y))))
        return phi, y


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 7, 7, 5))[0].astype(np.float32)  # (8,7,7,5)
    want = F.adaptive_avg_pool2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 3).numpy()
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), 3))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-5, atol=1e-6)


def test_concept_extractor_parity(rng):
    torch.manual_seed(1)
    tm = _TorchPsi().eval()
    layers_t = [
        torch.from_numpy(rng.standard_normal((2, c, s, s)).astype(np.float32))
        for c, s in [(24, 28), (40, 14), (56, 7)]
    ]
    with torch.no_grad():
        phi_t, y_t = tm(layers_t)

    params = convert_torch_concept_extractor(state_dict_to_numpy(tm.state_dict()))
    model = ConceptExtractor(n_concepts=16, latent_channels=32,
                             input_channels1=24, input_channels2=40, input_channels3=56)
    layers_j = [jnp.asarray(_nhwc(t.numpy())) for t in layers_t]
    phi, y = model.apply({"params": params}, layers_j)

    assert phi.shape == (2, 3, 3, 16)
    np.testing.assert_allclose(np.asarray(phi), _nhwc(phi_t.numpy()), rtol=1e-4, atol=1e-5)
    # Phi' must match INCLUDING the channel-major flatten order.
    np.testing.assert_allclose(np.asarray(y), y_t.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("normalized", [False, True])
def test_explainer_parity(rng, normalized):
    torch.manual_seed(2)
    lin = torch.nn.Linear(16, 9)
    if normalized:
        lin = torch.nn.utils.parametrizations.weight_norm(lin, name="weight")

    class TorchTheta(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = lin

        def forward(self, x):
            x = F.adaptive_max_pool2d(x, 1).flatten(1)
            return self.linear(x)

    tm = TorchTheta().eval()
    x = rng.standard_normal((3, 16, 3, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = convert_torch_explainer(state_dict_to_numpy(tm.state_dict()))
    model = Explainer(n_concepts=16, n_classes=9, normalized=normalized)
    got = model.apply({"params": params}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    w = Explainer.effective_weight(params)
    assert w.shape == (9, 16)
    if normalized:
        with torch.no_grad():
            np.testing.assert_allclose(np.asarray(w), tm.linear.weight.numpy(),
                                       rtol=1e-4, atol=1e-6)


def test_concept2clip_parity(rng):
    torch.manual_seed(3)
    n_concepts, clip_dim = 8, 12
    hidden = (n_concepts * 9 + clip_dim) // 2

    class TorchC2C(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(
                torch.nn.Linear(n_concepts * 9, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, clip_dim),
            )

        def forward(self, x):
            return self.model(x.reshape(x.shape[0], -1))

    tm = TorchC2C().eval()
    x = rng.standard_normal((4, n_concepts, 3, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    params = convert_torch_concept2clip(state_dict_to_numpy(tm.state_dict()))
    model = Concept2CLIP(n_concepts=n_concepts, clip_dim=clip_dim)
    got = model.apply({"params": params}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_concept2clip_stylegan_shape(rng):
    import jax

    model = Concept2CLIPStyleGAN(n_style_layers=6, layer_dim=32, clip_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(v, x).shape == (2, 16)
