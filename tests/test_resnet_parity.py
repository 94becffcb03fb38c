"""Numerical parity of the Flax ResNet classifier against the HF torch model.

The reference classifier wraps HF `microsoft/resnet-50`
(viscoin/models/classifiers.py:52-66). We instantiate the torch architecture
with RANDOM weights (default ResNetConfig == resnet-50 layout — no network
needed), port the state_dict with convert_torch_classifier, and require the
logits and all 5 hidden states to match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.resnet import Classifier  # noqa: E402
from viscoin_tpu.utils.porting import convert_torch_classifier, state_dict_to_numpy  # noqa: E402


class _TorchClassifier(torch.nn.Module):
    """Torch twin of the reference Classifier (random weights, no download)."""

    def __init__(self, n_classes=7):
        super().__init__()
        config = transformers.ResNetConfig()  # defaults == resnet-50
        self.resnet = transformers.ResNetModel(config)
        self.linear = torch.nn.Linear(config.hidden_sizes[-1], n_classes)

    def forward(self, x):
        out = self.resnet(x, output_hidden_states=True)
        pooled = out["pooler_output"].flatten(1)
        return self.linear(pooled), out["hidden_states"]


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = _TorchClassifier()
    model.eval()
    return model


def test_classifier_parity(torch_model, rng):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        t_logits, t_hidden = torch_model(torch.from_numpy(x))

    variables = convert_torch_classifier(state_dict_to_numpy(torch_model.state_dict()))
    model = Classifier(output_classes=7)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    logits, hidden = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x_nhwc,
        train=False,
    )

    assert len(hidden) == 5
    for i, (th, jh) in enumerate(zip(t_hidden, hidden)):
        want = np.transpose(th.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(jh), want, rtol=1e-3, atol=1e-3,
            err_msg=f"hidden state {i} mismatch",
        )
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(), rtol=1e-3, atol=1e-3)


def test_classifier_hidden_shapes(torch_model):
    """Hidden-state channel/stride layout matches the reference docstring
    (viscoin/models/classifiers.py:19-27)."""
    variables = convert_torch_classifier(state_dict_to_numpy(torch_model.state_dict()))
    model = Classifier(output_classes=7)
    x = jnp.zeros((1, 3, 224, 224)).transpose((0, 2, 3, 1))
    _, hidden = model.apply(variables, x, train=False)
    shapes = [h.shape for h in hidden]
    assert shapes == [
        (1, 56, 56, 64),
        (1, 56, 56, 256),
        (1, 28, 28, 512),
        (1, 14, 14, 1024),
        (1, 7, 7, 2048),
    ]
