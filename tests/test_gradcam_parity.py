"""GradCAM parity vs torch hooks: the perturb-tap functional formulation
must reproduce the reference's hook-based heatmaps (viscoin/utils/gradcam.py)
bit-for-tolerance on the same weights and latents."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_concept_models_parity import _TorchPsi, _nhwc  # noqa: E402

from viscoin_tpu.models.concept_extractor import ConceptExtractor  # noqa: E402
from viscoin_tpu.models.explainer import Explainer  # noqa: E402
from viscoin_tpu.utils.gradcam import concept_extractor_gradcams  # noqa: E402
from viscoin_tpu.utils.porting import (  # noqa: E402
    convert_torch_concept_extractor,
    convert_torch_explainer,
    state_dict_to_numpy,
)


class _Models:
    """Duck-typed bundle: gradcam only touches psi/theta fields."""

    def __init__(self, psi, psi_p, theta, theta_p):
        self.concept_extractor = psi
        self.concept_params = psi_p
        self.explainer = theta
        self.explainer_params = theta_p
        self.classifier = self.classifier_vars = None


def test_gradcam_matches_torch_hooks(rng):
    torch.manual_seed(0)
    tpsi = _TorchPsi().eval()
    tlin = torch.nn.Linear(16, 9).eval()

    latents_t = [
        torch.from_numpy(rng.standard_normal((3, c, s, s)).astype(np.float32))
        for c, s in [(24, 28), (40, 14), (56, 7)]
    ]
    labels = rng.integers(0, 9, 3)

    # --- torch: the reference's hook mechanism (gradcam.py:9-46) ---
    acts, grads = {}, {}
    convs = {f"conv{i}": getattr(tpsi, f"conv{i}") for i in range(1, 6)}
    for name, conv in convs.items():
        conv.register_forward_hook(
            lambda m, i, o, name=name: acts.__setitem__(name, o))
        conv.register_full_backward_hook(
            lambda m, gi, go, name=name: grads.__setitem__(name, go[0]))
    phi, _ = tpsi(latents_t)
    logits_t = tlin(F.adaptive_max_pool2d(phi, 1).flatten(1))
    loss = F.cross_entropy(logits_t, torch.from_numpy(labels).long())
    loss.backward()

    def torch_heatmap(a, g):  # reference math (gradcam.py:26-46), NCHW
        w = g.mean(dim=(2, 3))
        maps = F.relu((a * w[:, :, None, None]).sum(1))
        flat = maps.flatten(1)
        mn = flat.min(1).values[:, None, None]
        mx = flat.max(1).values[:, None, None]
        return (maps - mn) / torch.where(mx - mn == 0, torch.ones(()), mx - mn)

    want = {name: torch_heatmap(acts[name].detach(), grads[name]).numpy()
            for name in convs}

    # --- ours: perturb taps on the converted weights ---
    psi_p = convert_torch_concept_extractor(state_dict_to_numpy(tpsi.state_dict()))
    theta_p = convert_torch_explainer(state_dict_to_numpy(
        {f"linear.{k}": v for k, v in tlin.state_dict().items()}))
    models = _Models(
        ConceptExtractor(n_concepts=16, latent_channels=32, input_channels1=24,
                         input_channels2=40, input_channels3=56), psi_p,
        Explainer(n_concepts=16, n_classes=9), theta_p)
    latents_j = tuple(jnp.asarray(_nhwc(t.numpy())) for t in latents_t)
    heatmaps, logits_j = concept_extractor_gradcams(
        models, labels=jnp.asarray(labels), latents=latents_j)

    np.testing.assert_allclose(logits_j, logits_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    for name in convs:
        np.testing.assert_allclose(heatmaps[name], want[name],
                                   rtol=1e-3, atol=1e-4, err_msg=name)
