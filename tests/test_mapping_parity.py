"""Parity of the stacked MappingNetworkAdapted (and FullyConnected) against
torch twins of the reference math (viscoin/models/gan.py:147-234 /
stylegan2-ada FullyConnectedLayer), including weight porting from the
reference's per-index ``s{i}`` module layout."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.stylegan import FullyConnected, MappingNetworkAdapted  # noqa: E402
from viscoin_tpu.utils.porting import convert_torch_adapted_mapping, state_dict_to_numpy  # noqa: E402


class _TorchFC(torch.nn.Module):
    """Torch twin of the equalized-LR FullyConnectedLayer."""

    def __init__(self, in_f, out_f, activation="linear", lr_multiplier=1.0,
                 bias_init=0.0):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.randn(out_f, in_f) / lr_multiplier)
        self.bias = torch.nn.Parameter(torch.full([out_f], float(bias_init)))
        self.weight_gain = lr_multiplier / math.sqrt(in_f)
        self.bias_gain = lr_multiplier
        self.activation = activation

    def forward(self, x):
        w = self.weight * self.weight_gain
        b = self.bias * self.bias_gain
        x = x @ w.t() + b
        if self.activation == "lrelu":
            x = F.leaky_relu(x, 0.2) * math.sqrt(2.0)
        return x


def test_fully_connected_torch_parity(rng):
    torch.manual_seed(0)
    tm = _TorchFC(24, 16, activation="lrelu", lr_multiplier=0.01, bias_init=1.0)
    x = rng.standard_normal((5, 24)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    m = FullyConnected(24, 16, activation="lrelu", lr_multiplier=0.01, bias_init=1.0)
    params = {
        "weight": tm.weight.detach().numpy(),
        "bias": tm.bias.detach().numpy(),
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class _TorchAdaptedMapping(torch.nn.Module):
    """Torch twin of the reference MappingNetworkAdapted (gan.py:147-234):
    one 1-layer equalized-LR MLP per style index, z1 for coarse..mid, z2
    otherwise, plus the fixed_w_avg bias."""

    def __init__(self, z1_dim, z2_dim, w_dim, num_ws, coarse, mid):
        super().__init__()
        self.num_ws, self.coarse, self.mid = num_ws, coarse, mid
        self.fixed_w_avg = torch.nn.Parameter(torch.zeros(w_dim) + 0.3)
        for i in range(num_ws):
            dim = z1_dim if coarse <= i <= mid else z2_dim
            setattr(self, f"s{i}", torch.nn.Sequential(
                _TorchFC(dim, w_dim, activation="lrelu", lr_multiplier=0.01)))

    @staticmethod
    def _norm(z):
        return z * torch.rsqrt(torch.mean(z**2, dim=1, keepdim=True) + 1e-8)

    def forward(self, z1, z2):
        x1, x2 = self._norm(z1), self._norm(z2)
        styles = []
        for i in range(self.num_ws):
            layer = getattr(self, f"s{i}")
            styles.append(layer(x1 if self.coarse <= i <= self.mid else x2))
        ws = torch.stack(styles, dim=1)
        return ws + self.fixed_w_avg.repeat([ws.shape[0], ws.shape[1], 1])


def test_adapted_mapping_torch_parity_with_porting(rng):
    torch.manual_seed(1)
    z1_dim, z2_dim, w_dim, num_ws, coarse, mid = 36, 36, 16, 6, 2, 4
    tm = _TorchAdaptedMapping(z1_dim, z2_dim, w_dim, num_ws, coarse, mid).eval()
    z1 = rng.standard_normal((3, z1_dim)).astype(np.float32)
    z2 = rng.standard_normal((3, z2_dim)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z1), torch.from_numpy(z2)).numpy()

    sd = state_dict_to_numpy(tm.state_dict())
    params = convert_torch_adapted_mapping(sd, prefix="", num_ws=num_ws,
                                           num_layers=1, coarse_layer=coarse,
                                           mid_layer=mid)
    m = MappingNetworkAdapted(z1_dim=z1_dim, z2_dim=z2_dim, w_dim=w_dim,
                              num_ws=num_ws, coarse_layer=coarse, mid_layer=mid)
    got = m.apply({"params": params}, jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
