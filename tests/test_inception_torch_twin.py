"""Independent torch twin of the InceptionV3 FID feature extractor
(pytorch-fid convention: torchvision layout, avg pools with
count_include_pad=False, and Mixed_7c's branch pool is a MAX pool — the
TF-slim quirk pytorch-fid reproduces). Converts the twin's random weights
through `convert_torch_inception` and asserts the 2048-d features agree, so
ported pytorch-fid/torchvision checkpoints produce the intended FID features.
Replaces "structural-only" evidence for the reference's downloaded detector
(viscoin/testing/viscoin.py:85-88)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from viscoin_tpu.models.inception import InceptionV3Features  # noqa: E402
from viscoin_tpu.utils.porting import (  # noqa: E402
    convert_torch_inception,
    state_dict_to_numpy,
)


class BC(nn.Module):  # torchvision BasicConv2d
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):  # pytorch-fid average pool
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class A(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BC(cin, 64, 1)
        self.branch5x5_1 = BC(cin, 48, 1)
        self.branch5x5_2 = BC(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, padding=1)
        self.branch_pool = BC(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x)),
        ], 1)


class B(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BC(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class C(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BC(cin, 192, 1)
        self.branch7x7_1 = BC(cin, c7, 1)
        self.branch7x7_2 = BC(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = BC(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, 1)
        self.branch7x7dbl_2 = BC(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class D(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, 1)
        self.branch3x3_2 = BC(192, 320, 3, stride=2)
        self.branch7x7x3_1 = BC(cin, 192, 1)
        self.branch7x7x3_2 = BC(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, 3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                          F.max_pool2d(x, 3, stride=2)], 1)


class E(nn.Module):
    def __init__(self, cin, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BC(cin, 320, 1)
        self.branch3x3_1 = BC(cin, 384, 1)
        self.branch3x3_2a = BC(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = BC(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, 1)
        self.branch3x3dbl_2 = BC(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = BC(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (_avg(x) if self.pool == "avg"
              else F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TwinInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = BC(32, 32, 3)
        self.Conv2d_2b_3x3 = BC(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = BC(64, 80, 1)
        self.Conv2d_4a_3x3 = BC(80, 192, 3)
        self.Mixed_5b = A(192, 32)
        self.Mixed_5c = A(256, 64)
        self.Mixed_5d = A(288, 64)
        self.Mixed_6a = B(288)
        self.Mixed_6b = C(768, 128)
        self.Mixed_6c = C(768, 160)
        self.Mixed_6d = C(768, 160)
        self.Mixed_6e = C(768, 192)
        self.Mixed_7a = D(768)
        self.Mixed_7b = E(1280, "avg")
        self.Mixed_7c = E(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def test_inception_fid_features_match_torch_twin():
    torch.manual_seed(0)
    twin = TwinInception().eval()
    # realistic BN running stats (random, positive variance)
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        want = twin.double()(torch.from_numpy(x).double()).numpy()
        twin = twin.float()  # back to fp32 for the state-dict export

    variables = convert_torch_inception(state_dict_to_numpy(twin.state_dict()))
    model = InceptionV3Features()
    got = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert got.shape == (2, 2048)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                               atol=2e-4 * scale)
