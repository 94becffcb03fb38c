"""LPIPS parity against a torch twin of the pip-`lpips` VGG pipeline
(random weights; architecture + math parity, since pretrained weights need
network access)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.lpips import LPIPS  # noqa: E402
from viscoin_tpu.utils.porting import convert_torch_lpips, state_dict_to_numpy  # noqa: E402

# torchvision vgg16 'D' feature layer list: (conv_out or 'M')
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_SLICE_BOUNDS = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]


def _build_vgg_features():
    layers = []
    in_ch = 3
    for v in _CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = v
    return torch.nn.Sequential(*layers)


class _TorchLPIPS(torch.nn.Module):
    """Twin of lpips.LPIPS(net='vgg', version='0.1') with random weights."""

    def __init__(self):
        super().__init__()
        feats = _build_vgg_features()
        self.net = torch.nn.Module()
        # Real lpips keeps the ORIGINAL torchvision feature indices as module
        # names inside each slice (lpips/pretrained_networks.py) — replicate.
        for i, (lo, hi) in enumerate(_SLICE_BOUNDS, start=1):
            slice_mod = torch.nn.Sequential()
            for li in range(lo, hi):
                slice_mod.add_module(str(li), feats[li])
            setattr(self.net, f"slice{i}", slice_mod)
        chans = [64, 128, 256, 512, 512]
        for i, c in enumerate(chans):
            # Real lpips NetLinLayer: self.model = Sequential(Dropout, Conv2d)
            # → state-dict keys "lin{i}.model.1.weight".
            lin = torch.nn.Module()
            lin.model = torch.nn.Sequential(torch.nn.Dropout(), torch.nn.Conv2d(c, 1, 1, bias=False))
            torch.nn.init.uniform_(lin.model[1].weight, 0, 1)
            setattr(self, f"lin{i}", lin)
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def forward(self, x, y):
        def feats(z):
            z = (z - self.shift) / self.scale
            outs = []
            for i in range(1, 6):
                z = getattr(self.net, f"slice{i}")(z)
                outs.append(z)
            return outs

        def unit(z):
            return z / (torch.sqrt((z**2).sum(1, keepdim=True)) + 1e-10)

        total = 0
        for i, (a, b) in enumerate(zip(feats(x), feats(y))):
            d = (unit(a) - unit(b)) ** 2
            total = total + getattr(self, f"lin{i}").model(d).mean(dim=(2, 3)).squeeze(1)
        return total


def test_lpips_parity(rng):
    torch.manual_seed(0)
    tm = _TorchLPIPS().eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    y = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    sd = state_dict_to_numpy(tm.state_dict())
    params = convert_torch_lpips(sd)
    model = LPIPS()
    got = model.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_lpips_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    model = LPIPS()
    v = model.init(jax.random.PRNGKey(0), x, x)
    d = model.apply(v, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    model = LPIPS()
    v = model.init(jax.random.PRNGKey(0), x, y)

    g = jax.grad(lambda a: jnp.sum(model.apply(v, a, y)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_lpips_fold_block12_exact():
    """Space-to-batch folding of the VGG block-1/2 prefix (overlap-save halo
    accounting, ops/space_to_batch.py) is numerically equivalent for values
    AND input gradients — same params, same distance."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.models.lpips import LPIPS

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    base = LPIPS()
    folded = LPIPS(fold_block12=True)
    params = base.init(jax.random.PRNGKey(0), x, y)["params"]

    d0, g0 = jax.value_and_grad(
        lambda x: jnp.sum(base.apply({"params": params}, x, y)))(x)
    d1, g1 = jax.value_and_grad(
        lambda x: jnp.sum(folded.apply({"params": params}, x, y)))(x)
    np.testing.assert_allclose(float(d1), float(d0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_fold_unfold_h_roundtrip_and_halo():
    """fold_h/unfold_h invert each other, and the halo rows carry the true
    neighbor data (overlap-save): the bottom tile's first halo row equals the
    image row h/2 - halo."""
    import jax.numpy as jnp

    from viscoin_tpu.ops.space_to_batch import fold_h, unfold_h

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 32, 8, 2)), jnp.float32)
    f = fold_h(x, 4)
    assert f.shape == (6, 24, 8, 2)
    np.testing.assert_array_equal(np.asarray(unfold_h(f, 4)), np.asarray(x))
    # top tile's outer halo is zero padding (SAME semantics) ...
    assert np.all(np.asarray(f[:3, :4]) == 0)
    # ... and the interior halos are real overlap
    np.testing.assert_array_equal(np.asarray(f[3:, :4]),
                                  np.asarray(x[:, 12:16]))
