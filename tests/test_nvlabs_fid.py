"""NVlabs-FID porting path (reference: viscoin/testing/viscoin.py:85-88 uses
the NVlabs TorchScript `inception-2015-12-05.pt` detector; the file is not
downloadable here — zero egress — so the tests fabricate a TorchScript export
with the same structure and the documented NVlabs preprocessing, mirroring
how test_port_nvlabs_pickle.py fabricates persistence pickles):

  * make_torchscript_fid_detector: bit-exact host wrapper of the file;
  * convert_torchscript_inception + nvlabs_fid_preprocess: weights ported
    into InceptionV3Features, self-verified by scripts/port_weights.py;
  * tf1_resize_bilinear: the TF1 (half_pixel_centers=False) convention the
    detector's internal resize uses, vs a direct numpy oracle."""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from test_inception_torch_twin import TwinInception  # noqa: E402
from viscoin_tpu.models.inception import (  # noqa: E402
    InceptionV3Features,
    make_torchscript_fid_detector,
    nvlabs_fid_preprocess,
    tf1_resize_bilinear,
)
from viscoin_tpu.utils.porting import convert_torchscript_inception  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


class FabricatedNvlabsDetector(nn.Module):
    """Stands in for inception-2015-12-05.pt: internal any-size resize to
    299² + (x−128)/128 scaling in front of the TF-graph-semantics feature
    network (the real detector accepts any input resolution). The resize
    here is torch bilinear (half-pixel); the port script treats 256²-input
    deviation from our TF1-convention resize as a WARNING, verifying
    exactly at 299² where both resizes are the identity."""

    def __init__(self):
        super().__init__()
        self.base = TwinInception()

    def forward(self, x):
        import torch.nn.functional as F_

        if x.shape[2] != 299 or x.shape[3] != 299:
            x = F_.interpolate(x, size=(299, 299), mode="bilinear",
                               align_corners=False)
        return self.base((x - 128.0) / 128.0)


@pytest.fixture(scope="module")
def fabricated_pt(tmp_path_factory):
    torch.manual_seed(0)
    det = FabricatedNvlabsDetector().eval()
    with torch.no_grad():
        for m in det.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    # Trace at a NON-299 size so the internal resize is captured in the
    # graph (trace bakes the branch; same-size bilinear is an exact
    # identity, so 299² inputs are unaffected).
    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        ts = torch.jit.trace(det, x)
    path = str(tmp_path_factory.mktemp("nvlabs") / "inception-fake.pt")
    ts.save(path)
    return path, det


def test_torchscript_wrapper_is_exact(fabricated_pt, rng):
    path, det = fabricated_pt
    detect = make_torchscript_fid_detector(path)
    x = rng.uniform(-2.1, 2.6, (2, 299, 299, 3)).astype(np.float32)
    got = detect(jnp.asarray(x))
    with torch.no_grad():
        want = det(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_torchscript_inception_parity(fabricated_pt, rng):
    """Ported weights + nvlabs preprocessing reproduce the TorchScript
    detector's features (the TPU-speed NVlabs-convention path)."""
    path, det = fabricated_pt
    mod = torch.jit.load(path).eval()
    variables = convert_torchscript_inception(mod)
    # TF-slim exports carry no BN scale; the fabricated twin has one — the
    # converter must pick it up (and default to ones when absent).
    assert variables["params"]["Conv2d_1a_3x3"]["bn"]["scale"].shape == (32,)

    x = rng.uniform(-2.1, 2.6, (2, 299, 299, 3)).astype(np.float32)
    model = InceptionV3Features()
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        nvlabs_fid_preprocess(jnp.asarray(x))))
    with torch.no_grad():
        want = det(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)


def test_port_script_self_verifies(fabricated_pt, tmp_path):
    """scripts/port_weights.py inception-nvlabs: converts, verifies against
    the TorchScript module, saves + writes the convention marker that
    _load_fid_detector dispatches on."""
    import port_weights

    path, _ = fabricated_pt
    dst = str(tmp_path / "inception-nvlabs")
    port_weights.port_inception_nvlabs(path, dst)
    assert os.path.isdir(dst)
    with open(os.path.join(dst, "fid_convention.json")) as f:
        assert json.load(f)["convention"] == "nvlabs"

    from viscoin_tpu.cli.train import _load_fid_detector

    detect = _load_fid_detector(dst)
    feats = detect(jnp.asarray(np.zeros((1, 299, 299, 3), np.float32)))
    assert np.asarray(feats).shape == (1, 2048)


def test_tf1_resize_bilinear_oracle(rng):
    """tf1_resize_bilinear == the legacy TF resize convention: source
    coordinate dst·(in/out), NO half-pixel shift, no antialias (what the
    TF1-graph detector traces internally). Checked against a direct numpy
    oracle, and distinct from jax.image.resize's convention."""
    import jax
    import jax.numpy as jnp_

    x = rng.normal(size=(2, 7, 11, 3)).astype(np.float32)
    out = np.asarray(tf1_resize_bilinear(jnp.asarray(x), 5))

    def oracle(img, size):
        H, W = img.shape[0], img.shape[1]
        res = np.zeros((size, size, img.shape[2]), np.float32)
        for i in range(size):
            sy = i * H / size
            y0, wy = int(np.floor(sy)), sy - int(np.floor(sy))
            y1 = min(y0 + 1, H - 1)
            for j in range(size):
                sx = j * W / size
                x0, wx = int(np.floor(sx)), sx - int(np.floor(sx))
                x1 = min(x0 + 1, W - 1)
                top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
                bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
                res[i, j] = top * (1 - wy) + bot * wy
        return res

    want = np.stack([oracle(x[b], 5) for b in range(2)])
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    jax_default = np.asarray(jax.image.resize(jnp_.asarray(x), (2, 5, 5, 3),
                                              "bilinear"))
    assert np.abs(jax_default - want).max() > 1e-3  # different convention

    # identity at matching size (the port script's 299² verification relies
    # on this)
    y = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(tf1_resize_bilinear(jnp.asarray(y), 5)), y)
