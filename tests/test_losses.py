"""Golden tests: the jnp losses must match the reference's torch formulas
(viscoin/training/losses.py) evaluated with torch on the same inputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.train import losses as L  # noqa: E402


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture
def phi(rng):
    return rng.standard_normal((4, 8, 3, 3)).astype(np.float32)  # torch layout (B,K,3,3)


def test_entropy_loss(rng):
    v = rng.standard_normal((5, 7)).astype(np.float32)
    p = F.softmax(torch.from_numpy(v), dim=1)
    want = float(-torch.sum(p * torch.log(p)))
    got = float(L.entropy_loss(jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_cross_entropy(rng):
    a = rng.standard_normal((6, 9)).astype(np.float32)
    b = rng.standard_normal((6, 9)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    want = float((F.softmax(ta, 1).log() * -F.softmax(tb, 1)).sum(dim=1).mean())
    got = float(L.cross_cross_entropy_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_concept_regularization(phi):
    t = torch.from_numpy(phi)
    pooled = F.adaptive_max_pool2d(t, 1).flatten(1)
    normed = F.normalize(pooled, p=2, dim=1)
    want = float(F.l1_loss(normed, torch.zeros_like(normed))
                 + F.l1_loss(t, torch.zeros_like(t)))
    got = float(L.concept_regularization_loss(jnp.asarray(_nhwc(phi))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_conciseness_diversity(phi):
    t = torch.from_numpy(phi)
    pooled = F.adaptive_max_pool2d(t, 1).flatten(1)

    def ent(v):
        p = F.softmax(v, dim=1)
        return -torch.sum(p * torch.log(p))

    want = float(-ent(pooled.mean(dim=0).unsqueeze(0)) + ent(pooled)
                 + 1.0 * F.l1_loss(pooled, torch.zeros_like(pooled)))
    got = float(L.conciseness_diversity_loss(jnp.asarray(_nhwc(phi))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_concept_orthogonality(rng):
    # torch conv5 weight: (K, C, 1, 1); ours: HWIO (1, 1, C, K)
    w = rng.standard_normal((8, 24, 1, 1)).astype(np.float32)
    tw = torch.from_numpy(w).view(8, -1)
    normed = F.normalize(tw, dim=1).abs()
    want = float(((normed @ normed.T).sum() - 8) / 64)
    got = float(L.concept_orthogonality_loss(jnp.asarray(np.transpose(w, (2, 3, 1, 0)))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reconstruction_loss(rng):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    y = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    ca = rng.standard_normal((2, 5)).astype(np.float32)
    cb = rng.standard_normal((2, 5)).astype(np.float32)

    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    tca, tcb = torch.from_numpy(ca), torch.from_numpy(cb)
    fake_lpips = 0.37
    want = float(
        F.l1_loss(tx, ty) + F.mse_loss(tx, ty)
        + 0.1 * (F.softmax(tca, 1).log() * -F.softmax(tcb, 1)).sum(1).mean()
        + 3.0 * fake_lpips
    )
    got = float(L.reconstruction_loss(
        jnp.asarray(_nhwc(x)), jnp.asarray(_nhwc(y)),
        jnp.asarray(ca), jnp.asarray(cb),
        lpips_fn=lambda a, b: jnp.asarray(fake_lpips),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_output_fidelity(rng):
    a = rng.standard_normal((3, 6)).astype(np.float32)
    b = rng.standard_normal((3, 6)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    want = float((F.softmax(tb, 1).log() * -F.softmax(ta, 1)).sum(1).mean())
    got = float(L.output_fidelity_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gan_regularization(rng):
    ws = rng.standard_normal((2, 6, 16)).astype(np.float32)
    avg = rng.standard_normal((16,)).astype(np.float32)
    t = torch.from_numpy(ws)
    w_map = torch.from_numpy(avg).repeat(2, 6, 1)
    want = float(F.mse_loss(t, w_map))
    got = float(L.gan_regularization_loss(jnp.asarray(ws), jnp.asarray(avg)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_softmax_cross_entropy(rng):
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    want = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)))
    got = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("mode", ["none", "unpaired", "paired"])
def test_info_nce(rng, mode):
    q = rng.standard_normal((4, 12)).astype(np.float32)
    pk = rng.standard_normal((4, 12)).astype(np.float32)

    def tnorm(x):
        return F.normalize(torch.from_numpy(x), dim=-1)

    tq, tp = tnorm(q), tnorm(pk)
    if mode == "none":
        logits = tq @ tp.T
        labels = torch.arange(4)
        got = float(L.info_nce(jnp.asarray(q), jnp.asarray(pk)))
    elif mode == "unpaired":
        nk = rng.standard_normal((6, 12)).astype(np.float32)
        tn = tnorm(nk)
        pos = (tq * tp).sum(1, keepdim=True)
        logits = torch.cat([pos, tq @ tn.T], dim=1)
        labels = torch.zeros(4, dtype=torch.long)
        got = float(L.info_nce(jnp.asarray(q), jnp.asarray(pk), jnp.asarray(nk)))
    else:
        nk = rng.standard_normal((4, 6, 12)).astype(np.float32)
        tn = tnorm(nk)
        pos = (tq * tp).sum(1, keepdim=True)
        neg = (tq.unsqueeze(1) @ tn.transpose(-2, -1)).squeeze(1)
        logits = torch.cat([pos, neg], dim=1)
        labels = torch.zeros(4, dtype=torch.long)
        got = float(L.info_nce(jnp.asarray(q), jnp.asarray(pk), jnp.asarray(nk),
                               negative_mode="paired"))
    want = float(F.cross_entropy(logits / 0.1, labels))
    np.testing.assert_allclose(got, want, rtol=1e-4)
