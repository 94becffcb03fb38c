"""Training-DYNAMICS twin tests (the missing leg of the 1%-parity target).

The module-forward parity suite (ResNet/Psi/Theta/mapping/synthesis/LPIPS
twins) proves single forwards match; the loss golden tests prove formulas
match. These tests close the loop at the level that actually produces
checkpoints:

* ``test_classifier_training_trajectory_matches_torch_twin`` — drives the
  REAL ``train_classifier`` (reference: viscoin/training/classifiers.py:
  59-120 — Adam + StepLR(30, 0.1), per-batch CE, per-epoch eval) for 65
  one-batch epochs against an independent torch twin (HF ResNetModel + head,
  torch.optim.Adam + StepLR) from ported-equal inits on identical data, and
  requires the per-epoch train-loss CURVES to agree to fp tolerance —
  including across BOTH lr-decay boundaries (epochs 30 and 60).

* ``test_viscoin_step_gradients_match_torch_twin`` — composes the existing
  torch twins (classifier, Psi, Theta, adapted mapping, synthesis, LPIPS)
  into the full six-term VisCoIN objective (reference: viscoin/training/
  viscoin.py:163-215) in float64 torch autograd, and requires THIS
  framework's step gradients (``jax.grad`` of ``make_loss_fn`` — exactly
  what ``make_train_step`` differentiates) to match for every trainable
  leaf: Psi, Theta, and the adapted mapping incl. ``fixed_w_avg``.

* ``test_concept2clip_training_trajectory_matches_torch_twin`` — the MSE
  regression trainer trajectory-twinned the same way (identical shuffle
  stream, Adam, the reference's /batch_size loss accounting) — with it all
  FOUR trainers are dynamics-twinned.

* ``test_gan_step_gradients_match_torch_twin`` — the same treatment for the
  in-framework GAN trainer (``make_gan_loss_fns``): non-saturating G loss
  with style mixing, D loss with the lazy R1 second-order penalty, and the
  path-length penalty with NVlabs' NON-detached pl_mean — plus a
  sensitivity check that detaching pl_mean (dropping the -2·decay/B cross
  term) makes the gradients measurably different.

Determinism bridges: the twins replay the step's rng chain (flip keys), and
the explainer's dropout mask is extracted from the flax side via
``capture_intermediates`` (flax ``nn.Dropout`` is a submodule, so its output
is capturable; the mask depends only on the rng + shape, not the input).
The synthesis noise path is neutralized structurally: ``noise_strength`` is
zero in the crafted checkpoint (the NVlabs init), so ``noise_mode="random"``
contributes nothing to values or to the compared gradients.
"""

import json
import logging
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from viscoin_tpu.models.concept_extractor import ConceptExtractor  # noqa: E402
from viscoin_tpu.models.explainer import Explainer  # noqa: E402
from viscoin_tpu.models.lpips import LPIPS  # noqa: E402
from viscoin_tpu.models.resnet import Classifier  # noqa: E402
from viscoin_tpu.models.stylegan import GeneratorAdapted  # noqa: E402
from viscoin_tpu.utils.porting import (  # noqa: E402
    convert_torch_classifier,
    convert_torch_concept_extractor,
    convert_torch_explainer,
    convert_torch_generator_adapted,
    state_dict_to_numpy,
)

HS = (8, 16, 32, 64)  # tiny ResNet stage widths (same shapes as the dryrun)


class _TorchTinyClassifier(torch.nn.Module):
    """Torch twin of the reference Classifier at a tiny ResNet config
    (reference: viscoin/models/classifiers.py:52-66)."""

    def __init__(self, n_classes):
        super().__init__()
        config = transformers.ResNetConfig(
            embedding_size=8, hidden_sizes=list(HS), depths=[1, 1, 1, 1])
        self.resnet = transformers.ResNetModel(config)
        self.linear = torch.nn.Linear(HS[-1], n_classes)

    def forward(self, x):
        out = self.resnet(x, output_hidden_states=True)
        return self.linear(out["pooler_output"].flatten(1)), out["hidden_states"]


def test_classifier_training_trajectory_matches_torch_twin(tmp_path):
    """65 one-batch epochs of train_classifier vs the torch twin trainer:
    per-epoch train-loss curves agree across both StepLR(30, 0.1) drops."""
    from viscoin_tpu.data.datasets import SyntheticDataset
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.train.classifiers import (
        ClassifierTrainingParams,
        train_classifier,
    )
    from viscoin_tpu.utils.logging import configure_score_logging

    C, B, IMG, EPOCHS, SEED = 5, 4, 32, 65, 11
    torch.manual_seed(0)
    tmodel = _TorchTinyClassifier(C)
    variables = convert_torch_classifier(
        state_dict_to_numpy(tmodel.state_dict()))
    classifier = Classifier(output_classes=C, embedding_size=8,
                            hidden_sizes=HS, depths=(1, 1, 1, 1))

    def loaders():
        # n == batch_size -> exactly one batch per epoch, so StepLR's
        # 30-epoch boundaries land on steps 30/60 in both frameworks.
        train_ds = SyntheticDataset(n=B, n_classes=C, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=B, n_classes=C, image_size=IMG,
                                   mode="test")
        return (DataLoader(train_ds, batch_size=B, num_threads=0),
                DataLoader(test_ds, batch_size=B, shuffle=False,
                           num_threads=0))

    # --- this framework ---
    log_path = str(tmp_path / "classifier.jsonl")
    configure_score_logging(log_path)
    train_loader, test_loader = loaders()
    cfg = ClassifierTrainingParams(epochs=EPOCHS, learning_rate=1e-3,
                                   batch_size=B)
    train_classifier(classifier, variables, train_loader, test_loader, cfg,
                     seed=SEED)
    logging.shutdown()
    ours = [json.loads(line)["train_loss"] for line in open(log_path)]
    assert len(ours) == EPOCHS

    # --- torch twin: same data (a fresh loader pair replays the identical
    # (seed, epoch)-pure shuffle + augmentation stream), same flip keys,
    # same preprocessing (computed via the framework's device_preprocess and
    # handed over — input parity is proven elsewhere; this test is about the
    # optimizer/schedule/BN dynamics) ---
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=30, gamma=0.1)
    twin_loader, _ = loaders()
    rng = jax.random.PRNGKey(SEED)
    theirs = []
    for _ in range(EPOCHS):
        for images, labels in twin_loader:
            rng, k = jax.random.split(rng)
            flips = jax.random.bernoulli(k, 0.5, (images.shape[0],))
            x = device_preprocess(jnp.asarray(images), flips)
            x_t = torch.from_numpy(
                np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())
            logits, _ = tmodel(x_t)
            loss = F.cross_entropy(
                logits, torch.from_numpy(labels.astype(np.int64)))
            opt.zero_grad()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))
        sched.step()

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # Measured divergence profile (fp32, XLA-CPU oneDNN convs vs torch):
    # ~3e-5 rel over the first 10 epochs and ~1.6e-4 through epoch 20, then
    # CHAOTIC compounding (4-sample set, lr 1e-3) whose tail amplitude
    # varies run to run (XLA's oneDNN path warns its reduction orders are
    # not run-deterministic; observed tail max 3-12% across runs). The
    # dynamics-parity evidence is the exact 20-step tracking; the tail is
    # held statistically — a wrong optimizer/schedule/BN detail blows BOTH
    # (e.g. a missed lr drop leaves the tail bouncing at full-lr amplitude:
    # orders of magnitude in mean relative error, not percent).
    np.testing.assert_allclose(ours[:20], theirs[:20], rtol=1e-3, atol=1e-4)
    rel = np.abs(ours - theirs) / np.maximum(np.abs(theirs), 1e-8)
    # The MEAN is the discriminative statistic (observed 0.5-1%; a wrong
    # optimizer/schedule/BN detail is orders of magnitude). Individual tail
    # elements are chaotic with run-varying amplitude (observed max 3-12%
    # across runs) — bound them loosely so nondeterministic reduction
    # orders can't flake the test.
    assert rel.mean() < 0.05, f"curves no longer track: mean rel {rel.mean():.3f}"
    assert rel.max() < 0.60, f"curves no longer track: max rel {rel.max():.3f}"
    # both lr drops landed: the post-drop tail tracks too
    assert rel[60:].mean() < 0.10, f"post-drop tail diverges: {rel[60:].mean():.3f}"


# ---------------------------------------------------------------------------
# (b) one full VisCoIN ensemble step: gradient parity vs a float64 torch twin
# ---------------------------------------------------------------------------


class _TorchPsiTiny(torch.nn.Module):
    """Torch twin of the tiny ConceptExtractor (reference:
    concept_extractors.py:41-141; mirrors tests/test_concept_models_parity)."""

    def __init__(self, n_concepts=8, lc=8, c1=16, c2=32, c3=64):
        super().__init__()
        self.n_concepts, self.lc = n_concepts, lc
        self.conv1 = torch.nn.Conv2d(c1, lc, 5, padding=2, stride=4)
        self.conv2 = torch.nn.Conv2d(c2, lc, 3, padding=1, stride=2)
        self.conv3 = torch.nn.Conv2d(c3, lc, 3, padding=1, stride=1)
        self.conv4 = torch.nn.Conv2d(3 * lc, 3 * lc, 3, padding=1)
        self.conv5 = torch.nn.Conv2d(3 * lc, n_concepts, 1)
        self.linear1 = torch.nn.Linear(lc * 3 * 9, 9 * n_concepts)
        self.linear2 = torch.nn.Linear(9 * n_concepts, 9 * n_concepts,
                                       bias=False)

    def forward(self, layers):
        a = F.relu(self.conv1(layers[0]))
        b = F.relu(self.conv2(layers[1]))
        c = F.relu(self.conv3(layers[2]))
        x = F.relu(self.conv4(torch.cat([a, b, c], 1)))
        phi = F.adaptive_avg_pool2d(F.relu(self.conv5(x)), 3)
        y = F.adaptive_avg_pool2d(x, 3).reshape(-1, self.lc * 3 * 9)
        y = F.relu(self.linear2(F.relu(self.linear1(y))))
        return phi, y


class _TorchFC(torch.nn.Module):
    """Equalized-LR FC (NVlabs FullyConnectedLayer twin)."""

    def __init__(self, in_f, out_f, lr_multiplier=0.01):
        super().__init__()
        self.weight = torch.nn.Parameter(
            torch.randn(out_f, in_f) / lr_multiplier)
        self.bias = torch.nn.Parameter(torch.zeros(out_f))
        self.weight_gain = lr_multiplier / math.sqrt(in_f)
        self.bias_gain = lr_multiplier

    def forward(self, x):
        x = x @ (self.weight * self.weight_gain).t() + self.bias * self.bias_gain
        return F.leaky_relu(x, 0.2) * math.sqrt(2.0)


class _TorchAdaptedMapping(torch.nn.Module):
    """Twin of MappingNetworkAdapted (reference: gan.py:147-234)."""

    def __init__(self, z1_dim, z2_dim, w_dim, num_ws, coarse, mid):
        super().__init__()
        self.num_ws, self.coarse, self.mid = num_ws, coarse, mid
        self.fixed_w_avg = torch.nn.Parameter(torch.zeros(w_dim))
        for i in range(num_ws):
            dim = z1_dim if coarse <= i <= mid else z2_dim
            setattr(self, f"s{i}",
                    torch.nn.Sequential(_TorchFC(dim, w_dim)))

    def forward(self, z1, z2):
        def norm(z):
            return z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True)
                                   + 1e-8)

        x1, x2 = norm(z1), norm(z2)
        styles = [getattr(self, f"s{i}")(
            x1 if self.coarse <= i <= self.mid else x2)
            for i in range(self.num_ws)]
        ws = torch.stack(styles, dim=1)
        return ws + self.fixed_w_avg[None, None, :]


def _torch_losses(classes, expl, phi, conv5_w, rebuilt, all_images,
                  rebuilt_classes, ws, fixed_w_avg, lpips, labels, cfg, B):
    """The six-term objective in torch (reference: training/viscoin.py:
    181-215 formulas; all reductions float64)."""

    def cross_ce(pred, target):
        return torch.mean(torch.sum(
            -F.softmax(target, dim=1) * F.log_softmax(pred, dim=1), dim=1))

    acc = F.cross_entropy(classes[:B], labels)

    pooled = phi.amax(dim=(2, 3))  # NCHW: max over the 3x3 map
    normed = pooled / torch.clamp(
        torch.linalg.norm(pooled, dim=1, keepdim=True), min=1e-12)
    cr = cfg.delta * (normed.abs().mean() + phi.abs().mean())

    of = cfg.alpha * cross_ce(expl, classes.detach())

    w = conv5_w.reshape(conv5_w.shape[0], -1)
    w = (w / torch.clamp(torch.linalg.norm(w, dim=1, keepdim=True),
                         min=1e-12)).abs()
    ortho = (torch.sum(w @ w.t()) - w.shape[0]) / w.shape[0] ** 2

    diff = rebuilt - all_images
    rec = (diff.abs().mean() + diff.square().mean()
           + cfg.gamma * cross_ce(rebuilt_classes, classes.detach())
           + cfg.beta * lpips(rebuilt, all_images).mean())

    target = fixed_w_avg.detach()[None, None, :].expand_as(ws)
    gan = torch.mean((ws - target) ** 2)
    return acc + cr + of + ortho + rec + gan


def test_viscoin_step_gradients_match_torch_twin():
    """jax.grad of the step's loss_fn == float64 torch autograd through the
    composed twins, for every trainable leaf (Psi, Theta, mapping)."""
    import test_synthesis_torch_twin as syn_twin
    from test_lpips_parity import _TorchLPIPS
    from viscoin_tpu.models.bundle import VisCoINModels
    from viscoin_tpu.train.viscoin import (
        VisCoINTrainingParams,
        make_frozen,
        make_loss_fn,
    )
    from viscoin_tpu.utils.porting import convert_torch_lpips

    # 64² (not 32²): at 32² the tiny ResNet's last stage is 1x1, so the
    # adaptive pool REPLICATES every concept map to a constant 3x3 — the
    # explainer's max-pool then has 9-way ties everywhere and its
    # subgradient becomes an implementation choice, not math.
    IMG, NC, NK, B = 64, 4, 8, 2
    rng_np = np.random.default_rng(0)
    torch.manual_seed(0)

    # --- torch modules (source of truth for the weights) ---
    class _TorchTheta(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = torch.nn.Linear(NK, NC)

        def forward(self, pooled):
            return self.linear(pooled)

    tclf = _TorchTinyClassifier(NC).double().eval()
    tpsi = _TorchPsiTiny().double()
    ttheta = _TorchTheta().double()
    num_ws = 2 * int(math.log2(IMG)) - 2
    tmap = _TorchAdaptedMapping(9 * NK, 9 * NK, 32, num_ws, 2, 10).double()
    tlpips = _TorchLPIPS().double().eval()

    def channels(res):
        return min(256 // res, 16)

    syn_sd = syn_twin.random_state_dict(rng_np, IMG, channels)
    for k in list(syn_sd):
        if k.endswith("noise_strength"):
            # NVlabs init: zero noise strength -> noise_mode="random"
            # contributes nothing to values or to the compared grads.
            syn_sd[k] = torch.zeros_like(syn_sd[k])

    # --- port every weight into the framework ---
    clf_vars = convert_torch_classifier(state_dict_to_numpy(tclf.state_dict()))
    psi_params = convert_torch_concept_extractor(
        state_dict_to_numpy(tpsi.state_dict()))
    theta_params = convert_torch_explainer(
        state_dict_to_numpy(ttheta.state_dict()))
    gan_sd = {f"mapping.{k}": v for k, v in
              state_dict_to_numpy(tmap.state_dict()).items()}
    gan_sd.update({f"synthesis.{k}": v.numpy() for k, v in syn_sd.items()})
    gan_vars = convert_torch_generator_adapted(gan_sd, img_resolution=IMG)
    lpips_params = convert_torch_lpips(state_dict_to_numpy(tlpips.state_dict()))

    models = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=HS, depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16,
                                           input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
        classifier_vars=clf_vars,
        concept_params=psi_params,
        explainer_params=theta_params,
        gan_vars=gan_vars,
    )

    cfg = VisCoINTrainingParams(batch_size=B, cd_fid_iteration=-1)
    lpips = LPIPS()
    frozen = make_frozen(models, {"params": {}}, lpips_params)

    real = rng_np.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    fake = rng_np.standard_normal((B, IMG, IMG, 3)).astype(np.float32)
    labels = rng_np.integers(0, NC, B).astype(np.int32)
    step_rng = jax.random.PRNGKey(5)

    # --- framework gradients: exactly what make_train_step differentiates ---
    params = {"concept_extractor": models.concept_params,
              "explainer": models.explainer_params,
              "mapping": models.gan_vars["params"]["mapping"]}
    loss_fn = make_loss_fn(models, None, lpips, cfg)
    (total_j, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, frozen, jnp.asarray(real), jnp.asarray(labels),
        jnp.int32(0), step_rng, jnp.asarray(fake))

    # --- extract the explainer's dropout mask from the flax side ---
    # (shape+rng-determined; replayed on a ones tensor so mask == 0.99*out)
    _, _, _, k_drop = jax.random.split(step_rng, 4)
    ones = jnp.ones((2 * B, 3, 3, NK))
    _, inter = models.explainer.apply(
        {"params": models.explainer_params}, ones, train=True,
        rngs={"dropout": k_drop}, capture_intermediates=True)
    drop_out = jax.tree_util.tree_leaves(
        inter["intermediates"]["Dropout_0"])[0]
    mask = np.asarray(drop_out) > 0  # (2B, 3, 3, NK) NHWC

    # --- torch twin: same images, same losses, float64 autograd ---
    for p in list(tclf.parameters()) + list(tlpips.parameters()):
        p.requires_grad_(False)
    all_np = np.concatenate([real, fake], axis=0)
    all_t = torch.from_numpy(
        np.transpose(all_np, (0, 3, 1, 2)).copy()).double()
    labels_t = torch.from_numpy(labels.astype(np.int64))

    classes, hidden = tclf(all_t)
    phi, phi_prime = tpsi(list(hidden[-3:]))
    mask_t = torch.from_numpy(
        np.transpose(mask, (0, 3, 1, 2)).copy()).double()
    dropped = phi * mask_t / 0.99
    expl = ttheta(dropped.amax(dim=(2, 3)))
    ws = tmap(phi.flatten(1), phi_prime)
    syn_sd_grad = dict(syn_sd)  # frozen synthesis: plain tensors, no grads
    rebuilt = syn_twin.synthesis_t(ws, syn_sd_grad, IMG, channels)
    rebuilt_nchw = rebuilt
    rebuilt_classes, _ = tclf(rebuilt_nchw)
    total_t = _torch_losses(
        classes, expl, phi, tpsi.conv5.weight, rebuilt_nchw, all_t,
        rebuilt_classes, ws, tmap.fixed_w_avg, tlpips, labels_t, cfg, B)
    total_t.backward()

    np.testing.assert_allclose(float(total_j), float(total_t.detach()),
                               rtol=1e-4,
                               err_msg="total loss diverges from the twin")

    # --- compare every trainable leaf; torch grads ride the same layout
    # converters as the weights (they are transpose/reshape-only) ---
    def grad_sd(module):
        return {k: p.grad.numpy() if p.grad is not None else np.zeros(p.shape)
                for k, p in module.named_parameters()}

    want_psi = convert_torch_concept_extractor(grad_sd(tpsi))
    want_theta = convert_torch_explainer(grad_sd(ttheta))
    want_map = convert_torch_generator_adapted(
        {**{f"mapping.{k}": v for k, v in grad_sd(tmap).items()},
         **{f"synthesis.{k}": np.zeros(v.shape) for k, v in syn_sd.items()}},
        img_resolution=IMG)["params"]["mapping"]

    def check(got_tree, want_tree, name):
        got_l, want_l = (jax.tree_util.tree_leaves(t)
                         for t in (got_tree, want_tree))
        assert len(got_l) == len(want_l)
        paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(got_tree)[0]]
        for path, g, w in zip(paths, got_l, want_l):
            g, w = np.asarray(g, np.float64), np.asarray(w, np.float64)
            scale = max(np.abs(w).max(), 1e-12)
            np.testing.assert_allclose(
                g, w, rtol=5e-3, atol=5e-4 * scale,
                err_msg=f"{name}{path}: step gradient diverges from twin")

    check(grads["concept_extractor"], want_psi, "psi")
    check(grads["explainer"], want_theta, "theta")
    check(grads["mapping"], want_map, "mapping")


# ---------------------------------------------------------------------------
# (c) the in-framework GAN trainer: gradient parity of the full objective,
#     including both SECOND-ORDER terms (R1; PPL with its non-detached
#     pl_mean cross term), vs float64 torch double-backward
# ---------------------------------------------------------------------------


def _torch_mapping(z, sd, num_layers, num_ws, lr_mult=0.01):
    """NVlabs MappingNetwork twin: normalize_2nd_moment + equalized-LR
    lrelu FCs, broadcast to num_ws (reference: networks.py)."""
    x = z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True) + 1e-8)
    for i in range(num_layers):
        w, b = sd[f"mapping.fc{i}.weight"], sd[f"mapping.fc{i}.bias"]
        x = x @ (w * (lr_mult / math.sqrt(w.shape[1]))).t() + b * lr_mult
        x = F.leaky_relu(x, 0.2) * math.sqrt(2.0)
    return x[:, None, :].repeat(1, num_ws, 1)


def test_gan_step_gradients_match_torch_twin():
    """jax.grad of the GAN step's loss fns (make_gan_loss_fns — exactly what
    make_gan_train_step differentiates) == float64 torch autograd through
    the composed mapping/synthesis/discriminator twins, for the
    non-saturating G loss WITH style mixing, the D loss WITH the lazy R1
    second-order penalty, and the path-length penalty WITH NVlabs'
    non-detached pl_mean (the -2·decay/B cross term a detach would drop)."""
    import test_discriminator_torch_twin as d_twin
    import test_synthesis_torch_twin as syn_twin
    from viscoin_tpu.models.stylegan import Discriminator, Generator
    from viscoin_tpu.train.gan import GANTrainingParams, make_gan_loss_fns
    from viscoin_tpu.utils.porting import (
        convert_torch_discriminator,
        convert_torch_generator,
    )

    R, B, ZD, WD, NL = 16, 4, 16, 32, 2
    cbase, cmax = 256, 32
    num_ws = 2 * int(math.log2(R)) - 2
    rng_np = np.random.default_rng(3)

    def channels(res):
        return min(cbase // res, cmax)

    # --- weights (float64 torch is the source of truth) ---
    syn_sd = syn_twin.random_state_dict(rng_np, R, channels)
    for k in list(syn_sd):
        if k.endswith("noise_strength"):
            syn_sd[k] = torch.zeros_like(syn_sd[k])  # neutralize noise_mode
    g_sd = {f"synthesis.{k}": v.clone() for k, v in syn_sd.items()}
    for i in range(NL):
        fin = ZD if i == 0 else WD
        g_sd[f"mapping.fc{i}.weight"] = torch.as_tensor(
            rng_np.standard_normal((WD, fin)) * 100.0)  # /lr_mult init scale
        g_sd[f"mapping.fc{i}.bias"] = torch.as_tensor(
            rng_np.standard_normal(WD) * 0.1)

    d_sd = {}
    resolutions = [2 ** i for i in range(int(math.log2(R)), 2, -1)]
    for i, res in enumerate(resolutions):
        tmp, out = channels(res), channels(res // 2)
        if i == 0:
            d_sd[f"b{res}.fromrgb.weight"] = torch.as_tensor(
                rng_np.standard_normal((tmp, 3, 1, 1)))
            d_sd[f"b{res}.fromrgb.bias"] = torch.as_tensor(
                rng_np.standard_normal(tmp) * 0.1)
        d_sd[f"b{res}.conv0.weight"] = torch.as_tensor(
            rng_np.standard_normal((tmp, tmp, 3, 3)))
        d_sd[f"b{res}.conv0.bias"] = torch.as_tensor(
            rng_np.standard_normal(tmp) * 0.1)
        d_sd[f"b{res}.conv1.weight"] = torch.as_tensor(
            rng_np.standard_normal((out, tmp, 3, 3)))
        d_sd[f"b{res}.conv1.bias"] = torch.as_tensor(
            rng_np.standard_normal(out) * 0.1)
        d_sd[f"b{res}.skip.weight"] = torch.as_tensor(
            rng_np.standard_normal((out, tmp, 1, 1)))
    c4 = channels(4)
    d_sd["b4.conv.weight"] = torch.as_tensor(
        rng_np.standard_normal((c4, c4 + 1, 3, 3)))
    d_sd["b4.conv.bias"] = torch.as_tensor(rng_np.standard_normal(c4) * 0.1)
    d_sd["b4.fc.weight"] = torch.as_tensor(
        rng_np.standard_normal((c4, c4 * 16)))
    d_sd["b4.fc.bias"] = torch.as_tensor(rng_np.standard_normal(c4) * 0.1)
    d_sd["b4.out.weight"] = torch.as_tensor(rng_np.standard_normal((1, c4)))
    d_sd["b4.out.bias"] = torch.as_tensor(rng_np.standard_normal(1) * 0.1)
    g_sd = {k: v.double() for k, v in g_sd.items()}
    d_sd = {k: v.double() for k, v in d_sd.items()}

    # --- port into the framework ---
    gvars = convert_torch_generator(
        {k: v.numpy().astype(np.float32) for k, v in g_sd.items()},
        img_resolution=R)
    g_params, g_extras = gvars["params"], {
        "noise": gvars["noise"], "moving_stats": gvars["moving_stats"]}
    d_params = convert_torch_discriminator(
        {k: v.numpy().astype(np.float32) for k, v in d_sd.items()}, R)

    generator = Generator(z_dim=ZD, w_dim=WD, img_resolution=R,
                          channel_base=cbase, channel_max=cmax,
                          mapping_layers=NL)
    discriminator = Discriminator(img_resolution=R, channel_base=cbase,
                                  channel_max=cmax)
    cfg = GANTrainingParams(batch_size=B, augment="none",
                            compute_dtype="float32")
    fns = make_gan_loss_fns(generator, discriminator, cfg)

    # --- shared inputs ---
    z = rng_np.standard_normal((B, ZD)).astype(np.float32)
    z_mix = rng_np.standard_normal((B, ZD)).astype(np.float32)
    real = np.clip(rng_np.standard_normal((B, R, R, 3)), -1, 1).astype(
        np.float32)
    cutoff = 3  # fixed: mixing ACTIVE (layers >= 3 take z_mix styles)
    k_noise, k_aug, k_pl = jax.random.split(jax.random.PRNGKey(9), 3)
    pl_mean0 = 0.37

    def mixed_torch(gs):
        ws = _torch_mapping(torch.from_numpy(z).double(), gs, NL, num_ws)
        ws_mix = _torch_mapping(torch.from_numpy(z_mix).double(), gs, NL,
                                num_ws)
        layer = torch.arange(num_ws)[None, :, None]
        return torch.where(layer >= cutoff, ws_mix, ws)

    def grad_sd(sd):
        return {k: (v.grad.numpy() if v.grad is not None
                    else np.zeros(v.shape)) for k, v in sd.items()}

    def check_g(got, g_sd_grads, label):
        want = convert_torch_generator(g_sd_grads, img_resolution=R)["params"]
        flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        for (pg, gleaf), (pw, wleaf) in zip(flat_g, flat_w):
            path = jax.tree_util.keystr(pg)
            assert path == jax.tree_util.keystr(pw)
            if "noise_strength" in path:
                continue  # jax draws random noise, the twin uses const
            g_, w_ = np.asarray(gleaf, np.float64), np.asarray(wleaf,
                                                              np.float64)
            scale = max(np.abs(w_).max(), 1e-10)
            np.testing.assert_allclose(
                g_, w_, rtol=5e-3, atol=1e-4 * scale,
                err_msg=f"{label}{path} diverges from the torch twin")

    # ---------------- G loss (non-saturating, style-mixed) ----------------
    (g_loss_j, _), grads_g = jax.value_and_grad(
        fns["g_loss_fn"], has_aux=True)(
        g_params, g_extras, d_params, jnp.asarray(z), jnp.asarray(z_mix),
        jnp.int32(cutoff), k_noise, jnp.float32(0.0), k_aug)

    gs = {k: v.clone().requires_grad_(True) for k, v in g_sd.items()}
    fake = syn_twin.synthesis_t(mixed_torch(gs),
                                {k[len("synthesis."):]: v
                                 for k, v in gs.items()
                                 if k.startswith("synthesis.")}, R, channels)
    logits = d_twin.discriminator_t(fake, d_sd, R, channels, mbstd_group=4)
    g_loss_t = torch.mean(F.softplus(-logits))
    g_loss_t.backward()
    np.testing.assert_allclose(float(g_loss_j), float(g_loss_t.detach()),
                               rtol=1e-4)
    check_g(grads_g, grad_sd(gs), "g_loss/")

    # ------------- D loss with the lazy R1 second-order penalty -------------
    (d_loss_j, (r1_j, _)), grads_d = jax.value_and_grad(
        fns["d_loss_fn"], has_aux=True)(
        d_params, g_params, g_extras, jnp.asarray(real), jnp.asarray(z),
        jnp.asarray(z_mix), jnp.int32(cutoff), k_noise, True,
        jnp.float32(0.0), k_aug, k_aug)

    ds = {k: v.clone().requires_grad_(True) for k, v in d_sd.items()}
    with torch.no_grad():
        fake_const = syn_twin.synthesis_t(mixed_torch(g_sd),
                                          syn_sd, R, channels)
    real_t = torch.from_numpy(
        np.transpose(real, (0, 3, 1, 2)).copy()).double().requires_grad_(True)
    fake_logits = d_twin.discriminator_t(fake_const, ds, R, channels, 4)
    real_logits = d_twin.discriminator_t(real_t, ds, R, channels, 4)
    d_loss_t = torch.mean(F.softplus(fake_logits)) + torch.mean(
        F.softplus(-real_logits))
    (grad_real,) = torch.autograd.grad(real_logits.sum(), real_t,
                                       create_graph=True)
    r1_t = torch.mean(grad_real.square().sum(dim=(1, 2, 3)))
    total_d_t = d_loss_t + (cfg.r1_gamma / 2) * r1_t * cfg.r1_interval
    total_d_t.backward()
    np.testing.assert_allclose(float(r1_j), float(r1_t.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(d_loss_j), float(total_d_t.detach()),
                               rtol=1e-4)
    want_d = convert_torch_discriminator(grad_sd(ds), R)
    flat_g = jax.tree_util.tree_flatten_with_path(grads_d)[0]
    flat_w = jax.tree_util.tree_flatten_with_path(want_d)[0]
    for (pg, gleaf), (pw, wleaf) in zip(flat_g, flat_w):
        path = jax.tree_util.keystr(pg)
        assert path == jax.tree_util.keystr(pw)
        g_, w_ = np.asarray(gleaf, np.float64), np.asarray(wleaf, np.float64)
        scale = max(np.abs(w_).max(), 1e-10)
        np.testing.assert_allclose(g_, w_, rtol=5e-3, atol=1e-4 * scale,
                                   err_msg=f"d_loss/{path} diverges")

    # -------- PPL penalty: second order, pl_mean NOT detached --------
    (ppl_j, (_len_j, newmean_j)), grads_p = jax.value_and_grad(
        fns["ppl_penalty"], has_aux=True)(
        g_params, g_extras, jnp.asarray(z), k_noise, k_pl,
        jnp.float32(pl_mean0))

    gs = {k: v.clone().requires_grad_(True) for k, v in g_sd.items()}
    ws = _torch_mapping(torch.from_numpy(z).double(), gs, NL, num_ws)
    img = syn_twin.synthesis_t(ws, {k[len("synthesis."):]: v
                                    for k, v in gs.items()
                                    if k.startswith("synthesis.")},
                               R, channels)
    # the EXACT y draw of the jax side (NHWC -> NCHW)
    y = np.asarray(jax.random.normal(k_pl, (B, R, R, 3), jnp.float32),
                   np.float64) / math.sqrt(R * R)
    y_t = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())
    proj = torch.sum(img * y_t)
    (pl_grads,) = torch.autograd.grad(proj, ws, create_graph=True)
    pl_lengths = torch.sqrt(pl_grads.square().sum(dim=2).mean(dim=1))
    new_pl_mean = pl_mean0 + cfg.ppl_decay * (pl_lengths.mean() - pl_mean0)
    penalty = torch.mean((pl_lengths - new_pl_mean) ** 2) \
        * cfg.ppl_weight * cfg.ppl_interval
    penalty.backward()
    np.testing.assert_allclose(float(ppl_j), float(penalty.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(float(newmean_j),
                               float(new_pl_mean.detach()), rtol=1e-5)
    check_g(grads_p, grad_sd(gs), "ppl/")

    # the non-detached pl_mean is LIVE: detaching it changes the gradients
    for v in gs.values():
        if v.grad is not None:
            v.grad = None
    ws = _torch_mapping(torch.from_numpy(z).double(), gs, NL, num_ws)
    img = syn_twin.synthesis_t(ws, {k[len("synthesis."):]: v
                                    for k, v in gs.items()
                                    if k.startswith("synthesis.")},
                               R, channels)
    proj = torch.sum(img * y_t)
    (pl_grads,) = torch.autograd.grad(proj, ws, create_graph=True)
    pl_lengths = torch.sqrt(pl_grads.square().sum(dim=2).mean(dim=1))
    detached_mean = (pl_mean0 + cfg.ppl_decay
                     * (pl_lengths.mean() - pl_mean0)).detach()
    penalty_det = torch.mean((pl_lengths - detached_mean) ** 2) \
        * cfg.ppl_weight * cfg.ppl_interval
    penalty_det.backward()
    with pytest.raises(AssertionError):
        check_g(grads_p, grad_sd(gs), "ppl-detached/")


# ---------------------------------------------------------------------------
# (d) concept2clip: the fourth (and last) trainer, trajectory-twinned
# ---------------------------------------------------------------------------


def test_concept2clip_training_trajectory_matches_torch_twin(tmp_path):
    """train_concept2clip (Adam MSE regression + best-by-test-loss,
    reference: viscoin/training/concept2clip.py:96-141) vs a torch twin on
    identical data and shuffle order: per-epoch train/test loss curves and
    the returned best test loss agree. With this, all four trainers
    (classifier, viscoin, gan, concept2clip) are dynamics-twinned."""
    from viscoin_tpu.models.concept2clip import Concept2CLIP
    from viscoin_tpu.train.concept2clip import (
        Concept2ClipTrainingParams,
        train_concept2clip,
    )
    from viscoin_tpu.utils.logging import configure_score_logging
    from viscoin_tpu.utils.porting import convert_torch_concept2clip

    NK, CD, SEED = 8, 12, 7
    hidden = (NK * 9 + CD) // 2
    torch.manual_seed(0)

    class TorchC2C(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(
                torch.nn.Linear(NK * 9, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
                torch.nn.Linear(hidden, CD),
            )

        def forward(self, x):
            return self.model(x.reshape(x.shape[0], -1))

    tm = TorchC2C()
    init_params = convert_torch_concept2clip(
        state_dict_to_numpy(tm.state_dict()))
    model = Concept2CLIP(n_concepts=NK, clip_dim=CD)

    rng_np = np.random.default_rng(0)
    # (B, 3, 3, K) NHWC concept spaces; torch consumes the flattened
    # concept-major order (the parity-tested flatten convention)
    train_s = rng_np.standard_normal((32, 3, 3, NK)).astype(np.float32)
    train_e = rng_np.standard_normal((32, CD)).astype(np.float32)
    test_s = rng_np.standard_normal((16, 3, 3, NK)).astype(np.float32)
    test_e = rng_np.standard_normal((16, CD)).astype(np.float32)

    cfg = Concept2ClipTrainingParams(epochs=20, learning_rate=1e-3,
                                     batch_size=8)
    log_path = str(tmp_path / "c2c.jsonl")
    configure_score_logging(log_path)
    _, best_loss = train_concept2clip(model, init_params, train_s, train_e,
                                      test_s, test_e, cfg, seed=SEED)
    logging.shutdown()
    recs = [json.loads(line) for line in open(log_path)]
    ours_train = np.array([r["train_loss"] for r in recs])
    ours_test = np.array([r["test_loss"] for r in recs])
    assert len(recs) == cfg.epochs

    # --- torch twin: identical shuffle stream + Adam + loss accounting ---
    def to_t(x):  # NHWC (B,3,3,K) -> torch twin input (B,K,3,3)
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    opt = torch.optim.Adam(tm.parameters(), lr=cfg.learning_rate)
    shuffle = np.random.default_rng(SEED)
    theirs_train, theirs_test = [], []
    best_t = float("inf")
    n, bs = len(train_s), cfg.batch_size
    for _ in range(cfg.epochs):
        idx = shuffle.permutation(n)
        total, nb = 0.0, 0
        for s in range(0, n - bs + 1, bs):
            sel = idx[s:s + bs]
            out = tm(to_t(train_s[sel]))
            loss = torch.mean((out - torch.from_numpy(train_e[sel])) ** 2)
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss.detach()) / bs
            nb += 1
        theirs_train.append(total / nb)
        with torch.no_grad():
            # equal-size test batches -> batch-mean MSE == full-set MSE, so
            # the eval loader's shuffle is irrelevant; the framework keeps
            # the reference's per-batch /batch_size accounting for the test
            # loss too (reference concept2clip.py:124 convention)
            tl = float(torch.mean(
                (tm(to_t(test_s)) - torch.from_numpy(test_e)) ** 2)) / bs
        theirs_test.append(tl)
        best_t = min(best_t, tl)

    np.testing.assert_allclose(ours_train, np.array(theirs_train),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(ours_test, np.array(theirs_test),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(best_loss, best_t, rtol=1e-3)
