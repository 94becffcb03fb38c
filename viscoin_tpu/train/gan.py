"""StyleGAN2 adversarial training step (generator + discriminator).

The reference repo does not train GANs itself — it consumes pretrained
pickles produced by the external stylegan2-ada-pytorch trainer (SURVEY.md
§2.2). This module provides that capability in-framework, TPU-first, with
the full StyleGAN2 objective:

  * non-saturating logistic losses for G and D,
  * lazy R1 gradient penalty (every ``r1_interval`` D steps) — the CUDA
    ``conv2d_gradfix`` plugin exists upstream solely so this can
    double-backprop through cuDNN; ``jax.grad`` composes natively,
  * lazy path-length (PPL) regularization (every ``ppl_interval`` G steps) —
    a SECOND-order gradient (d/dparams of ||d img/d ws||), again free in JAX,
  * style mixing (probability ``style_mixing_prob``, scalar cutoff per step
    like the upstream trainer),
  * ``w_avg`` tracking (beta ``w_avg_beta`` = 0.995, reference
    README.md:209-223) so truncation works on in-framework-trained
    generators,
  * generator weight EMA (half-life ``ema_kimg`` thousand images),
  * adaptive discriminator augmentation (train/augment.py — the upstream
    trainer's namesake ADA pipe + r_t controller, default on),
  * optional data-parallel ``mesh`` like the VisCoIN step.

Both lazy regularizers run under ``lax.cond`` so the off-cadence steps do
not pay their compute (XLA compiles both branches, executes one).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from viscoin_tpu.utils.dataclasses import IgnoreNone


@dataclass
class GANTrainingParams(IgnoreNone):
    """None-valued constructor args fall through to these defaults
    (IgnoreNone), so optional CLI flags route straight in."""

    iterations: int = 100_000
    learning_rate: float = 2.5e-3
    beta1: float = 0.0
    beta2: float = 0.99
    r1_gamma: float = 1.0  # R1 weight (ADA 'auto' scales with resolution/batch)
    r1_interval: int = 16  # lazy regularization cadence (D)
    style_mixing_prob: float = 0.9
    ppl_weight: float = 2.0
    ppl_interval: int = 4  # lazy regularization cadence (G)
    ppl_decay: float = 0.01  # EMA decay of the path-length target
    w_avg_beta: float = 0.995
    ema_kimg: float = 10.0  # generator weight EMA half-life (thousand imgs)
    # EMA warmup (upstream train.py 'auto' config: ema_rampup=0.05): caps the
    # EMA half-life at rampup·(images seen so far), so early EMA weights track
    # the live weights instead of the random init. 0 disables (the upstream
    # paper configs' ema_rampup=None).
    ema_rampup: float = 0.0
    batch_size: int = 16

    # ADA (upstream stylegan2-ada-pytorch's namesake): "ada" = adaptive
    # discriminator augmentation (p starts at augment_p and tracks
    # r_t = E[sign(D(real))] toward ada_target), "fixed" = constant
    # augment_p, "none" = no augmentation. CUB (~6k images) is exactly the
    # small-data regime ADA exists for.
    augment: str = "ada"
    augment_p: float = 0.0  # initial ("ada") or constant ("fixed") p
    ada_target: float = 0.6
    ada_interval: int = 4  # adjust p every N steps
    ada_kimg: float = 500.0  # p moves by (batch·interval)/(kimg·1000) per adjust

    # Dataset x-flip doubling (upstream --mirror; distinct from ADA's xflip,
    # which augments D's view only — mirror changes what G learns to model).
    # Default on: the reference's CUB pickles come from mirrored runs
    # (birds are left/right symmetric; upstream CUB configs use mirror=1).
    mirror: bool = True

    # Mixed precision (the TPU analogue of upstream ADA's num_fp16_res=4
    # default): params/images cast to ``compute_dtype`` at the loss boundary,
    # fp32 Adam masters/EMA/w_avg/pl_mean, and every loss/penalty reduction
    # (softplus means, R1 square-sum, PPL norms, r_t) computed in fp32.
    # bf16 shares fp32's exponent range, so upstream's per-resolution fp16
    # split and conv_clamp overflow guards are unnecessary — the whole
    # network runs in bf16. "float32" restores exact full precision.
    compute_dtype: str = "float32"


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    g_ema_params: Any  # EMA of g_params (the weights upstream pickles ship)
    w_avg: jax.Array  # tracked mean of mapping outputs (truncation anchor)
    pl_mean: jax.Array  # EMA of path lengths (PPL target)
    ada_p: jax.Array  # adaptive augmentation probability
    ada_rt: jax.Array  # r_t = E[sign(D(real))] accumulator (ada_interval window)


def _optimizers(cfg: GANTrainingParams):
    """G/D Adam pair with the upstream lazy-regularization correction: when a
    regularizer actually runs every N > 1 steps (its term scaled by N), the
    NVlabs trainer compensates the optimizer with ``mb_ratio = N / (N + 1)``
    — ``lr *= mb_ratio``, ``beta**mb_ratio`` (stylegan2-ada train.py). G uses
    the PPL cadence, D the R1 cadence; a DISABLED regularizer (weight 0)
    gets no adjustment, like upstream's reg_interval=None."""

    def adam(interval: int, enabled: bool):
        mb = interval / (interval + 1) if enabled and interval > 1 else 1.0
        return optax.adam(cfg.learning_rate * mb, b1=cfg.beta1**mb, b2=cfg.beta2**mb)

    return (adam(cfg.ppl_interval, cfg.ppl_weight > 0),
            adam(cfg.r1_interval, cfg.r1_gamma > 0))


def create_gan_train_state(generator, discriminator, rng, cfg: GANTrainingParams,
                           image_size: int):
    # ONE jitted program, like the viscoin bundle's init_models (CLAUDE.md):
    # an eager G+D init is hundreds of per-op dispatches — each a separate
    # compile+round-trip on a relay-attached device. Measured at the 256²
    # reference config through the relay: eager ~17-25 MINUTES of `train
    # gan` startup vs ~1 min as one compiled program (cached thereafter).
    def _init(rng):
        kg, kd = jax.random.split(rng)
        g_vars = generator.init({"params": kg},
                                jnp.zeros((1, generator.z_dim)),
                                noise_mode="const")
        d_vars = discriminator.init(kd,
                                    jnp.zeros((1, image_size, image_size, 3)))
        g_tx, d_tx = _optimizers(cfg)
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            d_params=d_vars["params"],
            g_opt_state=g_tx.init(g_vars["params"]),
            d_opt_state=d_tx.init(d_vars["params"]),
            g_ema_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
            w_avg=jnp.zeros((generator.w_dim,), jnp.float32),
            pl_mean=jnp.zeros((), jnp.float32),
            ada_p=jnp.asarray(cfg.augment_p, jnp.float32),
            ada_rt=jnp.zeros((), jnp.float32),
        )
        # Non-param collections ride along on every apply. The moving_stats
        # copy in here stays at its init value — the LIVE w_avg is tracked
        # in GANTrainState and written over it by export_generator_vars.
        g_extras = {k: v for k, v in g_vars.items() if k != "params"}
        return state, g_extras

    return jax.jit(_init)(rng)


def export_generator_vars(state: GANTrainState, g_extras: Any,
                          ema: bool = True) -> dict:
    """Full generator variables (EMA weights by default) with the tracked
    w_avg written into the ``moving_stats`` collection, so truncation and
    reference-compatible export work on in-framework-trained generators."""
    params = state.g_ema_params if ema else state.g_params
    return {
        **g_extras,
        "params": params,
        "moving_stats": {"mapping": {"w_avg": state.w_avg}},
    }


def _check_tree_shapes(name: str, got, want):
    got_l, got_t = jax.tree_util.tree_flatten(got)
    want_l, want_t = jax.tree_util.tree_flatten(want)
    if got_t != want_t:
        raise ValueError(
            f"{name}: loaded tree structure does not match this model "
            f"config (wrong resolution / channel_base / channel_max?)")
    for g, w in zip(got_l, want_l):
        if jnp.shape(g) != jnp.shape(w):
            raise ValueError(
                f"{name}: loaded leaf shape {jnp.shape(g)} != expected "
                f"{jnp.shape(w)} — channel config mismatch")


def warm_start_gan_state(state: GANTrainState, g_extras: dict, gvars: dict,
                         d_params=None):
    """Transfer-learning init (upstream ``train.py --resume <pickle>``
    semantics — how stylegan2-ada is normally used on small datasets like
    CUB): generator weights load into BOTH g_params and g_ema_params, w_avg
    comes from the ported ``moving_stats`` (kept when absent), non-param
    collections (noise consts) follow the port, and ``d_params`` loads the
    ported discriminator when given. Optimizers, step counter, pl_mean and
    ADA state start fresh. Shape-validated against the freshly-initialized
    templates — a config mismatch fails loudly instead of training garbage.

    Returns ``(state, g_extras)``.
    """
    _check_tree_shapes("generator params", gvars["params"], state.g_params)
    as_arr = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    w_avg = (gvars.get("moving_stats", {}).get("mapping", {})
             .get("w_avg", state.w_avg))
    state = state.replace(
        g_params=as_arr(gvars["params"]),
        # Distinct buffers: the train step donates the state, and g_params /
        # g_ema_params sharing storage is a donate-the-same-buffer-twice
        # runtime error.
        g_ema_params=jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), gvars["params"]),
        w_avg=jnp.asarray(w_avg, jnp.float32),
    )
    g_extras = {k: (as_arr(gvars[k]) if k in gvars else v)
                for k, v in g_extras.items()}
    if d_params is not None:
        _check_tree_shapes("discriminator params", d_params, state.d_params)
        state = state.replace(d_params=as_arr(d_params))
    return state, g_extras


def make_gan_fid_fns(generator, batch_size: int):
    """In-loop FID support for ``train gan`` (the upstream trainer's
    fid50k_full snapshot metric — the reference consumes pickles produced by
    exactly that trainer, reference viscoin/cli/train.py:204; FID is how its
    runs are monitored/selected).

    Returns two jitted callables producing ImageNet-normalized float NHWC
    batches in the domain the pluggable FID detectors expect
    (models/inception.py): ``fake_images(ema_vars, key)`` samples the EMA
    generator (fresh z, random per-pixel noise, no truncation — upstream
    metric semantics), ``real_images(images_u8)`` converts loader batches.
    Both ride the SAME [0,1] → ImageNet adapter so the detector sees
    identically-processed pixels on each side."""
    from viscoin_tpu.data.transforms import normalize_only

    @jax.jit
    def fake_images(ema_vars, key):
        kz, kn = jax.random.split(key)
        z = jax.random.normal(kz, (batch_size, generator.z_dim))
        img = generator.apply(ema_vars, z, rngs={"noise": kn})
        unit = jnp.clip((img.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
        return normalize_only(unit)

    @jax.jit
    def real_images(images_u8):
        return normalize_only(images_u8.astype(jnp.float32) / 255.0)

    return fake_images, real_images


def accumulate_real_fid_stats(detector, real_images_fn, dataset,
                              batch_size: int, max_items: int,
                              capture_all: bool = False):
    """Real-side FID moments: one deterministic (unshuffled) pass over
    ``dataset`` through ``real_images_fn`` + ``detector``, truncated at
    ``max_items``. Partial tail batches are skipped for jit shape stability
    (a rounding error at FID sample counts). Shared by the in-loop
    ``train gan --fid-every`` metric and the offline ``fid`` command so the
    two stay in semantic lockstep. ``capture_all`` retains raw features
    (needed when the caller also computes KID)."""
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.eval.fid import FeatureStats

    stats = FeatureStats(max_items=max_items, capture_all=capture_all)
    for images, _ in DataLoader(dataset, batch_size, shuffle=False):
        if images.shape[0] != batch_size:
            continue
        stats.append(np.asarray(detector(real_images_fn(jnp.asarray(images)))))
        if stats.num_items >= max_items:
            break
    return stats


def accumulate_fake_fid_stats(detector, fake_images_fn, gvars, base_key,
                              max_items: int, capture_all: bool = False):
    """Fake-side FID moments: fresh z batches through ``fake_images_fn``
    keyed ``fold_in(base_key, j)`` per batch, truncated at ``max_items``
    (FeatureStats clips the final batch's overshoot). The counterpart of
    :func:`accumulate_real_fid_stats`, shared by ``train gan --fid-every``
    and the offline ``fid`` command so the two surfaces' sampling semantics
    cannot desync — callers differ only in ``base_key`` (the offline command
    roots at PRNGKey(seed); the in-loop metric at a tag+iteration fold)."""
    from viscoin_tpu.eval.fid import FeatureStats

    stats = FeatureStats(max_items=max_items, capture_all=capture_all)
    j = 0
    while stats.num_items < max_items:
        stats.append(np.asarray(
            detector(fake_images_fn(gvars, jax.random.fold_in(base_key, j)))))
        j += 1
    return stats


def make_gan_snapshot_fn(generator, n_images: int):
    """u8 EMA-sample batch for training snapshots (the upstream trainer
    writes a fakes png grid every tick from FIXED grid latents — callers
    pass the same key each snapshot so the images stay comparable across
    training)."""

    @jax.jit
    def sample(ema_vars, key):
        kz, kn = jax.random.split(key)
        z = jax.random.normal(kz, (n_images, generator.z_dim))
        img = generator.apply(ema_vars, z, rngs={"noise": kn})
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5,
                        0.0, 255.0).astype(jnp.uint8)

    return sample


def make_gan_loss_fns(generator, discriminator, cfg: GANTrainingParams,
                      mesh=None):
    """The GAN step's loss functions, factored out of
    :func:`make_gan_train_step` (the same seam as viscoin's
    ``make_loss_fn``) so the training-dynamics twin tests can take
    ``jax.grad`` of EXACTLY what the step differentiates — in particular
    the two second-order terms (R1 through the augmentation pipe; PPL with
    NVlabs' non-detached pl_mean cross term).

    Returns a dict with ``g_loss_fn``, ``d_loss_fn``, ``ppl_penalty``,
    ``draw_cutoff``, ``map_ws``, ``synth``, plus the shared config-derived
    state (``dt``, ``cast``, ``spatial_sh``) so the step builder consumes
    ONE derivation of it."""
    from jax.sharding import NamedSharding

    from viscoin_tpu.parallel.mesh import image_spec
    from viscoin_tpu.train.viscoin import make_cast

    dt = jnp.dtype(cfg.compute_dtype)
    f32 = jnp.float32
    # fp32 leaves -> compute dtype (identity at float32, so the full-
    # precision path is bit-identical to the pre-mixed-precision step).
    cast = make_cast(cfg.compute_dtype)

    spatial_sh = (NamedSharding(mesh, image_spec(mesh))
                  if mesh is not None and "model" in mesh.axis_names else None)
    # num_ws is a pure function of the (static) resolution. Submodules (and
    # setup()-derived attributes) only exist on BOUND flax modules, so
    # generator.synthesis.num_ws is unreachable here — derive it from the
    # dataclass field instead.
    from viscoin_tpu.models.stylegan import num_ws_for_resolution

    num_ws = num_ws_for_resolution(generator.img_resolution)

    def map_ws(g_params, g_extras, z):
        """(B, z_dim) -> (B, num_ws, w_dim) through the mapping network."""
        return generator.apply({"params": g_params, **g_extras}, z,
                               method=lambda g, z: g.mapping(z))

    def synth(g_params, g_extras, ws, rng):
        return generator.apply({"params": g_params, **g_extras}, ws,
                               method=lambda g, ws: g.synthesis(
                                   ws, noise_mode="random"),
                               rngs={"noise": rng})

    from viscoin_tpu.train.augment import ada_update, augment as augment_pipe

    if cfg.augment not in ("ada", "fixed", "none"):
        raise ValueError(f"augment={cfg.augment!r}: expected ada|fixed|none")
    use_aug = cfg.augment != "none"

    def run_d(d_params, images, aug_p, k_aug):
        """D with the ADA pipe in front (upstream run_D semantics: BOTH real
        and fake batches are augmented before the discriminator)."""
        if spatial_sh is not None:
            images = jax.lax.with_sharding_constraint(images, spatial_sh)
        if use_aug:
            images = augment_pipe(images, aug_p, k_aug)
        return discriminator.apply({"params": d_params}, images)

    def mixed_ws(g_params, g_extras, z, z_mix, cutoff):
        """Style mixing (upstream run_G): layers >= cutoff take styles from a
        second latent (scalar cutoff per call; cutoff == num_ws disables).
        Returns (mixed ws, unmixed ws of the first latent)."""
        ws = map_ws(g_params, g_extras, z)
        ws_mix = map_ws(g_params, g_extras, z_mix)
        layer = jnp.arange(ws.shape[1])[None, :, None]
        return jnp.where(layer >= cutoff, ws_mix, ws), ws

    def g_loss_fn(g_params, g_extras, d_params, z, z_mix, cutoff, k_noise,
                  aug_p, k_aug):
        g_params, d_params = cast(g_params), cast(d_params)
        ws_used, ws = mixed_ws(g_params, g_extras, z, z_mix, cutoff)
        fake = synth(g_params, g_extras, ws_used, k_noise)
        logits = run_d(d_params, fake, aug_p, k_aug).astype(f32)
        # non-saturating G loss; aux: batch-mean mapping output for w_avg
        return (jnp.mean(jax.nn.softplus(-logits)),
                jnp.mean(ws[:, 0].astype(f32), axis=0))

    def ppl_penalty(g_params, g_extras, z, k_noise, k_pl, pl_mean):
        """Path-length regularization: ((||d(img·y)/d ws|| - pl_mean)^2).
        Second-order: the G update differentiates through this jax.grad.
        NVlabs semantics: the EMA target ``new_pl_mean`` is NOT detached in
        the penalty (loss.py lerps the buffer with the live batch mean), so
        the gradient keeps the -2·pl_decay/B cross term."""
        g_params = cast(g_params)
        ws = map_ws(g_params, g_extras, z)

        def proj(ws):
            img = synth(g_params, g_extras, ws, k_noise)
            h, w = img.shape[1], img.shape[2]
            y = jax.random.normal(k_pl, img.shape, f32) / jnp.sqrt(float(h * w))
            return jnp.sum(img.astype(f32) * y)

        pl_grads = jax.grad(proj)(ws)  # (B, num_ws, w_dim)
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(
            jnp.square(pl_grads.astype(f32)), axis=2), axis=1))
        new_pl_mean = pl_mean + cfg.ppl_decay * (jnp.mean(pl_lengths) - pl_mean)
        penalty = jnp.mean(jnp.square(pl_lengths - new_pl_mean))
        scaled = penalty * cfg.ppl_weight * cfg.ppl_interval
        return scaled, (jnp.mean(pl_lengths), new_pl_mean)

    def d_loss_fn(d_params, g_params, g_extras, real, z, z_mix, cutoff,
                  k_noise, do_r1, aug_p, k_aug_f, k_aug_r):
        d_params, g_params = cast(d_params), cast(g_params)
        # Upstream run_G applies style mixing in the Dmain phase too — the
        # discriminator trains against the same mixed fake distribution the
        # generator is optimized on (stylegan2-ada loss.py run_G).
        ws_used, _ = mixed_ws(g_params, g_extras, z, z_mix, cutoff)
        fake = synth(g_params, g_extras, ws_used, k_noise)
        fake_logits = run_d(d_params, fake, aug_p, k_aug_f).astype(f32)
        real_logits = run_d(d_params, real, aug_p, k_aug_r).astype(f32)
        loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(
            jax.nn.softplus(-real_logits))

        # Lazy R1 gradient penalty: only the on-cadence branch executes.
        # Differentiates through the (same-draw) augmentation, like the
        # upstream Dr1 branch runs the penalty through run_D's pipe.
        def r1_term(real):
            def d_sum(x):
                return jnp.sum(run_d(d_params, x, aug_p, k_aug_r).astype(f32))

            grad_real = jax.grad(d_sum)(real)
            return jnp.mean(jnp.sum(jnp.square(grad_real.astype(f32)),
                                    axis=(1, 2, 3)))

        r1 = jax.lax.cond(do_r1, r1_term, lambda real: jnp.zeros(()), real)
        loss = loss + (cfg.r1_gamma / 2) * r1 * cfg.r1_interval
        # aux r_t: the ADA overfitting signal E[sign(D(real))].
        return loss, (r1, jnp.mean(jnp.sign(real_logits)))

    def draw_cutoff(k_mix, k_cut):
        """Fresh mixing decision per run_G call (upstream semantics)."""
        mix = jax.random.bernoulli(k_mix, cfg.style_mixing_prob)
        return jnp.where(mix, jax.random.randint(k_cut, (), 1, num_ws), num_ws)

    return {"g_loss_fn": g_loss_fn, "d_loss_fn": d_loss_fn,
            "ppl_penalty": ppl_penalty, "draw_cutoff": draw_cutoff,
            "map_ws": map_ws, "synth": synth,
            "dt": dt, "cast": cast, "spatial_sh": spatial_sh}


def make_gan_train_step(generator, discriminator, cfg: GANTrainingParams,
                        preprocess: bool = True, mesh=None):
    """One jitted alternating G/D step with style mixing, lazy R1/PPL,
    w_avg tracking and generator EMA.

    Returns step(state, g_extras, images_u8, rng) -> (state, metrics), where
    ``g_extras`` is the non-param generator collections pytree from
    :func:`create_gan_train_state`, passed per call (the make_frozen pattern:
    buffers must be runtime arguments, not closure constants serialized into
    the remote-compile HLO payload). With ``mesh``, the batch shards on the
    ``data`` axis and state replicates (GSPMD all-reduces the gradients over
    ICI). A 2-D ("data", "model") mesh additionally shards the images' H
    axis over ``model`` — every discriminator input (real AND generated,
    incl. the R1 branch) is constrained to the spatial sharding, so GSPMD
    propagates it through G's synthesis and inserts the conv halo
    exchanges, like the VisCoIN train step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscoin_tpu.train.augment import ada_update

    g_tx, d_tx = _optimizers(cfg)
    fns = make_gan_loss_fns(generator, discriminator, cfg, mesh=mesh)
    g_loss_fn, d_loss_fn = fns["g_loss_fn"], fns["d_loss_fn"]
    ppl_penalty, draw_cutoff = fns["ppl_penalty"], fns["draw_cutoff"]
    # one derivation of the config state, shared with the loss fns
    dt, cast, spatial_sh = fns["dt"], fns["cast"], fns["spatial_sh"]

    def step(state: GANTrainState, g_extras, images_u8, rng):
        (k_flip, kz1, kz1m, kz2, kz2m, kzp, kn1, kn2, knp, kmix, kcut,
         kmix2, kcut2, kpl, ka_g, ka_df, ka_dr) = jax.random.split(rng, 17)
        if preprocess:
            # GANs train on [-1, 1] images
            x = images_u8.astype(jnp.float32) / 127.5 - 1.0
            if cfg.mirror:
                flips = jax.random.bernoulli(k_flip, 0.5, (images_u8.shape[0],))
                x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
        else:
            x = images_u8
        if x.dtype != dt:
            x = x.astype(dt)
        g_extras_c = cast(g_extras)
        B = x.shape[0]
        aug_p = (state.ada_p if cfg.augment == "ada"
                 else jnp.asarray(cfg.augment_p, jnp.float32))

        # G main step (with style mixing).
        z = jax.random.normal(kz1, (B, generator.z_dim), dt)
        z_mix = jax.random.normal(kz1m, (B, generator.z_dim), dt)
        cutoff = draw_cutoff(kmix, kcut)
        (g_loss, ws_mean), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, g_extras_c, state.d_params, z, z_mix, cutoff, kn1,
            aug_p, ka_g)

        # Lazy PPL: add its gradient on-cadence (both branches compiled,
        # one executed).
        do_ppl = (state.step % cfg.ppl_interval == 0) & (cfg.ppl_weight > 0)

        def ppl_branch(g_params):
            zp = jax.random.normal(kzp, (B, generator.z_dim), dt)
            (_, aux), grads = jax.value_and_grad(ppl_penalty, has_aux=True)(
                g_params, g_extras_c, zp, knp, kpl, state.pl_mean)
            return grads, aux

        def no_ppl(g_params):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, g_params)
            return zeros, (jnp.zeros(()), state.pl_mean)

        ppl_grads, (pl_len, new_pl_mean) = jax.lax.cond(
            do_ppl, ppl_branch, no_ppl, state.g_params)
        g_grads = jax.tree_util.tree_map(jnp.add, g_grads, ppl_grads)

        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # D step with lazy R1 (fakes style-mixed like the G phase).
        z = jax.random.normal(kz2, (B, generator.z_dim), dt)
        z2_mix = jax.random.normal(kz2m, (B, generator.z_dim), dt)
        cutoff2 = draw_cutoff(kmix2, kcut2)
        do_r1 = state.step % cfg.r1_interval == 0
        (d_loss, (r1, rt_batch)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
            state.d_params, g_params, g_extras_c, x, z, z2_mix, cutoff2, kn2,
            do_r1, aug_p, ka_df, ka_dr)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ADA controller: nudge p toward r_t == target every ada_interval
        # steps (pure in-graph arithmetic; p is traced, so adaptation never
        # recompiles).
        if cfg.augment == "ada":
            ada_p, ada_rt = ada_update(
                state.ada_p, state.ada_rt, rt_batch, state.step, B,
                target=cfg.ada_target, interval=cfg.ada_interval,
                kimg=cfg.ada_kimg)
        else:
            ada_p, ada_rt = state.ada_p, state.ada_rt

        # w_avg tracking (reference w_avg_beta=0.995): lerp(batch mean, w_avg).
        w_avg = ws_mean * (1 - cfg.w_avg_beta) + state.w_avg * cfg.w_avg_beta
        # Generator weight EMA over `ema_kimg` thousand images; with
        # ema_rampup the half-life is capped at rampup·nimg (upstream
        # training_loop.py ema semantics), so beta is traced but the
        # adaptation never recompiles.
        ema_nimg = cfg.ema_kimg * 1000.0
        if cfg.ema_rampup > 0:
            cur_nimg = (state.step.astype(jnp.float32) + 1.0) * B
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * cfg.ema_rampup)
        ema_beta = 0.5 ** (B / jnp.maximum(
            jnp.asarray(ema_nimg, jnp.float32), 1e-8))
        g_ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_beta + p * (1 - ema_beta),
            state.g_ema_params, g_params)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params, d_params=d_params,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            g_ema_params=g_ema, w_avg=w_avg, pl_mean=new_pl_mean,
            ada_p=ada_p, ada_rt=ada_rt)
        metrics = {"g_loss": g_loss, "d_loss": d_loss, "r1": r1,
                   "pl_lengths": pl_len, "pl_mean": new_pl_mean,
                   "ada_p": ada_p, "ada_rt": rt_batch}
        return new_state, metrics

    from viscoin_tpu.parallel.mesh import tpu_compiler_options

    copts = tpu_compiler_options()
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,), compiler_options=copts)

    replicated = NamedSharding(mesh, P())
    img_sharded = spatial_sh or NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, img_sharded, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
        compiler_options=copts,
    )
