"""VisCoIN ensemble training — one jitted, data-parallel step.

Reference: viscoin/training/viscoin.py:48-295 (the 100k-iteration hot loop,
call stack SURVEY.md §3.1). TPU-first redesign:

  * the entire iteration — device-side preprocessing, synthetic-sample
    generation through the frozen original GAN, the five network forwards
    (f(x), Psi, Theta, G(z), f(x̂)) plus LPIPS, the backward pass, and both
    Adam updates — is ONE jitted function. The reference crosses the
    host↔device boundary every step for batching and `.item()` logging; here
    metrics stay on device and are fetched asynchronously.
  * data parallelism over a ``jax.sharding.Mesh`` (new capability — the
    reference is single-GPU, SURVEY.md §2.4): the batch is sharded on the
    ``data`` axis, parameters are replicated, and XLA GSPMD inserts the
    gradient all-reduce over ICI.
  * the LR schedule (×0.8 per 1000 it after the first half,
    training/viscoin.py:152-156) is an optax schedule; gradient accumulation
    (utils.py:52-69) is ``optax.MultiSteps``.
  * the loss-gating of concept-regularization and fidelity losses after
    ``cd_fid_iteration`` (viscoin.py:183-188) is a smooth step-mask inside the
    jit (no recompilation).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from viscoin_tpu.data.transforms import device_preprocess
from viscoin_tpu.models.bundle import VisCoINModels
from viscoin_tpu.train import losses as L
from viscoin_tpu.utils.dataclasses import IgnoreNone


def _as_rbg(key: jax.Array) -> jax.Array:
    """Re-key a threefry PRNG key as an "rbg" key (XLA RngBitGenerator)."""
    data = jax.random.key_data(key)  # (2,) uint32
    return jax.random.wrap_key_data(jnp.concatenate([data, data]), impl="rbg")


@dataclass
class VisCoINTrainingParams(IgnoreNone):
    """Training parameters (reference: viscoin/training/viscoin.py:48-81;
    defaults are the CUB paper settings)."""

    iterations: int = 100_000
    learning_rate: float = 1e-4
    cd_fid_iteration: int = 100
    batch_size: int = 8  # real images per step; the same count of GAN samples is added

    alpha: float = 0.5  # output fidelity loss
    beta: float = 3.0  # LPIPS loss
    gamma: float = 0.1  # reconstruction classification loss
    delta: float = 0.2  # sparsity loss

    gradient_accumulation: int = 1

    # TPU-first addition: run the five network forwards in bfloat16 (fp32
    # master params + fp32 loss math). The reference is fp32-only.
    compute_dtype: str = "float32"

    # TPU-first addition: rematerialization (jax.checkpoint) of the big
    # forwards — "+"-separated subset of {"lpips", "classifier", "gan"}.
    # Cuts the backward's saved-activation working set (the HBM pressure
    # that makes batch 128 lose to 64 on one chip) at the cost of
    # recomputing those forwards in the backward pass.
    remat: str = ""

    # TPU-first addition: draw the frozen-GAN synthetic batches for K
    # consecutive steps in ONE jitted sampler call (K*batch_size images).
    # At the flagship batch 64, the in-step batch-64 generation gets
    # lane-starved XLA layouts (profiled 23.5 ms/step at ~69 TF/s vs ~145
    # for the same convs at batch >= 128); presampling runs them at K*64
    # and amortizes the sampler launch. Per-step z is drawn from each
    # step's own fold_in key; resume replays exactly because sampling
    # groups are aligned to absolute step numbers (see make_sample_fakes).
    # 1 = sample every step (still via the external sampler).
    fake_presample_steps: int = 2


class TrainState(struct.PyTreeNode):
    """Device-resident training state."""

    step: jax.Array
    params: Any  # {"concept_extractor", "explainer", "mapping"}
    opt_state: Any  # Psi+Theta optimizer
    gan_opt_state: Any  # mapping optimizer


def make_lr_schedule(base_lr: float, iterations: int) -> optax.Schedule:
    """×0.8 every 1000 iterations after the first half
    (reference: training/viscoin.py:152-156)."""
    half = iterations // 2

    def schedule(step):
        decays = jnp.maximum(0, (step - half) // 1000)
        return base_lr * jnp.power(0.8, decays.astype(jnp.float32))

    return schedule


def make_optimizers(cfg: VisCoINTrainingParams):
    schedule = make_lr_schedule(cfg.learning_rate, cfg.iterations)
    if cfg.gradient_accumulation > 1:
        # Under MultiSteps the inner optimizer's step count advances once per
        # k micro-steps; rescale so the decay follows the reference's
        # iteration clock.
        inner = schedule
        k = cfg.gradient_accumulation
        schedule = lambda step: inner(step * k)  # noqa: E731
    tx = optax.adam(schedule)
    gan_tx = optax.adam(schedule)
    if cfg.gradient_accumulation > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation)
        gan_tx = optax.MultiSteps(gan_tx, cfg.gradient_accumulation)
    return tx, gan_tx


def create_train_state(models: VisCoINModels, cfg: VisCoINTrainingParams) -> TrainState:
    params = {
        "concept_extractor": models.concept_params,
        "explainer": models.explainer_params,
        "mapping": models.gan_vars["params"]["mapping"],
    }
    # Copy: the jitted step donates the state, which would otherwise free the
    # bundle's arrays out from under later consumers.
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    tx, gan_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init({"concept_extractor": params["concept_extractor"],
                           "explainer": params["explainer"]}),
        gan_opt_state=gan_tx.init(params["mapping"]),
    )


def make_frozen(models: VisCoINModels, generator_vars: Any, lpips_params: Any,
                compute_dtype: str | None = None) -> dict:
    """Bundle every non-trained variable as ONE pytree passed into the jitted
    step each call. Weights must be runtime arguments, not closures: closure
    constants get serialized into the HLO payload (slow compiles, and remote
    compilation services reject multi-hundred-MB programs).

    With ``compute_dtype`` (e.g. "bfloat16"), the frozen fp32 leaves are cast
    ONCE here instead of inside every step (they never update, so the
    per-step cast the trainable masters need is pure waste for these ~90M
    params; the in-step cast then passes them through untouched)."""
    frozen = {
        "classifier": models.classifier_vars,
        "synthesis": models.gan_vars["params"]["synthesis"],
        "gan_noise": models.gan_vars.get("noise", {}),
        "generator": generator_vars,
        "lpips": lpips_params,
    }
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        dt = jnp.dtype(compute_dtype)
        frozen = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            frozen,
        )
    return frozen


def make_cast(compute_dtype):
    dt = jnp.dtype(compute_dtype)

    def cast(tree):
        if dt == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    return cast


_SAMPLER_TAG = 0x53414D50  # "SAMP": decorrelates sampler keys from step keys


@functools.lru_cache(maxsize=8)
def _fake_sample_keys_fn(k: int):
    def keys(base_rng, group_start):
        steps = group_start + jnp.arange(k)
        return jax.vmap(lambda j: jax.random.fold_in(
            jax.random.fold_in(base_rng, j), _SAMPLER_TAG))(steps)

    return jax.jit(keys)


def fake_sample_keys(base_rng, group_start: int, k: int):
    """Stacked per-step sampler keys for steps [group_start, group_start+k):
    ``fold_in(fold_in(base, step), TAG)``. The TAG fold makes the sampler
    stream disjoint from the step keys ``fold_in(base, step)``: threefry
    split is counter-prefix stable (``split(key, n)[0]`` is the same for
    every n), so splitting the RAW step key here would hand the sampler the
    exact key the train step uses for its flip mask — correlating
    augmentation with the synthetic batch.

    One jitted program (cached per k, group_start a runtime scalar): the
    eager form dispatched 2k fold_in ops on the relay-attached device every
    K-group of the hot loop. Key VALUES are identical — fold_in over a
    traced step index computes the same hash — so resume streams are
    unchanged (covered by the resume-determinism tests)."""
    return _fake_sample_keys_fn(k)(base_rng, group_start)


def make_sample_fakes(generator_gan, cfg: VisCoINTrainingParams, mesh=None):
    """Jitted sampler for the frozen original GAN's synthetic batches
    (reference: training/utils.py:26-39 — but batched over K steps).

    Returns sample(frozen, rngs (K,) stacked per-step keys — use
    :func:`fake_sample_keys`) -> fakes (K, batch_size, H, W, 3) in the
    compute dtype. Row k's LATENTS are a pure function of rngs[k], so a
    resumed run regenerates identical z. The synthesis runs
    ONCE on the flattened K*batch (full-lane conv layouts) with per-pixel
    noise from a single rbg stream keyed by the group's first key (rbg is the
    cheap TPU-native generator but is not stable under vmap, so per-row noise
    keys would force threefry — measured ~2x slower sampler); the noise
    stream therefore depends on the group, which resume reproduces because
    groups are aligned to absolute step numbers (train_viscoin)."""
    from viscoin_tpu.parallel.mesh import tpu_compiler_options

    compute_dtype = jnp.dtype(cfg.compute_dtype)
    cast = make_cast(compute_dtype)

    def sample(frozen, rngs):
        generator_vars = cast(frozen["generator"])

        def z_of(rng):
            k_fake, _, _, _ = jax.random.split(rng, 4)
            return jax.random.normal(
                k_fake, (cfg.batch_size, generator_gan.z_dim), compute_dtype)

        K = rngs.shape[0]
        z = jax.vmap(z_of)(rngs).reshape(K * cfg.batch_size, generator_gan.z_dim)
        k_noise = _as_rbg(jax.random.split(rngs[0], 4)[1])
        fakes = generator_gan.apply(generator_vars, z, noise_mode="random",
                                    rngs={"noise": k_noise})
        return fakes.astype(compute_dtype).reshape(
            K, cfg.batch_size, *fakes.shape[1:])

    copts = tpu_compiler_options()
    if mesh is None:
        return jax.jit(sample, compiler_options=copts)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscoin_tpu.parallel.mesh import image_spec

    replicated = NamedSharding(mesh, P())
    # 2-D (data, model) mesh: additionally shard the sample images' H axis
    # over the model axis (spatial sharding — the step consumes them with
    # the same image_spec layout); leading K dim replicated.
    out = P(None, *image_spec(mesh))
    return jax.jit(
        sample,
        in_shardings=(replicated, replicated),
        out_shardings=NamedSharding(mesh, out),
        compiler_options=copts,
    )


def make_loss_fn(
    models: VisCoINModels,
    generator_gan,  # stylegan.Generator module (original, frozen)
    lpips_module,
    cfg: VisCoINTrainingParams,
):
    """The step's total-loss function (reference: training/viscoin.py:163-215
    — five forwards + the six-term objective), factored out of
    :func:`make_train_step` so the training-dynamics twin tests can take
    ``jax.grad`` of EXACTLY what the step differentiates.

    Returns ``loss_fn(params, frozen, real, labels, step, rng, fake) ->
    (total, metrics)`` where ``real`` is the preprocessed float batch and
    ``fake`` is an externally-sampled synthetic batch (or None to sample the
    frozen original GAN in-graph)."""
    classifier = models.classifier
    psi = models.concept_extractor
    theta = models.explainer
    gan = models.gan

    compute_dtype = jnp.dtype(cfg.compute_dtype)
    cast = make_cast(compute_dtype)
    remat = set(filter(None, (cfg.remat or "").replace(",", "+").split("+")))
    unknown = remat - {"lpips", "classifier", "gan"}
    if unknown:
        raise ValueError(f"unknown remat targets {sorted(unknown)}; "
                         "expected subset of lpips+classifier+gan")

    def loss_fn(params, frozen, real, labels, step, rng, fake):
        # Mixed precision: cast weights + activations to the compute dtype at
        # the jit boundary (differentiable; masters stay fp32). Losses are
        # computed in fp32.
        params_c = cast(params)
        classifier_vars = cast(frozen["classifier"])
        synthesis_params = cast(frozen["synthesis"])
        gan_noise = frozen["gan_noise"]
        generator_vars = cast(frozen["generator"])
        lpips_params = cast(frozen["lpips"])
        real = real.astype(compute_dtype)

        def lpips_fn(a, b):
            return lpips_module.apply(
                {"params": lpips_params}, a.astype(compute_dtype),
                b.astype(compute_dtype)
            ).astype(jnp.float32)

        if "lpips" in remat:
            # Recompute the two VGG towers in the backward instead of saving
            # their feature pyramids (the largest activation set of the step).
            lpips_fn = jax.checkpoint(lpips_fn)

        k_fake, k_noise1, k_noise2, k_drop = jax.random.split(rng, 4)
        # Per-pixel synthesis noise is the biggest RNG consumer (~8.4M values
        # per 256² layer pair); generate it with the TPU-native RngBitGenerator
        # ("rbg") instead of threefry — same iid N(0,1) semantics, different
        # stream, measurably cheaper in the compiled step.
        k_noise1, k_noise2 = (_as_rbg(k) for k in (k_noise1, k_noise2))
        B = real.shape[0]

        if fake is None:
            # Synthetic samples through the frozen original GAN
            # (reference: training/utils.py:26-39).
            with jax.named_scope("synthetic_samples"):
                z = jax.random.normal(k_fake, (B, generator_gan.z_dim), compute_dtype)
                fake = generator_gan.apply(
                    generator_vars, z, noise_mode="random",
                    rngs={"noise": k_noise1}).astype(compute_dtype)
        else:
            fake = fake.astype(compute_dtype)
        all_images = jnp.concatenate([real, fake], axis=0)

        # f(x): frozen classifier (eval mode — running BN stats).
        with jax.named_scope("classifier_f"):
            classes, hidden = classifier.apply(classifier_vars, all_images, train=False)
        classes = classes.astype(jnp.float32)

        # Psi, Theta.
        with jax.named_scope("psi_theta"):
            phi, phi_prime = psi.apply({"params": params_c["concept_extractor"]},
                                       tuple(hidden[-3:]))
            explainer_classes = theta.apply(
                {"params": params_c["explainer"]}, phi, train=True, rngs={"dropout": k_drop}
            ).astype(jnp.float32)

        # Losses in fp32 (reference: training/viscoin.py:181-209).
        phi32 = phi.astype(jnp.float32)
        acc_loss = L.softmax_cross_entropy(classes[:B], labels)

        gate = (step > cfg.cd_fid_iteration).astype(jnp.float32)
        cr_loss = gate * cfg.delta * L.concept_regularization_loss(phi32)
        of_loss = gate * cfg.alpha * L.output_fidelity_loss(classes, explainer_classes)

        # Orthogonality on the fp32 master weights.
        ortho_loss = L.concept_orthogonality_loss(
            params["concept_extractor"]["conv5"]["kernel"]
        )

        gan_variables = {
            "params": {"mapping": params_c["mapping"], "synthesis": synthesis_params},
            **({"noise": gan_noise} if gan_noise else {}),
        }
        def gan_fwd(gan_variables, phi, phi_prime, k_noise):
            return gan.apply(gan_variables, phi, phi_prime, return_latents=True,
                             noise_mode="random", rngs={"noise": k_noise})

        if "gan" in remat:
            gan_fwd = jax.checkpoint(gan_fwd)
        with jax.named_scope("gan_reconstruction"):
            rebuilt, ws = gan_fwd(gan_variables, phi, phi_prime, k_noise2)
        rebuilt = rebuilt.astype(compute_dtype)

        def f_rebuilt(classifier_vars, rebuilt):
            # Logits only: the hidden states of the rebuilt pass are unused,
            # so they never become saved residuals.
            return classifier.apply(classifier_vars, rebuilt, train=False)[0]

        if "classifier" in remat:
            f_rebuilt = jax.checkpoint(f_rebuilt)
        with jax.named_scope("classifier_f_rebuilt"):
            rebuilt_classes = f_rebuilt(classifier_vars, rebuilt)

        rec_loss = L.reconstruction_loss(
            rebuilt.astype(jnp.float32), all_images.astype(jnp.float32),
            rebuilt_classes.astype(jnp.float32), classes, lpips_fn,
            lambda_classes=cfg.gamma, lambda_lpips=cfg.beta,
        )
        gan_loss = L.gan_regularization_loss(
            ws.astype(jnp.float32), params["mapping"]["fixed_w_avg"]
        )

        total = acc_loss + cr_loss + of_loss + ortho_loss + rec_loss + gan_loss
        metrics = {
            "acc_loss": acc_loss,
            "cr_loss": cr_loss,
            "of_loss": of_loss,
            "ortho_loss": ortho_loss,
            "rec_loss": rec_loss,
            "gan_loss": gan_loss,
            "inter_loss": L.cross_cross_entropy_loss(rebuilt_classes, classes),
            "total_loss": total,
        }
        return total, metrics

    return loss_fn


def make_train_step(
    models: VisCoINModels,
    generator_gan,  # stylegan.Generator module (original, frozen)
    lpips_module,
    cfg: VisCoINTrainingParams,
    preprocess: bool = True,
    external_fakes: bool = False,
):
    """Build the train step.

    Returns step(state, frozen, images_u8 (B,H,W,3) uint8, labels (B,), rng)
    -> (state, metrics dict), where ``frozen`` is the pytree from
    :func:`make_frozen` (device-resident; passing it per call is free).
    With ``external_fakes`` the step takes an extra ``fake`` argument
    ((B,H,W,3), from :func:`make_sample_fakes`) instead of running the
    frozen original GAN inside the step (see
    ``VisCoINTrainingParams.fake_presample_steps``)."""
    tx, gan_tx = make_optimizers(cfg)
    loss_fn = make_loss_fn(models, generator_gan, lpips_module, cfg)

    def train_step(state: TrainState, frozen, images_u8, labels, rng, fake=None):
        if preprocess:
            k_flip, rng = jax.random.split(rng)
            flips = jax.random.bernoulli(k_flip, 0.5, (images_u8.shape[0],))
            real = device_preprocess(images_u8, flips)
        else:
            real = images_u8

        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, frozen, real, labels, state.step, rng, fake
        )

        psi_theta = {"concept_extractor": state.params["concept_extractor"],
                     "explainer": state.params["explainer"]}
        psi_theta_grads = {"concept_extractor": grads["concept_extractor"],
                           "explainer": grads["explainer"]}
        updates, opt_state = tx.update(psi_theta_grads, state.opt_state, psi_theta)
        psi_theta = optax.apply_updates(psi_theta, updates)

        gan_updates, gan_opt_state = gan_tx.update(
            grads["mapping"], state.gan_opt_state, state.params["mapping"]
        )
        mapping = optax.apply_updates(state.params["mapping"], gan_updates)

        new_state = state.replace(
            step=state.step + 1,
            params={
                "concept_extractor": psi_theta["concept_extractor"],
                "explainer": psi_theta["explainer"],
                "mapping": mapping,
            },
            opt_state=opt_state,
            gan_opt_state=gan_opt_state,
        )
        return new_state, metrics

    if external_fakes:
        def train_step_ext(state, frozen, images_u8, labels, rng, fake):
            return train_step(state, frozen, images_u8, labels, rng, fake)

        return train_step_ext

    def train_step_int(state, frozen, images_u8, labels, rng):
        return train_step(state, frozen, images_u8, labels, rng, None)

    return train_step_int


def train_viscoin(
    models: VisCoINModels,
    generator_gan,
    generator_vars,
    lpips_module,
    lpips_params,
    train_loader,
    test_loader,
    cfg: VisCoINTrainingParams,
    mesh=None,
    seed: int = 0,
    checkpoint_dir: str = ".",
    eval_every: int = 2000,
    checkpoint_every: int = 20_000,
    faithfulness_every: int = 25_000,
    fid_detector=None,
    resume_from: str | None = None,
    profile_dir: str | None = None,
    prefetch: int = 0,
    timings: dict | None = None,
    stop_after: int | None = None,
) -> VisCoINModels:
    """The outer training loop (reference: training/viscoin.py:84-295):
    jitted step + every-2000-it full test eval, every-20k checkpoints, and the
    every-25k 200-image amplification faithfulness probe. Adds deterministic
    resume (``resume_from``), which the reference lacks (SURVEY.md §5).

    ``prefetch``: >0 overlaps host-side batch loading + the host→device
    transfer of the next ``prefetch`` batches with the running step (a
    background thread pulls the loader and device-places batches ahead;
    order — and therefore determinism/resume — is unchanged: one producer,
    one FIFO queue).

    ``timings``: a dict to accumulate per-phase wall seconds into
    ("steps", "eval", "checkpoint", "probe", counts under "n_<phase>") —
    the sustained-throughput bench (bench.py --sustained) uses this to
    report the cadence overhead split.

    ``stop_after``: run at most this many steps THIS CALL while keeping the
    full ``cfg.iterations`` schedule (the LR decay — and hence the compiled
    program — is a function of the configured horizon, not of how long this
    process runs). Resume continues from wherever the run stopped."""
    import json
    import os
    import time as _time

    from viscoin_tpu.data.loader import loop_iter
    from viscoin_tpu.eval.viscoin import faithfulness_probe, test_viscoin
    from viscoin_tpu.utils import checkpoints as ckpt
    from viscoin_tpu.utils.logging import get_logger

    logger = get_logger()
    # Fail fast instead of spinning: the ragged-batch skip below can only
    # terminate if the loader produces full batches of the expected size.
    loader_bs = getattr(train_loader, "batch_size", cfg.batch_size)
    if loader_bs != cfg.batch_size:
        raise ValueError(f"train_loader.batch_size={loader_bs} != "
                         f"cfg.batch_size={cfg.batch_size}")
    # Sharded loaders (multi-host input pipelines) yield this process's
    # slice of each global batch; the slices reassemble into the global
    # batch via global_shard_batch, which requires one loader per process.
    world = getattr(train_loader, "shard", (0, 1))[1]
    if world != jax.process_count():
        raise ValueError(
            f"train_loader.shard world size {world} != jax.process_count() "
            f"{jax.process_count()}: use DataLoader(shard=(process_index, "
            "process_count)) exactly (or an unsharded loader on one process)")
    if jax.process_count() > 1:
        # In-loop eval is collective (every process walks the test loader in
        # lockstep feeding global_shard_batch) — refuse, don't forget.
        test_world = getattr(test_loader, "shard", (0, 1))[1]
        if test_world != jax.process_count():
            raise ValueError(
                f"multi-host run: test_loader.shard world {test_world} != "
                f"process_count {jax.process_count()} — the in-loop eval "
                "feeds per-host shards of each global test batch")
        if mesh is None:
            raise ValueError("multi-host training requires a mesh over all "
                             "processes' devices")
    local_rows = cfg.batch_size // world
    if hasattr(train_loader, "dataset") and len(train_loader.dataset) < cfg.batch_size:
        raise ValueError(f"dataset has {len(train_loader.dataset)} samples < "
                         f"batch_size={cfg.batch_size}: no full batch can ever "
                         "be formed")
    K = max(1, cfg.fake_presample_steps)
    step_fn = make_jitted_train_step(models, generator_gan, lpips_module, cfg,
                                     mesh=mesh, external_fakes=True)
    sample_fakes = make_sample_fakes(generator_gan, cfg, mesh=mesh)
    frozen = make_frozen(models, generator_vars, lpips_params,
                         compute_dtype=cfg.compute_dtype)
    state = create_train_state(models, cfg)
    # Invariants a resume must hold to replay the identical stream: the
    # sampler noise is keyed per K-group (make_sample_fakes), the loader
    # order is a function of (seed, epoch), and the step keys of (seed, i).
    # Persisted with every checkpoint; a mismatch on --resume is an error,
    # not a silently different sample stream.
    resume_meta = {"fake_presample_steps": K, "batch_size": cfg.batch_size,
                   "seed": seed, "compute_dtype": str(cfg.compute_dtype)}
    if resume_from:
        state = ckpt.restore_train_state(state, resume_from,
                                         expect_meta=resume_meta)
    if mesh is not None:
        # Replicate AFTER any restore: restore_pytree returns host numpy
        # leaves, and feeding host-local arrays into a mesh jit would fall
        # back to implicit per-leaf device_puts (on multi-host, each one a
        # collective equality assert — see replicate()'s docstring).
        from viscoin_tpu.parallel.mesh import replicate

        frozen = replicate(mesh, frozen)
        state = replicate(mesh, state)

    base_rng = jax.random.PRNGKey(seed)
    train_iter = loop_iter(train_loader)
    probe_fn = None
    eval_step = None
    fake_group, fake_group_start = None, -1

    def sync_models():
        """Copy current trainable params back into the bundle (for eval/ckpt)."""
        models.concept_params = state.params["concept_extractor"]
        models.explainer_params = state.params["explainer"]
        gan_vars = dict(models.gan_vars)
        gan_vars["params"] = dict(gan_vars["params"])
        gan_vars["params"]["mapping"] = state.params["mapping"]
        models.gan_vars = gan_vars
        return models

    start = int(jax.device_get(state.step))
    if start and hasattr(train_loader, "skip_batches"):
        # Replay position: each epoch yields len(loader) batches of which only
        # the full ones become steps (the ragged final batch, if any, is
        # skipped below). Fast-forward the loader to the batch the unbroken
        # run would be on, so a resumed run consumes the identical sequence.
        steps_per_epoch = len(train_loader.dataset) // cfg.batch_size
        epochs_done, rem = divmod(start, steps_per_epoch)
        train_loader.skip_batches(epochs_done * len(train_loader) + rem)

    def _place(images, labels):
        """Device-place one host batch with the step's exact input sharding."""
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from viscoin_tpu.parallel.mesh import global_shard_batch, image_spec

            # On one process == shard_batch; on a multi-host mesh each
            # process contributes its loader shard of the global batch.
            # 2-D mesh: images must be placed with the step's exact spatial
            # sharding (image_spec) — jit refuses to reshard committed
            # arrays.
            return global_shard_batch(
                mesh, images, labels.astype("int32"),
                specs=(image_spec(mesh), P("data")))
        return jnp.asarray(images), jnp.asarray(labels.astype("int32"))

    def _pull():
        images, labels = next(train_iter)
        while images.shape[0] != local_rows:  # skip ragged final batches
            images, labels = next(train_iter)  # (shape stability under jit)
        return images, labels

    prefetcher = None
    if prefetch > 0:
        # Host loading + host→device transfer of the next `prefetch` batches
        # overlap the running step (device_put is thread-safe; the single
        # producer preserves batch order exactly, so resume replays).
        from viscoin_tpu.data.loader import DevicePrefetcher

        prefetcher = DevicePrefetcher(lambda: _place(*_pull()), prefetch)
        next_batch = prefetcher.next
    else:
        def next_batch():
            return _place(*_pull())

    def _mark(phase, t0):
        if timings is not None:
            dt = _time.perf_counter() - t0
            timings[phase] = timings.get(phase, 0.0) + dt
            timings[f"n_{phase}"] = timings.get(f"n_{phase}", 0) + 1
            # the max is usually the first occurrence = the compile-laden one
            timings[f"max_{phase}"] = max(timings.get(f"max_{phase}", 0.0), dt)

    end = cfg.iterations if stop_after is None else min(
        cfg.iterations, start + stop_after)
    try:
        for i in range(start, end):
            if profile_dir and i == start + 2:  # skip compile + one warm step
                # Started BEFORE this iteration's batch placement so the trace
                # window covers the host→device input transfer (the measured
                # binding constraint on relay-attached setups; with prefetch the
                # producer thread's uploads for later steps land in-window too).
                try:
                    jax.profiler.start_trace(profile_dir)
                except Exception as e:  # pragma: no cover - backend dependent
                    print(f"WARNING: profiler unavailable ({type(e).__name__})")
                    profile_dir = None
            t_step = _time.perf_counter()
            images, labels = next_batch()
            # Per-iteration key is a pure function of (seed, i): deterministic
            # resume — a resumed step i draws the same randomness as an unbroken
            # run's step i.
            k = jax.random.fold_in(base_rng, i)
            # Presampled frozen-GAN batches for K steps at a time (group aligned
            # to ABSOLUTE step numbers and keyed per step, so any resume point
            # regenerates the identical samples).
            group = (i // K) * K
            if fake_group_start != group:
                fake_group = sample_fakes(frozen, fake_sample_keys(base_rng, group, K))
                fake_group_start = group
            state, metrics = step_fn(state, frozen, images, labels, k,
                                     fake_group[i - group])
            _mark("steps", t_step)
            if profile_dir and i == start + 5:
                float(metrics["total_loss"])  # flush the relay before stopping
                try:
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {profile_dir}")
                except Exception:  # pragma: no cover
                    pass
                profile_dir = None

            # 0 disables the cadence (like faithfulness_every)
            if eval_every and i % eval_every == 0:
                t_eval = _time.perf_counter()
                sync_models()
                train_data = {
                    f"train_{k_}": float(metrics[k_])
                    for k_ in ["acc_loss", "cr_loss", "of_loss", "ortho_loss",
                               "rec_loss", "gan_loss", "inter_loss"]
                }
                if eval_step is None:
                    from viscoin_tpu.eval.viscoin import make_test_step

                    # Built once: a fresh jit wrapper per eval would retrace
                    # (and, without a persistent cache, recompile) every
                    # 2000 iterations.
                    eval_step = make_test_step(models, lpips_module, mesh=mesh)
                # Multi-host capable: every process participates (the eval step
                # and FID moments are GSPMD-reduced over the mesh; test_loader is
                # validated sharded above), and the replicated metric scalars are
                # identical on every host.
                test_results = test_viscoin(
                    models, lpips_module, lpips_params, test_loader,
                    compute_fid=fid_detector is not None,
                    fid_detector=fid_detector, verbose=False, mesh=mesh,
                    step=eval_step)
                train_data.update({f"test_{k_}": v for k_, v in
                                   test_results.__dict__.items()})
                if jax.process_index() == 0:  # one jsonl log, not one per host
                    logger.info(json.dumps(train_data))
                _mark("eval", t_eval)

            if checkpoint_every and i % checkpoint_every == 0:
                t_ckpt = _time.perf_counter()
                sync_models()
                if jax.process_index() == 0:
                    # Process-0-only writes: state/params are replicated, so every
                    # process holds identical host-readable copies and concurrent
                    # writes to the same path would race.
                    ckpt.save_viscoin(models, os.path.join(
                        checkpoint_dir,
                        f"viscoin{i // checkpoint_every}-{cfg.iterations // checkpoint_every}",
                    ), async_save=True)
                    # async: the host snapshot is taken here (the step donates
                    # the state), serialization + disk write ride the background
                    # writer — the loop continues into the next step.
                    ckpt.save_train_state(
                        state, os.path.join(checkpoint_dir, "train_state"),
                        meta=resume_meta, async_save=True)
                _mark("checkpoint", t_ckpt)

            if (faithfulness_every and i % faithfulness_every == 0 and i > 0
                    and jax.process_index() == 0):
                t_probe = _time.perf_counter()
                # 200-image faithfulness probe (viscoin.py:273-295), run ONCE
                # (process 0) as fixed-shape BATCHED device programs — the
                # reference dispatches one amplify_concepts program per image
                # (200 round trips); the probe's statistic is the ×1 (identity
                # scale) reconstruction probability, so it batches exactly
                # (see make_faithfulness_fn). The probe's jits are
                # process-local, so on multi-host the globally-replicated
                # bundle arrays are localized to host copies first — feeding
                # global arrays into a local jit would make it a collective
                # program only one process enters.
                sync_models()
                probe_models = models
                if jax.process_count() > 1:
                    import dataclasses as _dc

                    loc = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
                    probe_models = _dc.replace(
                        models,
                        classifier_vars=loc(models.classifier_vars),
                        concept_params=loc(models.concept_params),
                        explainer_params=loc(models.explainer_params),
                        gan_vars=loc(models.gan_vars),
                    )
                    # (the probe fn closes over module DEFS only — variables
                    # ride as jit arguments — so the compiled fn is reusable.)
                if probe_fn is None:
                    from viscoin_tpu.eval.viscoin import make_faithfulness_fn

                    # Single-process: explicit replicated shardings on the
                    # training mesh (matches the prewarm compile exactly).
                    # Multi-host: a LOCAL program over the localized copies.
                    probe_fn = make_faithfulness_fn(
                        probe_models,
                        mesh=mesh if jax.process_count() == 1 else None)
                ds = test_loader.dataset
                probe_rng = np.random.default_rng((seed, i))  # resume-deterministic
                idx = probe_rng.choice(len(ds), min(200, len(ds)), replace=False)
                images_u8 = np.stack([np.asarray(ds[int(j)][0]) for j in idx])
                probs = faithfulness_probe(probe_models, images_u8, fn=probe_fn)

                print(f"Faithfullness stats (probability of best concept after "
                      f"reconstruction): mean = {np.mean(probs)} --- std = {np.std(probs)}")
                _mark("probe", t_probe)

    finally:
        # Producer shutdown must run on EVERY exit (step exception, OOM,
        # KeyboardInterrupt, checkpoint IO error): a leaked producer blocks
        # forever in put(), pinning its device-resident batches.
        if prefetcher is not None:
            prefetcher.close()
    sync_models()
    ckpt.wait_for_saves()  # join (and surface errors from) async checkpoints
    return models


def make_jitted_train_step(models, generator_gan, lpips_module, cfg,
                           mesh=None, preprocess: bool = True,
                           external_fakes: bool = False):
    """Jit (and optionally shard over a data-parallel mesh) the train step.

    Returns step(state, frozen, images_u8, labels, rng[, fake]) — ``fake``
    only with ``external_fakes`` (see :func:`make_sample_fakes`).
    With ``mesh``: the batch shards on the ``data`` axis, state and frozen
    weights replicate, and GSPMD all-reduces the gradients over ICI.
    A 2-D ("data", "model") mesh additionally shards the images' H axis over
    the model axis (spatial sharding, SURVEY.md §2.4's sequence-parallel
    analogue): GSPMD inserts the conv halo exchanges through all five
    forwards AND the backward — the scaling escape hatch when per-chip batch
    is already minimal (tested shard-invariant vs the 1-D mesh)."""
    from viscoin_tpu.parallel.mesh import tpu_compiler_options

    step = make_train_step(models, generator_gan, lpips_module, cfg,
                           preprocess=preprocess, external_fakes=external_fakes)
    copts = tpu_compiler_options()
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,), compiler_options=copts)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscoin_tpu.parallel.mesh import image_spec

    replicated = NamedSharding(mesh, P())
    img_sharded = NamedSharding(mesh, image_spec(mesh))
    batch_sharded = NamedSharding(mesh, P("data"))
    in_sh = [replicated, replicated, img_sharded, batch_sharded, replicated]
    if external_fakes:
        in_sh.append(img_sharded)
    return jax.jit(
        step,
        in_shardings=tuple(in_sh),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
        compiler_options=copts,
    )
