"""`train` command (reference: viscoin/cli/train.py) — dispatches on
model_name ∈ {classifier, concept2clip, viscoin, gan}.

``gan`` is a documented extension: the reference trains its GANs with the
external stylegan2-ada-pytorch train.py and consumes the pickles
(reference cli/train.py:202-205); here the full StyleGAN2 trainer is
in-framework (train/gan.py), so the whole pipeline runs without leaving
the CLI."""

from __future__ import annotations

from typing import Literal

import click
import jax

from viscoin_tpu.cli.utils import (
    batch_size,
    checkpoints,
    dataset,
    device,
    epochs,
    learning_rate,
    output_weights,
)
from viscoin_tpu.data.utils import (
    DatasetType,
    default_checkpoints,
    get_dataloaders,
)
from viscoin_tpu.utils.logging import configure_score_logging


@click.command()
@click.argument("model_name")
@batch_size
@device
@dataset
@epochs
@learning_rate
@output_weights
@checkpoints
@click.option("--gradient-accumulation-steps", type=int, default=1,
              help="The amount of steps to accumulate gradients before stepping "
                   "the optimizers")
@click.option("--latent-type", type=click.Choice(["viscoin", "gan"]),
              default="viscoin", help="The latent space to train concept2clip on")
@click.option("--data-parallel/--no-data-parallel", default=True,
              help="Shard the batch over all local devices (new capability; "
                   "the reference is single-device)")
@click.option("--model-parallel", type=int, default=1,
              help="[viscoin/gan] Devices per model-parallel group: builds a "
                   "2-D (data, model) mesh that spatially shards the images' "
                   "H axis through the train step (GSPMD halo exchanges) — "
                   "for scaling past the per-chip batch minimum")
@click.option("--optimizer", type=click.Choice(["adam", "sgd"]), default=None,
              help="[classifier] Optimizer (default adam, the reference "
                   "code's choice; sgd covers the reference README's "
                   "Stanford-Cars recipe — lr 0.1, StepLR(30, 0.1), 90 "
                   "epochs — which its hardcoded-Adam code cannot run)")
@click.option("--momentum", type=float, default=None,
              help="[classifier] SGD momentum (default 0.9)")
@click.option("--compute-dtype", type=click.Choice(["bfloat16", "float32"]),
              default="bfloat16", show_default=True,
              help="[classifier/viscoin/gan] Training compute precision: "
                   "parameters and images cast at the loss boundary, fp32 "
                   "Adam masters and loss reductions (the TPU-first default; "
                   "float32 restores the reference's full-precision numerics)")
@click.option("--debug-nans", is_flag=True,
              help="Fail fast on NaNs in any jitted computation")
@click.option("--resume", "resume_from", type=click.Path(exists=True), default=None,
              help="Resume viscoin training from a saved train_state directory "
                   "(deterministic resume — a capability the reference lacks)")
@click.option("--profile-dir", type=click.Path(), default=None,
              help="Capture a jax.profiler trace of training steps 2-5 "
                   "(XProf/Perfetto-compatible) into this directory")
@click.option("--channel-base", type=int, default=16384,
              help="[gan] StyleGAN2 channel base (ADA 'auto' picks this per "
                   "resolution; 16384 is the reference 256² config)")
@click.option("--channel-max", type=int, default=512,
              help="[gan] StyleGAN2 channel cap per layer")
@click.option("--fid-detector", "fid_detector_path", type=click.Path(exists=True),
              default=None,
              help="[viscoin/gan] FID feature detector: a ported orbax dir "
                   "(pytorch-fid or inception-nvlabs convention, "
                   "auto-detected) or the NVlabs TorchScript "
                   "inception-2015-12-05.pt itself (bit-exact, host CPU). "
                   "Default: checkpoints/inception if present")
@click.option("--fid-every", type=int, default=0,
              help="[gan] Compute FID every N iterations — EMA-generator "
                   "samples vs the training distribution (the upstream "
                   "trainer's snapshot metric). 0 disables; needs a FID "
                   "detector (see --fid-detector)")
@click.option("--fid-samples", type=int, default=8192,
              help="[gan] Samples per side for each in-loop FID estimate "
                   "(upstream fid50k_full uses 50k; smaller is faster and "
                   "noisier — comparable across a run at a fixed value)")
@click.option("--init-from", "init_from", type=click.Path(exists=True),
              default=None,
              help="[gan] Transfer-learning warm start (upstream `--resume "
                   "<pickle>` semantics): load generator variables (a "
                   "`train gan` export or `port_weights.py stylegan` "
                   "output; + <path>.discriminator if present) into a fresh "
                   "run — weights transfer, optimizers/step/ADA start over")
@click.option("--ema-rampup", type=float, default=None,
              help="[gan] EMA half-life warmup cap as a fraction of images "
                   "seen (upstream 'auto' config uses 0.05; default 0 = off, "
                   "the upstream paper configs' ema_rampup=None)")
@click.option("--mirror/--no-mirror", default=True, show_default=True,
              help="[gan] Dataset x-flip doubling (upstream --mirror; the "
                   "reference's CUB pickles come from mirrored runs). "
                   "Distinct from ADA, which augments only D's view")
@click.option("--image-size", type=int, default=None,
              help="[image-folder datasets] Square resolution images are "
                   "decoded/trained at (default 256, or the "
                   "VISCOIN_IMAGEFOLDER_SIZE env var) — e.g. 512 for a "
                   "CelebA-HQ-512 root. Registry datasets are fixed by "
                   "their reference recipes")
@click.option("--snapshot-every", type=int, default=0,
              help="[gan] Write a fakes_<it>.png grid of 16 EMA-generator "
                   "samples every N iterations, from FIXED latents so the "
                   "grids stay comparable across training (the upstream "
                   "trainer's per-tick fakes grid). 0 disables")
@click.option("--eval-every", type=int, default=None,
              help="[viscoin] Full test-set eval cadence in iterations "
                   "(reference: 2000, viscoin.py:230); 0 disables")
@click.option("--checkpoint-every", type=int, default=None,
              help="[viscoin/gan] Checkpoint cadence in iterations "
                   "(reference: 20000, viscoin.py:263; gan default 10000); "
                   "0 disables [viscoin]")
@click.option("--faithfulness-every", type=int, default=None,
              help="[viscoin] 200-image amplification faithfulness probe "
                   "cadence (reference: 25000, viscoin.py:273); 0 disables")
@click.option("--prefetch", type=int, default=None,
              help="[viscoin/gan] Batches to load + host→device transfer "
                   "ahead of the running step (background thread; "
                   "order-preserving so resume determinism holds). "
                   "0 = synchronous. Default: 1 for viscoin, 0 for gan "
                   "(measured on the relay: +23-28% on viscoin's "
                   "non-blocking loop, a regression on gan's — BASELINE.md)")
def train(model_name, dataset, device, checkpoints, batch_size, learning_rate,
          epochs, latent_type, output_weights, gradient_accumulation_steps,
          data_parallel, model_parallel, optimizer, momentum, compute_dtype,
          debug_nans, resume_from, profile_dir, channel_base, channel_max,
          fid_detector_path, fid_every, fid_samples, init_from, ema_rampup,
          mirror, image_size, snapshot_every, eval_every, checkpoint_every,
          faithfulness_every, prefetch):
    """Train a model on a dataset. Metrics are logged to a jsonl file."""
    if debug_nans:
        from viscoin_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging()
    ds_kwargs = _dataset_kwargs(dataset, image_size)
    match model_name:
        case "classifier":
            _train_classifier(dataset, checkpoints, batch_size, learning_rate,
                              epochs, output_weights, data_parallel,
                              compute_dtype=compute_dtype, optimizer=optimizer,
                              momentum=momentum, ds_kwargs=ds_kwargs)
        case "concept2clip":
            _train_concept2clip(latent_type, dataset, epochs, learning_rate,
                                batch_size, output_weights, data_parallel,
                                ds_kwargs=ds_kwargs)
        case "viscoin":
            cadences = {k: v for k, v in [("eval_every", eval_every),
                                          ("checkpoint_every", checkpoint_every),
                                          ("faithfulness_every", faithfulness_every)]
                        if v is not None}
            _train_viscoin(dataset, learning_rate, epochs, batch_size,
                           gradient_accumulation_steps, data_parallel, resume_from,
                           profile_dir, fid_detector_path,
                           model_parallel=model_parallel,
                           compute_dtype=compute_dtype, ds_kwargs=ds_kwargs,
                           prefetch=1 if prefetch is None else prefetch,
                           **cadences)
        case "gan":
            _train_gan(dataset, learning_rate, epochs, batch_size,
                       data_parallel, output_weights, channel_base, channel_max,
                       resume_from=resume_from, model_parallel=model_parallel,
                       compute_dtype=compute_dtype,
                       fid_detector_path=fid_detector_path,
                       fid_every=fid_every, fid_samples=fid_samples,
                       mirror=mirror, snapshot_every=snapshot_every,
                       init_from=init_from, ema_rampup=ema_rampup,
                       prefetch=0 if prefetch is None else prefetch,
                       **({"checkpoint_every": checkpoint_every}
                          if checkpoint_every is not None else {}),
                       ds_kwargs=ds_kwargs)
        case _:
            raise ValueError(f"Unknown model name: {model_name}")


def _dataset_kwargs(dataset: str, image_size) -> dict:
    """--image-size routes to the image-folder / training-zip dataset's
    ``out_size``; the registry datasets' geometries are fixed by their
    reference recipes (CUB/FunnyBirds 256² transforms; synthetic uses
    VISCOIN_SYNTH_SIZE)."""
    if image_size is None:
        return {}
    import os

    if not (os.path.isdir(dataset) or dataset.lower().endswith(".zip")):
        raise click.UsageError(
            "--image-size applies to image-folder (path) datasets; "
            f"{dataset!r} is a registry dataset with a fixed geometry")
    return {"out_size": image_size}


def _build_mesh(data_parallel: bool, model_parallel: int):
    """Mesh for a train subcommand: None (single device / --no-data-parallel),
    a 1-D data mesh, or a 2-D (data, model) mesh whose 'model' axis spatially
    shards the images' H axis (--model-parallel)."""
    from viscoin_tpu.parallel.mesh import make_mesh, make_mesh_2d

    n_dev = len(jax.devices())
    if model_parallel > 1:
        if not data_parallel:
            raise click.UsageError("--model-parallel requires --data-parallel "
                                   "(the mesh is 2-D (data, model))")
        if n_dev % model_parallel:
            raise click.UsageError(f"--model-parallel={model_parallel} does not "
                                   f"divide the {n_dev} available devices")
        mesh = make_mesh_2d(n_dev // model_parallel, model_parallel)
        click.echo(f"mesh: ({n_dev // model_parallel} data, {model_parallel} "
                   "model) — images' H axis spatially sharded over 'model'")
        return mesh
    return make_mesh() if (data_parallel and n_dev > 1) else None


def _train_classifier(dataset: DatasetType, checkpoints, batch_size,
                      learning_rate, epochs, output_weights,
                      data_parallel: bool = True, compute_dtype="bfloat16",
                      optimizer=None, momentum=None, ds_kwargs=None):
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.train.classifiers import ClassifierTrainingParams, train_classifier
    from viscoin_tpu.utils import checkpoints as ckpt

    mesh = _build_mesh(data_parallel, 1)
    params = ClassifierTrainingParams(epochs, learning_rate, batch_size,
                                      compute_dtype=compute_dtype,
                                      optimizer=optimizer, momentum=momentum)
    configure_score_logging(f"classifier_{params.epochs}.jsonl")
    train_loader, test_loader = get_dataloaders(dataset, params.batch_size,
                                                **(ds_kwargs or {}))

    model = Classifier(output_classes=train_loader.dataset.N_CLASSES)
    if checkpoints is not None:
        variables = ckpt.restore_pytree(checkpoints)
    else:
        click.echo("NOTE: no --checkpoints given — random init (no network "
                   "downloads; port pretrained torch weights with "
                   "viscoin_tpu.utils.porting.convert_torch_classifier).")
        import jax.numpy as jnp

        size = train_loader.dataset.out_size
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
        )

    best, _ = train_classifier(model, variables, train_loader, test_loader,
                               params, mesh=mesh)
    ckpt.save_pytree(best, output_weights)


def _train_concept2clip(latent_type: Literal["viscoin", "gan"], dataset, epochs,
                        learning_rate, batch_size, output_weights,
                        data_parallel: bool = True, ds_kwargs=None):
    import numpy as np

    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.eval.spaces import (
        SPACES_BATCH_SIZE,
        compute_concept_space,
        compute_w_space,
    )
    from viscoin_tpu.models.clip import CLIP, compute_image_embeddings
    from viscoin_tpu.models.concept2clip import Concept2CLIP, Concept2CLIPStyleGAN
    from viscoin_tpu.train.concept2clip import (
        Concept2ClipTrainingParams,
        train_concept2clip,
    )
    from viscoin_tpu.utils import checkpoints as ckpt

    viscoin = ckpt.load_viscoin_bundle(default_checkpoints(dataset)["viscoin"])
    params = Concept2ClipTrainingParams(epochs=epochs, learning_rate=learning_rate,
                                        batch_size=batch_size)
    configure_score_logging(f"concept2clip_{params.epochs}.jsonl")
    mesh = _build_mesh(data_parallel, 1)
    if mesh is not None and (params.batch_size % mesh.shape["data"]
                             or SPACES_BATCH_SIZE % mesh.shape["data"]):
        mesh = None  # tiny-MLP trainer: fall back rather than refuse

    train_ds, test_ds = get_datasets(dataset, "test", **(ds_kwargs or {}))
    if latent_type == "viscoin":
        train_spaces, test_spaces = compute_concept_space(viscoin, dataset,
                                                          train_ds, test_ds,
                                                          mesh=mesh)
        model = Concept2CLIP(n_concepts=viscoin.concept_extractor.n_concepts)
    else:
        train_spaces, test_spaces = compute_w_space(viscoin, dataset, train_ds,
                                                    test_ds, mesh=mesh)
        model = Concept2CLIPStyleGAN(n_style_layers=viscoin.gan.num_ws,
                                     layer_dim=viscoin.gan.w_dim)

    clip = CLIP()
    train_emb, test_emb = compute_image_embeddings(clip, dataset, train_ds, test_ds)

    import jax.numpy as jnp

    init_params = model.init(jax.random.PRNGKey(0),
                             jnp.asarray(train_spaces[:1]))["params"]
    best, _ = train_concept2clip(model, init_params,
                                 np.asarray(train_spaces), np.asarray(train_emb),
                                 np.asarray(test_spaces), np.asarray(test_emb),
                                 params, mesh=mesh)
    ckpt.save_pytree(best, output_weights)


def build_gan_modules(size: int, channel_base: int, channel_max: int,
                      batch_size: int):
    """G/D module definitions for `train gan` — the ONE construction site,
    shared with `prewarm gan` (same byte-identical-cache-key argument as
    :func:`build_viscoin_modules`). Reference "original pretrained" GAN
    config (reference README.md:209-223): z=512, w=512, 2 mapping layers,
    ADA 'auto' channels; mbstd group follows the batch."""
    from viscoin_tpu.models.stylegan import Discriminator, Generator

    generator = Generator(z_dim=512, w_dim=512, img_resolution=size,
                          channel_base=channel_base, channel_max=channel_max,
                          mapping_layers=2)
    discriminator = Discriminator(img_resolution=size,
                                  channel_base=channel_base,
                                  channel_max=channel_max,
                                  mbstd_group_size=min(4, batch_size))
    return generator, discriminator


def _train_gan(dataset: DatasetType, learning_rate, epochs, batch_size,
               data_parallel, output_weights, channel_base=16384,
               channel_max=512, resume_from=None, checkpoint_every=10_000,
               seed=0, model_parallel=1, compute_dtype="bfloat16",
               fid_detector_path=None, fid_every=0, fid_samples=8192,
               mirror=True, snapshot_every=0, init_from=None,
               ema_rampup=None, ds_kwargs=None, prefetch=0):
    """In-framework StyleGAN2 training (the capability the reference
    outsources): `epochs` counts ITERATIONS like `train viscoin`. Saves the
    EMA generator variables to --output-weights in the orbax format that
    `train viscoin` consumes as the pretrained GAN, plus jsonl metrics.
    Checkpoints the full GANTrainState every ``checkpoint_every`` iterations
    (next to --output-weights as <output>.train_state) and resumes
    deterministically with --resume, like `train viscoin`. ``fid_every``
    adds the upstream trainer's snapshot metric: FID of EMA-generator
    samples vs the training distribution, logged as ``fid`` jsonl records."""
    import json
    import os

    import jax.numpy as jnp
    import numpy as np

    from viscoin_tpu.data.loader import DataLoader, loop_iter
    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.parallel.mesh import global_shard_batch, replicate
    from viscoin_tpu.train.gan import (
        GANTrainingParams,
        create_gan_train_state,
        export_generator_vars,
        make_gan_train_step,
    )
    from viscoin_tpu.utils import checkpoints as ckpt
    from viscoin_tpu.utils.logging import get_logger

    # None-valued CLI flags fall through to the dataclass defaults
    # (IgnoreNone), like every other train subcommand.
    cfg = GANTrainingParams(iterations=epochs, learning_rate=learning_rate,
                            batch_size=batch_size, compute_dtype=compute_dtype,
                            mirror=mirror, ema_rampup=ema_rampup)
    world = jax.process_count()
    if world > 1:
        # Multi-host: each process loads its shard of every global batch
        # (identical global order on all hosts — exact-concat tested), and
        # global_shard_batch reassembles, exactly like train_viscoin.
        if not data_parallel or cfg.batch_size % world:
            raise click.UsageError(
                f"multi-host `train gan` needs --data-parallel and a batch "
                f"size divisible by the {world} processes")
        train_ds, _ = get_datasets(dataset, "gan", train_only=True,
                                   **(ds_kwargs or {}))
        train_loader = DataLoader(train_ds, cfg.batch_size,
                                  shard=(jax.process_index(), world))
    else:
        # train_only: GAN training never evaluates on a test split, so
        # train-only roots (the typical CelebA-HQ GAN layout) load fine.
        # transform="gan": deterministic short-side center crop + resize —
        # upstream stylegan2-ada trains on raw dataset-zip images (mirror and
        # ADA, both applied inside the step, are the ONLY augmentations);
        # the classifier-style RandomResizedCrop would teach G a crop
        # distribution the reference pipeline never sees.
        train_ds, _ = get_datasets(dataset, "gan", train_only=True,
                                   **(ds_kwargs or {}))
        train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True)
    local_bs = cfg.batch_size // world
    size = train_loader.dataset.out_size
    if len(train_loader.dataset) < cfg.batch_size:
        raise ValueError(f"dataset has {len(train_loader.dataset)} samples < "
                         f"batch_size={cfg.batch_size}: no full batch can "
                         "ever be formed")
    generator, discriminator = build_gan_modules(size, channel_base,
                                                 channel_max, cfg.batch_size)
    configure_score_logging(f"gan_{cfg.iterations}.jsonl")
    logger = get_logger()

    state, g_extras = create_gan_train_state(generator, discriminator,
                                             jax.random.PRNGKey(seed), cfg, size)
    if init_from:
        if resume_from:
            raise click.UsageError(
                "--init-from is a fresh warm start (weights only); "
                "--resume continues a run exactly — pick one")
        from viscoin_tpu.train.gan import warm_start_gan_state

        gvars = ckpt.restore_pytree(init_from)
        d_path = f"{init_from}.discriminator"
        d_params = ckpt.restore_pytree(d_path) if os.path.exists(d_path) \
            else None
        state, g_extras = warm_start_gan_state(state, g_extras, gvars,
                                               d_params)
        click.echo(f"warm start from {init_from} (generator"
                   + (" + discriminator)" if d_params is not None
                      else "; fresh discriminator)"))
    mesh = _build_mesh(data_parallel, model_parallel)
    step = make_gan_train_step(generator, discriminator, cfg, mesh=mesh)

    # In-loop FID (the upstream trainer's snapshot metric): real-side moments
    # accumulate ONCE from a deterministic pass over the training set; the
    # fake side resamples the EMA generator at every cadence point.
    # Aux RNG streams branch off fixed tags (NOT cfg.iterations: resuming a
    # run with a different --epochs must not change the "fixed" snapshot
    # latents or the FID draws). Multi-level fold_in paths are structurally
    # distinct from the single-level per-step keys.
    _FID_TAG, _SNAPSHOT_TAG = 0x7FFFFFFE, 0x7FFFFFFF
    fid_enabled = False
    if fid_every:
        if world > 1:
            raise click.UsageError(
                "--fid-every is single-host: the fake-side sampling and "
                "host-side moment accumulation are not sharded across "
                "processes (run `main.py fid --gan <export>` offline on the "
                "exported generator instead)")
        detector_path = fid_detector_path or "checkpoints/inception"
        if not os.path.exists(detector_path):
            raise click.UsageError(
                f"--fid-every needs a FID detector; none at {detector_path} "
                "(port weights with scripts/port_weights.py inception, or "
                "pass --fid-detector)")
        from viscoin_tpu.eval.fid import fid_from_stats
        from viscoin_tpu.train.gan import (
            accumulate_fake_fid_stats,
            accumulate_real_fid_stats,
            make_gan_fid_fns,
        )

        detector = _load_fid_detector(detector_path)
        fake_images_fn, real_images_fn = make_gan_fid_fns(generator,
                                                          cfg.batch_size)
        stats_real = accumulate_real_fid_stats(
            detector, real_images_fn, train_loader.dataset, cfg.batch_size,
            fid_samples)
        fid_enabled = True
        click.echo(f"FID every {fid_every} it: {stats_real.num_items} real "
                   f"samples accumulated, {fid_samples} fakes per estimate")

    snapshot_fn = None
    if snapshot_every:
        if world > 1:
            raise click.UsageError(
                "--snapshot-every is single-host (host-side PNG writes from "
                "a process-0-only dispatch; sample offline from the exported "
                "generator instead)")
        from viscoin_tpu.train.gan import make_gan_snapshot_fn

        snapshot_fn = make_gan_snapshot_fn(generator, 16)
        # Fixed latents: the same key every snapshot, derived from a fixed
        # tag so the grids stay comparable across training AND across
        # resumes that change --epochs.
        snapshot_key = jax.random.fold_in(jax.random.PRNGKey(seed),
                                          _SNAPSHOT_TAG)

    state_path = f"{output_weights}.train_state"
    resume_meta = {"batch_size": cfg.batch_size, "seed": seed,
                   "augment": cfg.augment, "compute_dtype": cfg.compute_dtype,
                   "mirror": cfg.mirror, "ema_rampup": cfg.ema_rampup}
    if resume_from:
        state = ckpt.restore_gan_train_state(state, resume_from,
                                             expect_meta=resume_meta)
    if mesh is not None:
        # Replicate AFTER any restore: restore returns host numpy leaves
        # (see train_viscoin's identical ordering).
        state = replicate(mesh, state)
        g_extras = replicate(mesh, g_extras)

    it = loop_iter(train_loader)
    base_rng = jax.random.PRNGKey(seed)
    start = int(jax.device_get(state.step))
    if start and hasattr(train_loader, "skip_batches"):
        # Replay position (deterministic resume, exactly like train_viscoin):
        # only full batches become steps.
        steps_per_epoch = len(train_loader.dataset) // cfg.batch_size
        epochs_done, rem = divmod(start, steps_per_epoch)
        train_loader.skip_batches(epochs_done * len(train_loader) + rem)
    def _next_images():
        images, _ = next(it)
        while images.shape[0] != local_bs:  # shape stability under jit
            images, _ = next(it)
        if mesh is not None:
            from viscoin_tpu.parallel.mesh import image_spec

            return global_shard_batch(mesh, np.asarray(images),
                                      specs=(image_spec(mesh),))
        return jnp.asarray(images)

    prefetcher = None
    if prefetch > 0:
        # Overlap host loading + the host→device upload with the running
        # step, exactly like train_viscoin (order-preserving single
        # producer — the deterministic-resume replay is unchanged).
        from viscoin_tpu.data.loader import DevicePrefetcher

        prefetcher = DevicePrefetcher(_next_images, prefetch)
        next_images = prefetcher.next
    else:
        next_images = _next_images

    try:
        for i in range(start, cfg.iterations):
            images = next_images()
            state, metrics = step(state, g_extras, images,
                                  jax.random.fold_in(base_rng, i))
            if i % 100 == 0 or i == cfg.iterations - 1:
                logger.info(json.dumps(
                    {"iteration": i, **{k: float(v) for k, v in metrics.items()}}))
            if fid_enabled and \
                    ((i > start and i % fid_every == 0) or i == cfg.iterations - 1):
                ema_vars = export_generator_vars(state, g_extras)
                # Fresh draws per eval point, on the tag-rooted stream.
                fid_base = jax.random.fold_in(base_rng, _FID_TAG)
                stats_fake = accumulate_fake_fid_stats(
                    detector, fake_images_fn, ema_vars,
                    jax.random.fold_in(fid_base, i), fid_samples)
                fid = fid_from_stats(stats_real, stats_fake)
                logger.info(json.dumps({"iteration": i, "fid": fid}))
                click.echo(f"it {i}: fid={fid:.3f} "
                           f"({stats_fake.num_items} fakes)")
            if snapshot_fn is not None and \
                    (i % snapshot_every == 0 or i == cfg.iterations - 1) \
                    and jax.process_index() == 0:
                from PIL import Image

                u8 = np.asarray(jax.device_get(snapshot_fn(
                    export_generator_vars(state, g_extras), snapshot_key)))
                n, h, w, c = u8.shape  # 16 -> 4x4 grid
                grid = u8.reshape(4, 4, h, w, c).transpose(0, 2, 1, 3, 4)
                grid = grid.reshape(4 * h, 4 * w, c)
                Image.fromarray(grid).save(f"fakes_{i:06d}.png")
            if checkpoint_every and i > start and i % checkpoint_every == 0 \
                    and jax.process_index() == 0:
                ckpt.save_gan_train_state(state, state_path, meta=resume_meta,
                                          async_save=True)

    finally:
        # runs on every exit (step/FID/IO exception, Ctrl-C): a leaked
        # producer would block in put() holding device batches
        if prefetcher is not None:
            prefetcher.close()

    if jax.process_index() == 0:
        ckpt.wait_for_saves()  # mid-run async saves commit before the final
        ckpt.save_gan_train_state(state, state_path, meta=resume_meta)
        ckpt.save_pytree(export_generator_vars(state, g_extras), output_weights)
        click.echo(f"saved EMA generator variables to {output_weights} "
                   f"(+ resumable train state at {state_path})")


def _load_fid_detector(path: str):
    """Resolve the pluggable FID detector seam: the NVlabs TorchScript file
    (.pt → bit-exact host wrapper), a ported NVlabs-convention orbax dir
    (fid_convention.json marker), or a pytorch-fid-convention orbax dir."""
    import json
    import os

    from viscoin_tpu.utils import checkpoints as ckpt

    if path.endswith(".pt"):
        import jax

        if jax.process_count() > 1:
            raise ValueError(
                "--fid-detector <file>.pt runs the TorchScript detector on "
                "host CPU and needs host-local features — unavailable on "
                "multi-host runs (the eval batch is sharded across hosts). "
                "Port it instead: scripts/port_weights.py inception-nvlabs "
                f"{path} checkpoints/inception (device-side, multi-host "
                "capable, numerically self-verified).")
        from viscoin_tpu.models.inception import make_torchscript_fid_detector

        click.echo(f"FID: exact NVlabs TorchScript detector ({path}, host CPU)")
        return make_torchscript_fid_detector(path)
    marker = os.path.join(path, "fid_convention.json")
    if os.path.exists(marker):
        with open(marker) as f:
            convention = json.load(f).get("convention")
        if convention == "nvlabs":
            from viscoin_tpu.models.inception import make_nvlabs_fid_detector

            click.echo(f"FID: ported NVlabs-convention detector ({path})")
            return make_nvlabs_fid_detector(ckpt.restore_pytree(path))
    from viscoin_tpu.models.inception import make_fid_detector

    return make_fid_detector(ckpt.restore_pytree(path))


def build_viscoin_modules(n_classes: int, size: int):
    """Module definitions + init for the `train viscoin` ensemble — the ONE
    construction site, shared by :func:`_train_viscoin` and the ``prewarm``
    command. prewarm's cache-warming guarantee rests on compiling the SAME
    traced program as training, so any geometry drift between the two would
    silently void it; a single builder removes that channel.

    Returns ``(models, generator, lpips, init_gvars, init_lparams)`` — the
    last two are thunks so training only pays the random inits when the
    corresponding checkpoint is absent (weight VALUES don't affect the
    compiled HLO; only the module definitions here do)."""
    import jax.numpy as jnp

    from viscoin_tpu.models.bundle import default_models, init_models
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.stylegan import Generator

    models = default_models(n_classes=n_classes, img_resolution=size,
                            channel_base=16384)
    models = init_models(models, jax.random.PRNGKey(0), image_size=size)
    generator = Generator(z_dim=512, w_dim=512, img_resolution=size,
                          channel_base=16384, mapping_layers=2)
    lpips = LPIPS()

    def init_gvars():
        return jax.jit(generator.init, static_argnames=("noise_mode",))(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 512)),
            noise_mode="const")

    def init_lparams():
        return jax.jit(lpips.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, size, size, 3)))["params"]

    return models, generator, lpips, init_gvars, init_lparams


def _train_viscoin(dataset: DatasetType, learning_rate, epochs, batch_size,
                   gradient_accumulation_steps, data_parallel, resume_from=None,
                   profile_dir=None, fid_detector_path=None, model_parallel=1,
                   compute_dtype="bfloat16", ds_kwargs=None, eval_every=2000,
                   checkpoint_every=20_000, faithfulness_every=25_000,
                   prefetch=1):
    from viscoin_tpu.models.stylegan import adapted_params_from_gan
    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, train_viscoin
    from viscoin_tpu.utils import checkpoints as ckpt

    mesh = _build_mesh(data_parallel, model_parallel)

    params = VisCoINTrainingParams(
        learning_rate=learning_rate, iterations=epochs, batch_size=batch_size,
        gradient_accumulation=gradient_accumulation_steps,
        compute_dtype=compute_dtype,
    )
    configure_score_logging(f"viscoin_{params.iterations}.jsonl")
    train_loader, test_loader = get_dataloaders(dataset, params.batch_size,
                                                **(ds_kwargs or {}))
    n_classes = train_loader.dataset.N_CLASSES
    size = train_loader.dataset.out_size

    models, generator, lpips, init_gvars, init_lparams = \
        build_viscoin_modules(n_classes, size)

    # Frozen pretrained pieces: classifier + original GAN (reference loads
    # torch pickles from its DEFAULT_CHECKPOINTS conventions; here orbax
    # checkpoints, with path datasets keyed by their basename).
    cls_path = default_checkpoints(dataset)["classifier"]
    gan_path = default_checkpoints(dataset)["gan"]
    import os

    if os.path.exists(cls_path):
        models.classifier_vars = ckpt.restore_pytree(cls_path)
    else:
        click.echo(f"WARNING: classifier checkpoint {cls_path} not found — "
                   "training against a RANDOM classifier.")
    if os.path.exists(gan_path):
        gvars = ckpt.restore_pytree(gan_path)
        models.gan_vars = adapted_params_from_gan(models.gan_vars, gvars)
    else:
        click.echo(f"WARNING: GAN checkpoint {gan_path} not found — "
                   "using a RANDOM generator.")
        gvars = init_gvars()

    lpips_path = "checkpoints/lpips-vgg"
    if os.path.exists(lpips_path):
        lparams = ckpt.restore_pytree(lpips_path)
    else:
        click.echo("WARNING: no LPIPS weights at checkpoints/lpips-vgg — "
                   "random-VGG perceptual loss (port with convert_torch_lpips).")
        lparams = init_lparams()

    # FID in the every-2000-it eval (reference: testing/viscoin.py:84-90 with
    # the downloaded Inception detector; here a local ported checkpoint, the
    # ported NVlabs convention, or the NVlabs TorchScript file itself).
    fid_detector = None
    inception_path = fid_detector_path or "checkpoints/inception"
    if os.path.exists(inception_path):
        fid_detector = _load_fid_detector(inception_path)
    else:
        click.echo("NOTE: no checkpoints/inception — in-training eval skips FID "
                   "(port weights with scripts/port_weights.py inception, or "
                   "pass --fid-detector).")

    train_viscoin(models, generator, gvars, lpips, lparams,
                  train_loader, test_loader, params, mesh=mesh,
                  resume_from=resume_from, profile_dir=profile_dir,
                  fid_detector=fid_detector, eval_every=eval_every,
                  prefetch=prefetch,
                  checkpoint_every=checkpoint_every,
                  faithfulness_every=faithfulness_every)
