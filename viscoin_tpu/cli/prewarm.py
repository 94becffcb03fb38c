"""`prewarm` command: compile the `train viscoin` programs into the
persistent compile cache ahead of time.

The first step of a fresh `train viscoin` pays a full XLA compile of the
five-forward ensemble step — ~8 minutes cold through a remote-attached
(relay) compiler (BENCH_r03: compile_s=470 s cold vs ~25 s warm). The CLI
enables the persistent compilation cache (main.py), so that cost is paid
once per (program, compiler) — this command pays it explicitly, with
progress output, instead of as a silent stall inside the first training
step.

Correctness of the warm-up: weights ride the jitted programs as runtime
ARGUMENTS (never closures — CLAUDE.md), so the compiled HLO depends only on
shapes, dtypes, the config constants baked at trace time (lr schedule,
iteration count, loss coefficients), the mesh, and the compiler options.
Prewarming with randomly-initialized models under the SAME flags therefore
produces byte-identical cache keys to the real run. The flags here are the
exact compile-relevant subset of `train viscoin`'s: pass the same values
you will train with.
"""

from __future__ import annotations

import click

from viscoin_tpu.cli.utils import batch_size, dataset, device, learning_rate


@click.command()
@click.argument("model_name", default="viscoin", required=False,
                type=click.Choice(["viscoin", "gan"]))
@dataset
@device
@batch_size
@learning_rate
@click.option("--epochs", type=int, default=100_000, show_default=True,
              help="Iteration count you will train with (baked into the "
                   "compiled lr-decay schedule — must match)")
@click.option("--gradient-accumulation-steps", type=int, default=1,
              show_default=True)
@click.option("--data-parallel/--no-data-parallel", default=True,
              show_default=True)
@click.option("--model-parallel", type=int, default=1, show_default=True)
@click.option("--compute-dtype", type=click.Choice(["bfloat16", "float32"]),
              default="bfloat16", show_default=True)
@click.option("--image-size", type=int, default=None,
              help="Override the dataset's decode size (matches `train "
                   "--image-size`)")
@click.option("--channel-base", type=int, default=16384, show_default=True,
              help="[gan] StyleGAN2 channel base (match `train gan`)")
@click.option("--channel-max", type=int, default=512, show_default=True,
              help="[gan] StyleGAN2 channel cap (match `train gan`)")
@click.option("--mirror/--no-mirror", default=True, show_default=True,
              help="[gan] match `train gan --mirror`")
@click.option("--ema-rampup", type=float, default=None,
              help="[gan] match `train gan --ema-rampup`")
def prewarm(model_name, dataset, device, batch_size, learning_rate, epochs,
            gradient_accumulation_steps, data_parallel, model_parallel,
            compute_dtype, image_size, channel_base, channel_max, mirror,
            ema_rampup):
    """Pre-compile the `train viscoin` (or `train gan`) step into the
    compile cache (pass the SAME flags you will train with)."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from viscoin_tpu.cli.train import (
        _build_mesh,
        _dataset_kwargs,
        build_viscoin_modules,
    )
    from viscoin_tpu.data.utils import get_datasets
    from viscoin_tpu.train.viscoin import (
        VisCoINTrainingParams,
        create_train_state,
        fake_sample_keys,
        make_frozen,
        make_jitted_train_step,
        make_sample_fakes,
    )

    # Same shape sources as the trainers: the dataset decides
    # n_classes/out_size.
    ds_kwargs = _dataset_kwargs(dataset, image_size)
    train_ds, _ = get_datasets(
        dataset, *(("gan",) if model_name == "gan" else ()),
        train_only=True, **ds_kwargs)
    n_classes, size = train_ds.N_CLASSES, train_ds.out_size
    mesh = _build_mesh(data_parallel, model_parallel)

    if model_name == "gan":
        _prewarm_gan(size, batch_size, learning_rate, epochs, compute_dtype,
                     channel_base, channel_max, mirror, ema_rampup, mesh)
        return

    # IgnoreNone: an omitted --batch-size falls through to the dataclass
    # default exactly like `train viscoin`; use cfg.batch_size from here on.
    cfg = VisCoINTrainingParams(
        learning_rate=learning_rate, iterations=epochs, batch_size=batch_size,
        gradient_accumulation=gradient_accumulation_steps,
        compute_dtype=compute_dtype,
    )
    click.echo(f"prewarm: {n_classes} classes, {size}² images, batch "
               f"{cfg.batch_size}, {cfg.compute_dtype}, mesh="
               f"{dict(mesh.shape) if mesh is not None else None}")

    # ONE construction site with _train_viscoin (build_viscoin_modules):
    # the cache key depends on the module definitions, so sharing the
    # builder guarantees the prewarmed HLO is the training HLO.
    models, generator, lpips, init_gvars, init_lparams = \
        build_viscoin_modules(n_classes, size)
    gvars = init_gvars()
    lparams = init_lparams()

    step = make_jitted_train_step(models, generator, lpips, cfg, mesh=mesh,
                                  external_fakes=True)
    sampler = make_sample_fakes(generator, cfg, mesh=mesh)
    frozen = make_frozen(models, gvars, lparams,
                         compute_dtype=cfg.compute_dtype)
    state = create_train_state(models, cfg)
    if mesh is not None:
        from viscoin_tpu.parallel.mesh import replicate

        frozen = replicate(mesh, frozen)
        state = replicate(mesh, state)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (cfg.batch_size, size, size, 3),
                                      dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, n_classes, cfg.batch_size)
                         .astype(np.int32))
    keys = fake_sample_keys(jax.random.PRNGKey(0), 0,
                            max(1, cfg.fake_presample_steps))

    # AOT compile (no execution): .lower().compile() runs the same backend
    # compile as the first step would and lands in the persistent cache.
    t0 = time.time()
    click.echo("compiling frozen-GAN sampler...")
    sampler.lower(frozen, keys).compile()
    t1 = time.time()
    click.echo(f"  sampler: {t1 - t0:.1f}s")
    click.echo("compiling train step (the big one — minutes when cold)...")
    step.lower(state, frozen, images, labels, jax.random.PRNGKey(0),
               jnp.zeros((cfg.batch_size, size, size, 3),
                         jnp.dtype(cfg.compute_dtype))).compile()
    t2 = time.time()
    click.echo(f"  train step: {t2 - t1:.1f}s")

    # The in-loop cadence programs are the remaining cold compiles a fresh
    # run pays mid-training (measured through the relay: eval 80.7 s at its
    # first i=0 firing, probe 24.3 s at its first cadence hit). Same
    # shape/dtype signatures as the loop's calls: eval on (u8 batch, int32
    # labels, f32 valid) via make_test_step; the batched faithfulness probe
    # at its fixed chunk of 32.
    from viscoin_tpu.eval.viscoin import (
        _bundle_variables,
        make_faithfulness_fn,
        make_test_step,
    )

    click.echo("compiling in-loop eval step...")
    variables = _bundle_variables(models)
    valid = jnp.ones((cfg.batch_size,), jnp.float32)
    make_test_step(models, lpips, mesh=mesh).lower(
        variables, lparams, images, labels, valid).compile()
    t3 = time.time()
    click.echo(f"  eval step: {t3 - t2:.1f}s")
    click.echo("compiling faithfulness probe...")
    make_faithfulness_fn(models, mesh=mesh).lower(
        variables, jnp.zeros((32, size, size, 3), jnp.uint8)).compile()
    click.echo(f"  probe: {time.time() - t3:.1f}s")
    click.echo("done — a `train viscoin` run with these flags starts warm "
               "(cache: see JAX_COMPILATION_CACHE_DIR, default "
               "~/.cache/jax_comp_cache)")


def _prewarm_gan(size, batch_size, learning_rate, epochs, compute_dtype,
                 channel_base, channel_max, mirror, ema_rampup, mesh):
    """AOT-compile the `train gan` step under the exact training flags
    (the GAN step is the other multi-minute cold compile: lazy R1/PPL
    double-grad + the ADA pipe)."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from viscoin_tpu.cli.train import build_gan_modules
    from viscoin_tpu.train.gan import (
        GANTrainingParams,
        create_gan_train_state,
        make_gan_train_step,
    )

    cfg = GANTrainingParams(iterations=epochs, learning_rate=learning_rate,
                            batch_size=batch_size, compute_dtype=compute_dtype,
                            mirror=mirror, ema_rampup=ema_rampup)
    click.echo(f"prewarm gan: {size}² images, batch {cfg.batch_size}, "
               f"channel_base {channel_base}, {cfg.compute_dtype}, mesh="
               f"{dict(mesh.shape) if mesh is not None else None}")
    generator, discriminator = build_gan_modules(size, channel_base,
                                                 channel_max, cfg.batch_size)
    state, g_extras = create_gan_train_state(
        generator, discriminator, jax.random.PRNGKey(0), cfg, size)
    if mesh is not None:
        from viscoin_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)
        g_extras = replicate(mesh, g_extras)
    step = make_gan_train_step(generator, discriminator, cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (cfg.batch_size, size, size, 3),
                                      dtype=np.uint8))
    t0 = time.time()
    click.echo("compiling GAN step (minutes when cold)...")
    step.lower(state, g_extras, images, jax.random.PRNGKey(0)).compile()
    click.echo(f"  gan step: {time.time() - t0:.1f}s")
    click.echo("done — a `train gan` run with these flags starts warm")
