"""Benchmark: VisCoIN ensemble training step throughput on one chip.

Measures the FULL reference workload (SURVEY.md §3.1 hot loop: synthetic GAN
samples + f(x) + Psi + Theta + G(z) + f(x̂) + LPIPS + backward + both Adam
updates) as a single jitted step at the flagship configuration (256² images,
256 concepts, 200 classes, StyleGAN2-ADA 'auto' 256² channels).

Prints ONE JSON line:
  {"metric": "viscoin_train_images_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N / BASELINE_IMG_PER_SEC}

Baseline: the reference publishes no numbers (BASELINE.md). We anchor against
an analytic estimate of the reference's A100 throughput: ~8 steps/s at its
batch 16 (8 real + 8 GAN) ≈ 128 img/s — see BASELINE.md for the derivation.
vs_baseline > 3 meets the BASELINE.json north-star (≥3× reference A100 rate).
"""

import functools
import json
import os
import sys
import time

import numpy as np
import jax

# Persistent compilation cache: the step compile is expensive through a
# remote-attached compiler; cache it across bench runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 128.0  # estimated reference A100 throughput (BASELINE.md)


def build(batch: int, compute_dtype: str = "bfloat16", mesh=None,
          remat: str = "", fold_lpips: bool = False):
    """Flagship-config step + sampler + state. With ``mesh``: mesh-sharded
    jits and replicated state/frozen — run_multichip measures EXACTLY the
    single-chip model (one config source, not a copy)."""
    from viscoin_tpu.models.bundle import default_models, init_models
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.train.viscoin import (
        VisCoINTrainingParams,
        create_train_state,
        make_frozen,
        make_jitted_train_step,
        make_sample_fakes,
    )

    key = jax.random.PRNGKey(0)
    models = default_models(n_classes=200, n_concepts=256, img_resolution=256,
                            channel_base=16384)
    models = init_models(models, key, image_size=256)

    generator = Generator(z_dim=512, w_dim=512, img_resolution=256,
                          channel_base=16384, mapping_layers=2)
    gvars = jax.jit(generator.init, static_argnames=("noise_mode",))(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 512)), noise_mode="const"
    )
    lpips = LPIPS(fold_block12=fold_lpips)
    lparams = jax.jit(lpips.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 3))
    )["params"]

    cfg = VisCoINTrainingParams(iterations=100_000, batch_size=batch,
                                cd_fid_iteration=-1, compute_dtype=compute_dtype,
                                remat=remat)
    step = make_jitted_train_step(models, generator, lpips, cfg, mesh=mesh,
                                  external_fakes=True)
    sample_fakes = make_sample_fakes(generator, cfg, mesh=mesh)
    frozen = make_frozen(models, gvars, lparams, compute_dtype=compute_dtype)
    state = create_train_state(models, cfg)
    if mesh is not None:
        from viscoin_tpu.parallel.mesh import replicate

        frozen = replicate(mesh, frozen)
        state = replicate(mesh, state)
    return step, sample_fakes, state, frozen, cfg


def run(batch: int, iters: int = 20, compute_dtype: str = "bfloat16",
        remat: str = "", fold_lpips: bool = False) -> dict:
    """Times the PRODUCTION iteration: the K-step frozen-GAN presampling
    (VisCoINTrainingParams.fake_presample_steps) runs inside the timed loop,
    amortized exactly as the train loop amortizes it."""
    step, sample_fakes, state, frozen, cfg = build(batch, compute_dtype,
                                                   remat=remat,
                                                   fold_lpips=fold_lpips)
    from viscoin_tpu.train.viscoin import fake_sample_keys
    K = max(1, cfg.fake_presample_steps)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 200, batch).astype(np.int32))

    def fakes_for(i):
        return sample_fakes(frozen, fake_sample_keys(jax.random.PRNGKey(0), i, K))

    # NOTE: sync via host readback of a value that depends on the full step —
    # block_until_ready alone does not flush remote-attached (relay) devices.
    def sync(m):
        return float(m["total_loss"])

    # Warmup (compile) + 2 steps.
    t0 = time.time()
    fake_group = fakes_for(0)
    state, metrics = step(state, frozen, images, labels, jax.random.PRNGKey(0),
                          fake_group[0])
    sync(metrics)
    compile_s = time.time() - t0
    state, metrics = step(state, frozen, images, labels, jax.random.PRNGKey(1),
                          fake_group[1 % K])
    sync(metrics)

    t0 = time.time()
    for i in range(iters):
        if i % K == 0:
            fake_group = fakes_for(2 + i)
        state, metrics = step(state, frozen, images, labels,
                              jax.random.PRNGKey(2 + i), fake_group[i % K])
    loss = sync(metrics)
    dt = (time.time() - t0) / iters

    out = {
        "batch": batch,
        "steps_per_sec": 1.0 / dt,
        "images_per_sec": batch / dt,  # real images/step, like the reference's batch accounting
        "compile_s": compile_s,
        # Cold vs warm first step (VERDICT r3 item 5): a persistent-cache
        # hit makes the first step ~25 s through the relay; a cold compile
        # of the flagship step is ~8 min (BENCH_r03: 470 s). Anything over
        # a minute means the cache missed — expected after graph-changing
        # edits, and `main.py prewarm` pays it ahead of training.
        "compile_cold": compile_s > 60.0,
        "total_loss": loss,
    }
    if remat:
        out["remat"] = remat
    if fold_lpips:
        out["fold_lpips"] = True
    return out


def run_reconstruction(batch: int = 64, iters: int = 20) -> dict:
    """Inference throughput: concepts → reconstruction (BASELINE.json config 3,
    'concept amplification at interactive rate')."""
    from viscoin_tpu.models.bundle import default_models, init_models

    models = default_models(n_classes=200, n_concepts=256, img_resolution=256,
                            channel_base=16384)
    models = init_models(models, jax.random.PRNGKey(0), image_size=256)
    bf = jnp.bfloat16
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(bf) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    variables = {"classifier": cast(models.classifier_vars),
                 "psi": cast(models.concept_params), "gan": cast(models.gan_vars)}

    from viscoin_tpu.parallel.mesh import tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def recon(variables, images):
        _, hidden = models.classifier.apply(variables["classifier"], images, train=False)
        phi, pp = models.concept_extractor.apply({"params": variables["psi"]},
                                                 tuple(hidden[-3:]))
        return models.gan.apply(variables["gan"], phi, pp, noise_mode="const")

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), bf)
    y = recon(variables, x)
    _ = float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        y = recon(variables, x)
    _ = float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    return {"recon_images_per_sec": batch / dt, "recon_ms_per_batch": dt * 1000}


def run_multichip(batch_per_chip: int, iters: int = 10) -> dict:
    """Mesh-sharded train step over all local devices: img/s/chip + scaling
    efficiency vs the single-chip rate. Gated no-op on one device — the day
    multi-chip hardware appears this measures it with no code changes."""
    from viscoin_tpu.parallel.mesh import make_mesh, shard_batch

    n = len(jax.devices())
    batch = batch_per_chip * n
    mesh = make_mesh(n)
    step, sample_fakes, state, frozen, cfg = build(batch, mesh=mesh)
    K = max(1, cfg.fake_presample_steps)
    from viscoin_tpu.train.viscoin import fake_sample_keys

    def fakes_for(i):
        return sample_fakes(frozen, fake_sample_keys(jax.random.PRNGKey(0), i, K))

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    labels = rng.integers(0, 200, batch).astype(np.int32)
    im_sh, lb_sh = shard_batch(mesh, images, labels)

    fake_group = fakes_for(0)
    state, metrics = step(state, frozen, im_sh, lb_sh, jax.random.PRNGKey(0),
                          fake_group[0])
    float(metrics["total_loss"])
    t0 = time.time()
    for i in range(iters):
        if i % K == 0:
            fake_group = fakes_for(1 + i)
        state, metrics = step(state, frozen, im_sh, lb_sh,
                              jax.random.PRNGKey(1 + i), fake_group[i % K])
    float(metrics["total_loss"])
    dt = (time.time() - t0) / iters
    return {
        "n_chips": n,
        "batch_per_chip": batch_per_chip,
        "images_per_sec": batch / dt,
        "images_per_sec_per_chip": batch / dt / n,
    }


def run_sustained(batch: int = 64, iters: int = 2000, prefetch: int = 1,
                  eval_every: int = 500, checkpoint_every: int = 1000,
                  faithfulness_every: int = 1000) -> dict:
    """Sustained PRODUCTION throughput (VERDICT r4 item 5): a real flagship
    ``train_viscoin`` run with every cadence live — in-loop eval (FID-less),
    async checkpointing, the batched faithfulness probe, the K-step sampler,
    host data loading (+ optional prefetch overlap) — reporting the img/s a
    user actually experiences plus the per-cadence overhead split.

    Cadences are scaled to fire MORE often than production (eval 500 vs
    2000, ckpt 1000 vs 20k, probe 1000 vs 25k over ~2000 it), so the
    reported overhead over-states the production cost — the production
    number is steps-only rate minus (cadence cost × production frequency),
    all derivable from the split."""
    import tempfile

    from viscoin_tpu.cli.train import build_viscoin_modules
    from viscoin_tpu.data.datasets import SyntheticDataset
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, train_viscoin

    # The ONE construction site shared with `train viscoin` and `prewarm`
    # (CLAUDE.md): the sustained bench must time the exact trained/prewarmed
    # program — a hand-copied geometry here would silently diverge.
    models, generator, lpips, init_gvars, init_lparams = \
        build_viscoin_modules(n_classes=200, size=256)
    gvars = init_gvars()
    lparams = init_lparams()

    train_ds = SyntheticDataset(n=512, n_classes=200, image_size=256,
                                mode="train")
    test_ds = SyntheticDataset(n=256, n_classes=200, image_size=256,
                               mode="test")
    train_loader = DataLoader(train_ds, batch_size=batch, seed=0)
    test_loader = DataLoader(test_ds, batch_size=batch, shuffle=False)

    # The PRODUCTION config — full 100k-iteration schedule (the LR decay is
    # baked into the compiled step, so this also shares the prewarm/bench
    # compile-cache lineage), defaults for the loss gate; `stop_after`
    # bounds how long we run it, not what program compiles.
    cfg = VisCoINTrainingParams(iterations=100_000, batch_size=batch,
                                compute_dtype="bfloat16")
    timings: dict = {}
    t0 = time.time()
    with tempfile.TemporaryDirectory() as ckpt_dir:
        out = train_viscoin(models, generator, gvars, lpips, lparams,
                            train_loader, test_loader, cfg,
                            checkpoint_dir=ckpt_dir, eval_every=eval_every,
                            checkpoint_every=checkpoint_every,
                            faithfulness_every=faithfulness_every,
                            prefetch=prefetch, timings=timings,
                            stop_after=iters)
        # Flush the tail: every step after the last blocking cadence is
        # async-dispatched, so without a host readback of a value that
        # depends on the final state the wall clock misses in-flight device
        # work (block_until_ready does not flush the relay — CLAUDE.md).
        _ = float(np.asarray(
            jax.tree_util.tree_leaves(out.explainer_params)[0]).ravel()[0])
        wall = time.time() - t0

    out = {
        "iters": iters,
        "batch": batch,
        "prefetch": prefetch,
        "wall_s": round(wall, 1),
        "sustained_images_per_sec": round(iters * batch / wall, 2),
        # steady state = excluding each phase's first (compile-laden) hit
        "timings_s": {k: round(v, 2) if isinstance(v, float) else v
                      for k, v in sorted(timings.items())},
    }
    # Steady state: exclude each phase's FIRST (compile/cold) hit from the
    # wall. (The per-step host timings alone cannot give device throughput —
    # step dispatch is async, so device time is paid at the next blocking
    # point; wall-based accounting is the honest denominator.)
    cold = sum(timings.get(f"max_{p}", 0.0)
               for p in ("steps", "eval", "checkpoint", "probe"))
    if wall > cold and iters > 1:
        out["steady_images_per_sec"] = round(iters * batch / (wall - cold), 2)
        out["first_hit_cold_s"] = round(cold, 1)
    for phase in ("eval", "checkpoint", "probe"):
        tot, cnt = timings.get(phase, 0.0), timings.get(f"n_{phase}", 0)
        if cnt > 1:  # warm cost = excluding the compile-laden first hit
            out[f"{phase}_warm_s"] = round(
                (tot - timings.get(f"max_{phase}", 0.0)) / (cnt - 1), 2)
    return out


def fallback_ladder(batch: int) -> list[int]:
    """Deduplicated, strictly-decreasing OOM-fallback batches: never re-try
    a batch that already failed, never try a LARGER batch after a smaller
    one failed (each attempt costs a multi-minute remote compile)."""
    ladder = [b for b in dict.fromkeys([batch, batch // 2, batch // 4, 8])
              if b >= 1]
    return [b for i, b in enumerate(ladder) if all(b < p for p in ladder[:i])]


def main():
    args = sys.argv[1:]
    if "--sustained" in args:
        args.remove("--sustained")
        prefetch = 1
        if "--no-prefetch" in args:  # strip flags BEFORE the positional parse
            prefetch = 0
            args.remove("--no-prefetch")
        iters = int(args[0]) if args else 2000
        result = run_sustained(iters=iters, prefetch=prefetch)
        print(json.dumps({
            "metric": "viscoin_sustained_images_per_sec",
            "value": result["sustained_images_per_sec"],
            "unit": "img/s",
            "vs_baseline": round(
                result["sustained_images_per_sec"] / BASELINE_IMG_PER_SEC, 3),
            "detail": result,
        }))
        return
    fold_lpips = False
    if "--fold-lpips" in args:
        fold_lpips = True
        args.remove("--fold-lpips")
    remat = ""
    if "--remat" in args:
        i = args.index("--remat")
        if i + 1 >= len(args):
            raise SystemExit("usage: bench.py [batch] [--remat lpips+classifier+gan]")
        remat = args[i + 1]
        del args[i:i + 2]
    batch = int(args[0]) if args else 64
    result = None
    for b in fallback_ladder(batch):
        try:
            result = run(b, remat=remat, fold_lpips=fold_lpips)
            break
        except Exception as e:  # OOM fallback
            print(f"# batch {b} failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
    if result is None:
        print(json.dumps({"metric": "viscoin_train_images_per_sec", "value": 0.0,
                          "unit": "img/s", "vs_baseline": 0.0}))
        return
    try:
        result.update(run_reconstruction(result["batch"]))
    except Exception as e:
        print(f"# reconstruction bench failed: {type(e).__name__}", file=sys.stderr)
    if len(jax.devices()) > 1:
        try:
            mc = run_multichip(result["batch"])
            result["multichip"] = {k: round(v, 3) for k, v in mc.items()}
            result["scaling_efficiency"] = round(
                mc["images_per_sec_per_chip"] / result["images_per_sec"], 3)
        except Exception as e:
            print(f"# multichip bench failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
    value = round(result["images_per_sec"], 2)
    print(json.dumps({
        "metric": "viscoin_train_images_per_sec",
        "value": value,
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_PER_SEC, 3),
        "detail": {k: round(v, 4) if isinstance(v, float) else v
                   for k, v in result.items()},
    }))


if __name__ == "__main__":
    main()
