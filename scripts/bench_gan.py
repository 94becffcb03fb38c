"""Benchmark the in-framework StyleGAN2(-ADA) train step on the attached chip.

The reference outsources GAN training to stylegan2-ada-pytorch (reference:
viscoin/cli/train.py:202-205); train/gan.py provides it in-framework. This
script times ONE jitted G+D step (style mixing, lazy R1/PPL on cadence, ADA
pipe, EMA) at an arbitrary config and prints a JSON line — the provenance
for the GAN rows of BASELINE.md.

Usage (from /root/repo so the axon sitecustomize stays on PYTHONPATH):
    python scripts/bench_gan.py --res 256 --batch 16 --augment ada
    python scripts/bench_gan.py --res 256 --batch 16 --dtype float32
    python scripts/bench_gan.py ... --profile-dir /tmp/ganprof
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--channel-base", type=int, default=16384)
    ap.add_argument("--channel-max", type=int, default=512)
    ap.add_argument("--augment", default="ada", choices=["ada", "fixed", "none"])
    ap.add_argument("--augment-p", type=float, default=0.3)
    ap.add_argument("--dtype", default=None,
                    help="compute dtype override (default: dataclass default)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile-dir", default=None)
    args = ap.parse_args()

    from viscoin_tpu.models.stylegan import Discriminator, Generator
    from viscoin_tpu.train.gan import (
        GANTrainingParams,
        create_gan_train_state,
        make_gan_train_step,
    )

    kw = {"augment": args.augment, "augment_p": args.augment_p,
          "batch_size": args.batch}
    if args.dtype is not None:
        kw["compute_dtype"] = args.dtype
    cfg = GANTrainingParams(**kw)

    generator = Generator(z_dim=512, w_dim=512, img_resolution=args.res,
                          channel_base=args.channel_base,
                          channel_max=args.channel_max, mapping_layers=2)
    discriminator = Discriminator(img_resolution=args.res,
                                  channel_base=args.channel_base,
                                  channel_max=args.channel_max,
                                  mbstd_group_size=min(4, cfg.batch_size))

    state, g_extras = create_gan_train_state(generator, discriminator,
                                             jax.random.PRNGKey(0), cfg, args.res)
    step = make_gan_train_step(generator, discriminator, cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 256, (cfg.batch_size, args.res, args.res, 3), dtype=np.uint8))

    def sync(m):
        # Host readback of values depending on the full step (relay flush);
        # check finiteness of both losses while we're at it.
        g, d = float(m["g_loss"]), float(m["d_loss"])
        assert np.isfinite(g) and np.isfinite(d), f"non-finite losses {g} {d}"
        return g, d

    t0 = time.time()
    state, metrics = step(state, g_extras, images, jax.random.PRNGKey(1))
    sync(metrics)
    compile_s = time.time() - t0
    state, metrics = step(state, g_extras, images, jax.random.PRNGKey(2))
    sync(metrics)

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            for i in range(4):
                state, metrics = step(state, g_extras, images,
                                      jax.random.PRNGKey(3 + i))
            sync(metrics)

    t0 = time.time()
    for i in range(args.iters):
        state, metrics = step(state, g_extras, images, jax.random.PRNGKey(10 + i))
    g_loss, d_loss = sync(metrics)
    dt = (time.time() - t0) / args.iters

    print(json.dumps({
        "metric": "gan_train_ms_per_step",
        "value": round(dt * 1000, 2),
        "unit": "ms",
        "detail": {
            "res": args.res, "batch": cfg.batch_size,
            "channel_base": args.channel_base, "augment": args.augment,
            "dtype": getattr(cfg, "compute_dtype", "float32"),
            "images_per_sec": round(cfg.batch_size / dt, 1),
            "compile_s": round(compile_s, 1),
            "g_loss": round(g_loss, 4), "d_loss": round(d_loss, 4),
            "ada_p": round(float(metrics["ada_p"]), 4),
        },
    }))


if __name__ == "__main__":
    main()
