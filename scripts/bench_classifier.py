"""Benchmark the classifier train step on the attached chip.

Times ONE jitted ResNet-50 train step (device preprocessing, BatchNorm
running-stat updates, Adam) at the reference classifier config (reference:
viscoin/training/classifiers.py:24-29 — batch 32, Adam) and prints a JSON
line — the provenance for the classifier rows of BASELINE.md.

Usage (from /root/repo so the axon sitecustomize stays on PYTHONPATH):
    python scripts/bench_classifier.py --batch 32 --dtype bfloat16
    python scripts/bench_classifier.py --batch 32 --dtype float32
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
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.train.classifiers import (
        ClassifierState,
        make_classifier_train_step,
    )

    model = Classifier(output_classes=args.classes)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, args.res, args.res, 3)),
        train=False)
    tx = optax.adam(1e-3)
    state = ClassifierState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_classifier_train_step(model, tx, compute_dtype=args.dtype)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, args.classes, (args.batch,),
                                      dtype=np.int64).astype(np.int32))

    def sync(loss):
        # Host readback of a step-dependent value (relay flush).
        v = float(loss)
        assert np.isfinite(v), f"non-finite loss {v}"
        return v

    t0 = time.time()
    state, loss, _ = step(state, images, labels, jax.random.PRNGKey(1))
    sync(loss)
    compile_s = time.time() - t0
    state, loss, _ = step(state, images, labels, jax.random.PRNGKey(2))
    sync(loss)

    t0 = time.time()
    for i in range(args.iters):
        state, loss, _ = step(state, images, labels, jax.random.PRNGKey(10 + i))
    loss_v = sync(loss)
    dt = (time.time() - t0) / args.iters

    print(json.dumps({
        "metric": "classifier_train_ms_per_step",
        "value": round(dt * 1000, 2),
        "unit": "ms",
        "detail": {
            "batch": args.batch, "res": args.res, "dtype": args.dtype,
            "images_per_sec": round(args.batch / dt, 1),
            "compile_s": round(compile_s, 1), "loss": round(loss_v, 4),
        },
    }))


if __name__ == "__main__":
    main()
