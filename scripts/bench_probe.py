"""Faithfulness-probe wall time, before vs after batching (VERDICT r4 item 4).

BEFORE (the reference shape, training/viscoin.py:273-295): one
``amplify_concepts`` program dispatch per image — 200 sequential round trips
per probe, each with host-side selection logic between device calls.
AFTER: ``faithfulness_probe`` — fixed-shape batched device programs
(200 images → ceil(200/32) = 7 dispatches).

Run on the TPU:  python scripts/bench_probe.py [n_images] [--skip-old]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


def main():
    args = sys.argv[1:]
    skip_old = "--skip-old" in args
    if skip_old:
        args.remove("--skip-old")
    n = int(args[0]) if args else 200

    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.eval.viscoin import (
        amplify_concepts,
        faithfulness_probe,
        make_amplify_fns,
        make_faithfulness_fn,
    )
    from viscoin_tpu.models.bundle import default_models, init_models

    models = default_models(n_classes=200, n_concepts=256, img_resolution=256,
                            channel_base=16384)
    models = init_models(models, jax.random.PRNGKey(0), image_size=256)
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 256, (n, 256, 256, 3), dtype=np.uint8)

    out = {"n_images": n}

    # --- new batched path ---
    fn = make_faithfulness_fn(models)
    t0 = time.time()
    _ = faithfulness_probe(models, images_u8[:32], fn=fn)  # compile
    out["new_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    probs_new = faithfulness_probe(models, images_u8, fn=fn)
    out["new_probe_s"] = round(time.time() - t0, 2)

    if not skip_old:
        # --- old per-image path (the round-4 loop, verbatim semantics) ---
        fns = make_amplify_fns(models)
        probe_rng = np.random.default_rng((0, 1))
        x0 = device_preprocess(jnp.asarray(images_u8[:1]))[0]
        t0 = time.time()
        amplify_concepts(x0, models, {"method": "threshold", "threshold": 0.2},
                         [0.0, 1.0, 2.0, 4.0], rng=probe_rng, fns=fns)
        out["old_compile_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        probs_old = []
        for img in images_u8:
            x = device_preprocess(jnp.asarray(img[None]))[0]
            res = amplify_concepts(
                x, models, {"method": "threshold", "threshold": 0.2},
                [0.0, 1.0, 2.0, 4.0], rng=probe_rng, fns=fns)
            probs_old.append(res.best_concept_probas_best[1])
        out["old_probe_s"] = round(time.time() - t0, 2)
        out["speedup"] = round(out["old_probe_s"] / out["new_probe_s"], 1)
        out["max_abs_diff"] = float(np.max(np.abs(probs_new - np.asarray(probs_old))))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
