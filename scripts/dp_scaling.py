"""Quantify the DP-scaling leg of the ≥384 img/s composition (BASELINE.md).

The multi-chip claim is a composition: measured per-chip rate (231 img/s at
batch 64, BENCH_r04) × GSPMD-sharded step (shard-invariance-tested at the
flagship geometry, tests/test_flagship_multichip.py) ⇒ ≥2 chips clear the
≥384 img/s north star. The missing leg was the COST of scaling: the per-step
gradient all-reduce. This script turns it into arithmetic:

1. **All-reduce volume** — the trainable set (Psi + Theta + adapted mapping;
   everything else is frozen, reference viscoin/training/viscoin.py:114-133)
   at fp32 grad dtype, counted exactly from the flagship module shapes
   (``jax.eval_shape``, no FLOPs spent).
2. **What the compiled program actually does** — lower + compile the
   2-device dp train step on a virtual CPU mesh and extract every collective
   op (all-reduce / reduce-scatter / all-gather / collective-permute) with
   its byte count from the optimized HLO. Confirms the arithmetic covers the
   real collectives rather than an assumed set.
3. **ICI/DCN time bound** — ring all-reduce cost 2(p-1)/p · V/B against
   v5e interconnect figures, and the resulting ≥2-chip throughput.

Run on CPU (any machine):  python scripts/dp_scaling.py [--toy] [--skip-hlo]
"""

import argparse
import json
import os
import re
import sys

if __name__ == "__main__":  # force the virtual 2-device CPU mesh
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if __name__ == "__main__":
    # The axon sitecustomize latches JAX_PLATFORMS at interpreter start; the
    # env var above is too late, so pin the config value too (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Interconnect assumptions (stated, conservative):
#  * v5e ICI: the public spec is 1600 Gbps/chip aggregate interchip bandwidth
#    (4 links, 2-D torus). Per-link one-way ≈ 25 GB/s; a 2-chip ring is
#    assumed to use ONE link pair (wrap-around would double it — ignored).
#  * DCN (multi-host): 100 Gbps-class NIC per host ⇒ 12.5 GB/s one-way,
#    shared by the host's chips.
ICI_ONE_WAY_BYTES_PER_S = 25e9
DCN_ONE_WAY_BYTES_PER_S = 12.5e9
# Measured single-chip flagship rate (BENCH_r04 / BASELINE.md): batch 64 at
# 231.0 img/s ⇒ 277 ms/step including the amortized frozen-GAN sampler.
MEASURED_IMG_PER_S = 231.0
BATCH_PER_CHIP = 64


def flagship_trainable_shapes():
    """(name -> ShapeDtypeStruct tree) of the trainable set at the flagship
    geometry, via eval_shape (no compute)."""
    from viscoin_tpu.models.bundle import default_models

    models = default_models(n_classes=200, n_concepts=256, img_resolution=256,
                            channel_base=16384)

    def init(rng):
        x = jnp.zeros((1, 256, 256, 3), jnp.float32)
        cvars = models.classifier.init(rng, x, train=False)
        _, hidden = models.classifier.apply(cvars, x, train=False)
        psi = models.concept_extractor.init(rng, tuple(hidden[-3:]))["params"]
        phi, phi_prime = models.concept_extractor.apply(
            {"params": psi}, tuple(hidden[-3:]))
        theta = models.explainer.init(rng, phi)["params"]
        gan = models.gan.init({"params": rng}, phi, phi_prime,
                              noise_mode="const")
        return {"concept_extractor": psi, "explainer": theta,
                "mapping": gan["params"]["mapping"]}

    return jax.eval_shape(init, jax.random.PRNGKey(0))


def tree_bytes(tree, dtype_bytes: int = 4) -> tuple[int, int]:
    """(param_count, grad_bytes) of a shape tree; grads are fp32."""
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
    return n, n * dtype_bytes


_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|u64|u32|u16|u8|s64|s32|s16|s8|pred)"
                       r"\[([\d,]*)\]")
_DTYPE_BYTES = {"f64": 8, "u64": 8, "s64": 8, "f32": 4, "u32": 4, "s32": 4,
                "bf16": 2, "f16": 2, "u16": 2, "s16": 2, "u8": 1, "s8": 1,
                "pred": 1}
_COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
                "collective-permute")


def collective_bytes(hlo_text: str) -> dict[str, dict]:
    """Per-collective-kind {count, bytes} from optimized HLO text. Bytes are
    the RESULT shapes of each collective op (tuple shapes summed; '-start'
    async forms counted, their '-done' halves skipped)."""
    out: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*?)\s+([\w\-]+)\(",
                     line)
        if not m:
            continue
        result_ty, op = m.groups()
        kind = next((c for c in _COLLECTIVES
                     if op == c or op == c + "-start"), None)
        if kind is None:
            continue
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(result_ty):
            elems = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
            nbytes += elems * _DTYPE_BYTES[dt]
        ent = out.setdefault(kind, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
    return out


def toy_setup():
    """(models, generator, img_size): the test-suite toy geometry — the
    collectives' structure is geometry-independent, only their sizes scale."""
    from viscoin_tpu.models.bundle import VisCoINModels
    from viscoin_tpu.models.concept_extractor import ConceptExtractor
    from viscoin_tpu.models.explainer import Explainer
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.models.stylegan import Generator, GeneratorAdapted

    IMG, NC, NK = 32, 5, 8
    models = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64),
                              depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(
            n_concepts=NK, latent_channels=8, input_channels1=16,
            input_channels2=32, input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    generator = Generator(z_dim=16, w_dim=32, img_resolution=IMG,
                          channel_base=256, channel_max=16,
                          mapping_layers=2)
    return models, generator, IMG


def compiled_dp_step_hlo(toy: bool) -> str:
    """Lower + compile the 2-device dp train step; return optimized HLO."""
    from viscoin_tpu.models.bundle import default_models, init_models
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.parallel.mesh import make_mesh, replicate
    from viscoin_tpu.train.viscoin import (
        VisCoINTrainingParams,
        create_train_state,
        fake_sample_keys,
        make_frozen,
        make_jitted_train_step,
        make_sample_fakes,
    )

    if toy:
        models, generator, IMG = toy_setup()
        NC = 5
        batch = 4
    else:
        IMG, NC = 256, 200
        models = default_models(n_classes=NC, n_concepts=256,
                                img_resolution=IMG, channel_base=16384)
        generator = Generator(z_dim=512, w_dim=512, img_resolution=IMG,
                              channel_base=16384, mapping_layers=2)
        batch = 4  # shapes only — the collectives' grad volume is batch-free

    models = init_models(models, jax.random.PRNGKey(0), image_size=IMG)
    gvars = generator.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, generator.z_dim)), noise_mode="const")
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    cfg = VisCoINTrainingParams(iterations=100, batch_size=batch,
                                cd_fid_iteration=-1, fake_presample_steps=1)

    mesh = make_mesh(2)
    step = make_jitted_train_step(models, generator, lpips, cfg, mesh=mesh,
                                  external_fakes=True)
    frozen = replicate(mesh, make_frozen(models, gvars, lparams))
    state = replicate(mesh, create_train_state(models, cfg))
    sampler = make_sample_fakes(generator, cfg, mesh=mesh)
    fakes = sampler(frozen, fake_sample_keys(jax.random.PRNGKey(3), 0, 1))
    images = jnp.zeros((batch, IMG, IMG, 3), jnp.uint8)
    labels = jnp.zeros((batch,), jnp.int32)
    lowered = step.lower(state, frozen, images, labels,
                         jax.random.PRNGKey(3), fakes[0])
    return lowered.compile().as_text()


def ring_allreduce_seconds(volume_bytes: int, n_chips: int,
                           bw_one_way: float) -> float:
    """Ring all-reduce: each chip sends 2(p-1)/p · V bytes through its slowest
    link (reduce-scatter + all-gather)."""
    p = n_chips
    return 2 * (p - 1) / p * volume_bytes / bw_one_way


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true",
                    help="toy geometry for the HLO leg (fast; the volume "
                    "arithmetic is always flagship)")
    ap.add_argument("--skip-hlo", action="store_true",
                    help="skip the compile; arithmetic only")
    args = ap.parse_args()

    shapes = flagship_trainable_shapes()
    per_part = {k: tree_bytes(v) for k, v in shapes.items()}
    n_params = sum(n for n, _ in per_part.values())
    volume = sum(b for _, b in per_part.values())
    print("Trainable set (flagship 256²/256-concept geometry, fp32 grads):")
    for k, (n, b) in sorted(per_part.items()):
        print(f"  {k:20s} {n:>12,} params  {b / 1e6:8.1f} MB")
    print(f"  {'TOTAL':20s} {n_params:>12,} params  {volume / 1e6:8.1f} MB "
          f"all-reduced per step")

    step_s = BATCH_PER_CHIP / MEASURED_IMG_PER_S
    rows = []
    for n_chips, bw, net in [(2, ICI_ONE_WAY_BYTES_PER_S, "ICI"),
                             (4, ICI_ONE_WAY_BYTES_PER_S, "ICI"),
                             (8, ICI_ONE_WAY_BYTES_PER_S, "ICI"),
                             (2, DCN_ONE_WAY_BYTES_PER_S, "DCN"),
                             (16, DCN_ONE_WAY_BYTES_PER_S, "DCN")]:
        t_ar = ring_allreduce_seconds(volume, n_chips, bw)
        # Worst case: the all-reduce fully serializes after the backward
        # (GSPMD typically overlaps it with remaining backward compute).
        imgs = n_chips * BATCH_PER_CHIP / (step_s + t_ar)
        eff = imgs / (n_chips * MEASURED_IMG_PER_S)
        rows.append({"chips": n_chips, "net": net, "allreduce_ms":
                     round(t_ar * 1e3, 2), "img_per_s": round(imgs, 1),
                     "efficiency": round(eff, 4)})
        print(f"  {n_chips} chips over {net}: all-reduce {t_ar * 1e3:6.2f} ms "
              f"on a {step_s * 1e3:.0f} ms step -> {imgs:7.1f} img/s "
              f"({eff:.1%} scaling efficiency)")

    result = {"n_trainable_params": n_params, "allreduce_mb": volume / 1e6,
              "per_part_mb": {k: b / 1e6 for k, (_, b) in per_part.items()},
              "step_ms": step_s * 1e3, "scaling": rows}

    if not args.skip_hlo:
        print(f"\nCompiling the 2-device dp step "
              f"({'toy' if args.toy else 'FLAGSHIP'} geometry) ...")
        hlo = compiled_dp_step_hlo(args.toy)
        colls = collective_bytes(hlo)
        print("Collectives in the compiled dp-step HLO:")
        for kind, ent in sorted(colls.items()):
            print(f"  {kind:20s} x{ent['count']:<4d} {ent['bytes'] / 1e6:8.1f} MB")
        result["hlo_collectives"] = colls
        result["hlo_geometry"] = "toy" if args.toy else "flagship"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
