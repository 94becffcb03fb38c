"""`fid` command: offline GAN metrics (FID / KID / PPL) of a generator.

The stylegan2-ada ecosystem's ``calc_metrics.py`` analogue — the reference
consumes GAN pickles selected BY these metrics (reference
viscoin/cli/train.py:202-205), and `train gan`'s multi-host FID refusal
points here. Works on a ``train gan`` export or a
``port_weights.py stylegan`` port; the generator's architecture is inferred
from the checkpoint (``generator_config_from_params``), so no shape flags
are needed. FID/KID: real-side features come from one deterministic pass
over the TRAIN split (fid50k_full semantics: the training distribution),
fake-side samples from fresh z through the generator, both through the same
[0,1] → ImageNet adapter and the pluggable FID detector. PPL needs no
dataset or detector — only the generator and LPIPS weights (eval/ppl.py);
``--lpips-detector vgg16.pt`` swaps in the reference ecosystem's exact
TorchScript perceptual net for upstream-comparable absolute values."""

from __future__ import annotations

import json

import click

from viscoin_tpu.cli.utils import dataset, device


@click.command()
@dataset
@device
@click.option("--gan", "gan_path", type=click.Path(exists=True), required=True,
              help="Generator variables: a `train gan` export or a "
                   "`port_weights.py stylegan` port (architecture inferred)")
@click.option("--fid-detector", "fid_detector_path",
              type=click.Path(exists=True), default=None,
              help="FID feature detector (see `train --fid-detector`). "
                   "Default: checkpoints/inception")
@click.option("--samples", default=8192, show_default=True,
              help="Samples per side (upstream fid50k_full uses 50000; "
                   "smaller is faster and noisier — comparable across runs "
                   "at a fixed value)")
@click.option("--batch-size", default=64, show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.option("--lpips-detector", "lpips_detector_path",
              type=click.Path(exists=True), default=None,
              help="PPL perceptual network override: the reference "
                   "ecosystem's vgg16.pt TorchScript file (host CPU, "
                   "numerically upstream-comparable PPL — the perceptual "
                   "analogue of --fid-detector <file>.pt), or an alternate "
                   "ported-LPIPS orbax dir. Default: checkpoints/lpips-vgg")
@click.option("--ppl-sampling", type=click.Choice(["end", "full"]),
              default="end", show_default=True,
              help="PPL path-segment sampling: 'end' is upstream's "
                   "published ppl2_wend configuration (t=0, measure at the "
                   "segment start); 'full' draws t~U(0,1) along the whole "
                   "W segment")
@click.option("--metric", "metrics", multiple=True,
              type=click.Choice(["fid", "kid", "pr", "ppl"]),
              default=("fid",), show_default=True,
              help="Metric(s), repeatable. fid (Fréchet), kid (kernel "
                   "inception distance, the upstream kid50k_full analogue — "
                   "unbiased at small sample counts, the metric of choice "
                   "for CUB-sized datasets) and pr (improved "
                   "precision/recall, the pr50k3 analogue — fidelity vs "
                   "coverage) share one pass over the same detector "
                   "features; ppl (perceptual path length, the ppl2_wend "
                   "analogue) measures W-space smoothness via LPIPS and "
                   "needs checkpoints/lpips-vgg instead of a "
                   "dataset/detector")
def fid(dataset, device, gan_path, fid_detector_path, lpips_detector_path,
        samples, batch_size, seed, ppl_sampling, metrics):
    """Offline FID/KID/PPL of a (trained or ported) generator."""
    import os

    import jax

    from viscoin_tpu.cli.utils import load_generator

    if samples < 1:
        raise click.UsageError(f"--samples {samples}: need at least 1")
    generator, gvars = load_generator(gan_path)
    res = generator.img_resolution
    # KID and precision/recall work on raw features, not moments.
    want_features = "kid" in metrics or "pr" in metrics
    out = {}

    if "fid" in metrics or want_features:
        from viscoin_tpu.cli.train import _load_fid_detector
        from viscoin_tpu.data.utils import get_datasets
        from viscoin_tpu.eval.fid import (
            fid_from_stats,
            kid_from_stats,
            pr_from_stats,
        )
        from viscoin_tpu.train.gan import (
            accumulate_fake_fid_stats,
            accumulate_real_fid_stats,
            make_gan_fid_fns,
        )

        detector_path = fid_detector_path or "checkpoints/inception"
        if not os.path.exists(detector_path):
            raise click.UsageError(
                f"no FID detector at {detector_path} (port weights with "
                "scripts/port_weights.py inception / inception-nvlabs, or "
                "pass --fid-detector)")
        detector = _load_fid_detector(detector_path)
        fake_images_fn, real_images_fn = make_gan_fid_fns(generator,
                                                          batch_size)

        # Real side: deterministic pass over the training distribution with
        # the SAME geometry `train gan` feeds the discriminator
        # (transform="gan": full-short-side center crop + resize — upstream
        # calc_metrics.py fid50k_full consumes raw dataset-zip images, never
        # classifier-style random crops); the dataset decodes at the
        # generator's resolution (image-folder roots honor out_size;
        # fixed-geometry registry datasets must already match).
        resizable = os.path.isdir(dataset) or dataset.lower().endswith(".zip")
        kwargs = {"out_size": res} if resizable else {}
        train_ds, _ = get_datasets(dataset, "gan", train_only=True, **kwargs)
        if train_ds.out_size != res:
            raise click.UsageError(
                f"dataset decodes at {train_ds.out_size}² but the generator "
                f"is {res}² — FID sides must see the same resolution")
        if len(train_ds) < batch_size:
            raise click.UsageError(
                f"dataset has {len(train_ds)} images < --batch-size "
                f"{batch_size}: no full real-side batch can be formed "
                "(lower --batch-size)")
        stats_real = accumulate_real_fid_stats(detector, real_images_fn,
                                               train_ds, batch_size, samples,
                                               capture_all=want_features)

        stats_fake = accumulate_fake_fid_stats(
            detector, fake_images_fn, gvars, jax.random.PRNGKey(seed),
            samples, capture_all=want_features)

        if "fid" in metrics:
            out["fid"] = fid_from_stats(stats_real, stats_fake)
        if "kid" in metrics:
            out["kid"] = kid_from_stats(stats_real, stats_fake, seed=seed)
        if "pr" in metrics:
            out["precision"], out["recall"] = pr_from_stats(stats_real,
                                                            stats_fake)
        out["real_items"] = stats_real.num_items

    if "ppl" in metrics:
        if lpips_detector_path and lpips_detector_path.endswith(".pt"):
            # The reference ecosystem's vgg16.pt: distance through the exact
            # TorchScript module on host CPU — PPL values are then
            # numerically comparable with upstream-published numbers.
            from viscoin_tpu.eval.ppl import compute_ppl_torchscript

            click.echo("PPL: exact NVlabs TorchScript perceptual net "
                       f"({lpips_detector_path}, host CPU)")
            out["ppl"] = compute_ppl_torchscript(
                generator, gvars, lpips_detector_path, samples, batch_size,
                seed=seed, sampling=ppl_sampling)
        else:
            from viscoin_tpu.cli.utils import require_lpips
            from viscoin_tpu.eval.ppl import compute_ppl
            from viscoin_tpu.models.lpips import LPIPS

            lparams = require_lpips(
                "--metric ppl (PPL through a random VGG is meaningless):",
                **({"path": lpips_detector_path}
                   if lpips_detector_path else {}))
            out["ppl"] = compute_ppl(generator, gvars, LPIPS(), lparams,
                                     samples, batch_size, seed=seed,
                                     sampling=ppl_sampling)

    print(json.dumps({**out, "samples": samples,
                      "dataset": str(dataset), "gan": str(gan_path)}))
