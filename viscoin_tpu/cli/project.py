"""`project` command: invert a target image into the generator's W space
(the stylegan2-ada projector.py analogue — see eval/projection.py for the
semantics and documented divergences). Writes proj.png (final render),
target.png (the geometry-matched target actually optimized against) and
projected_w.npz to --outdir."""

from __future__ import annotations

import click


@click.command()
@click.option("--gan", "gan_path", type=click.Path(exists=True), required=True,
              help="Generator variables: a `train gan` export or a "
                   "`port_weights.py stylegan` port (architecture inferred)")
@click.option("--target", "target_path", type=click.Path(exists=True),
              required=True, help="Target image file (any size; decoded "
                                  "with the GAN geometry at the generator's "
                                  "resolution)")
@click.option("--steps", "num_steps", default=1000, show_default=True,
              help="Optimization steps (one jitted lax.scan program)")
@click.option("--w-plus", is_flag=True,
              help="Optimize a per-layer W+ latent instead of one shared w")
@click.option("--seed", default=0, show_default=True)
@click.option("--outdir", type=click.Path(), default="proj", show_default=True)
def project(gan_path, target_path, num_steps, w_plus, seed, outdir):
    """Project a target image into W (writes proj.png + projected_w.npz)."""
    import os

    import numpy as np
    from PIL import Image

    from viscoin_tpu.cli.utils import load_generator, require_lpips
    from viscoin_tpu.data.transforms import host_gan_transform
    from viscoin_tpu.eval.projection import project_image
    from viscoin_tpu.models.lpips import LPIPS

    lparams = require_lpips("project (the projection loss is perceptual)")
    generator, gvars = load_generator(gan_path)

    res = generator.img_resolution
    # PIL-backed transforms need 2-D grayscale; the channel axis goes on
    # after the geometry.
    raw = np.asarray(Image.open(target_path).convert(
        "RGB" if generator.img_channels == 3 else "L"))
    target_u8 = host_gan_transform(raw, size=res)
    if target_u8.ndim == 2:
        target_u8 = target_u8[..., None]
    target = target_u8.astype(np.float32) / 127.5 - 1.0

    w, losses, render = project_image(generator, gvars, LPIPS(), lparams,
                                      target, num_steps=num_steps,
                                      w_plus=w_plus, seed=seed)
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "projected_w.npz"), w=w, losses=losses)
    for name, arr in (("proj.png", render), ("target.png", target_u8)):
        img = arr[..., 0] if arr.shape[-1] == 1 else arr
        Image.fromarray(img).save(os.path.join(outdir, name))
    click.echo(f"projected in {num_steps} steps: loss "
               f"{float(losses[0]):.4f} -> {float(losses[-1]):.4f}; wrote "
               f"{outdir}/proj.png, target.png, projected_w.npz"
               + (" (W+)" if w_plus else ""))
