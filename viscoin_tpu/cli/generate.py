"""`generate` command: sample images from a trained/ported generator.

The stylegan2-ada ecosystem's ``generate.py`` analogue (the reference's GAN
workflows live in that external repo, reference viscoin/cli/train.py:202-205
— this framework keeps them in the CLI). Works on a ``train gan`` export or
a ``port_weights.py stylegan`` port; architecture inferred from the
checkpoint. Each image is a pure function of its seed (z = normal draws
keyed by PRNGKey(seed), computed inside the jit), so seed 7 renders the same
picture whatever batch it lands in — upstream's per-seed RandomState
semantics, with JAX keys. ``--trunc`` applies w_avg truncation through the
exported moving_stats (upstream --trunc)."""

from __future__ import annotations

import click


def parse_seeds(spec: str, flag: str = "--seeds") -> list[int]:
    """'0-3,7,10-11' → [0, 1, 2, 3, 7, 10, 11] (upstream --seeds syntax).
    ``flag`` names the CLI option in error messages (style-mixing reuses
    this parser for --rows/--cols/--col-styles)."""
    out: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        lo, sep, hi = part.partition("-")
        try:
            if sep:
                a, b = int(lo), int(hi)
                if b < a:
                    raise ValueError
                out.extend(range(a, b + 1))
            else:
                out.append(int(part))
        except ValueError:
            raise click.UsageError(
                f"{flag} {spec!r}: expected comma-separated ints/ranges "
                "like '0-15,20,33'") from None
    if not out:
        raise click.UsageError(f"{flag} {spec!r}: no seeds parsed")
    return out


@click.command()
@click.option("--gan", "gan_path", type=click.Path(exists=True), required=True,
              help="Generator variables: a `train gan` export or a "
                   "`port_weights.py stylegan` port (architecture inferred)")
@click.option("--seeds", default="0-15", show_default=True,
              help="Comma-separated seeds/ranges (e.g. '0-15,20,33'); one "
                   "image per seed, each a pure function of its seed")
@click.option("--trunc", "truncation_psi", type=float, default=1.0,
              show_default=True,
              help="Truncation psi toward the exported w_avg (1.0 = off, "
                   "upstream --trunc semantics)")
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True,
              help="Per-pixel synthesis noise (upstream --noise-mode)")
@click.option("--outdir", type=click.Path(), default="out", show_default=True)
@click.option("--batch-size", default=16, show_default=True)
def generate(gan_path, seeds, truncation_psi, noise_mode, outdir, batch_size):
    """Render seed{N}.png images from a (trained or ported) generator."""
    import os

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from viscoin_tpu.cli.utils import load_generator

    seed_list = parse_seeds(seeds)
    generator, gvars = load_generator(gan_path)

    @jax.jit
    def sample(gvars, seed_arr, key):
        z = jax.vmap(lambda s: jax.random.normal(
            jax.random.PRNGKey(s), (generator.z_dim,)))(seed_arr)
        img = generator.apply(gvars, z, truncation_psi=truncation_psi,
                              noise_mode=noise_mode, rngs={"noise": key})
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5,
                        0.0, 255.0).astype(jnp.uint8)

    os.makedirs(outdir, exist_ok=True)
    for s in range(0, len(seed_list), batch_size):
        batch = seed_list[s : s + batch_size]
        # pad to the steady shape for jit stability; padded rows sliced off
        padded = batch + [batch[-1]] * (batch_size - len(batch))
        u8 = np.asarray(sample(gvars, jnp.asarray(padded, jnp.int32),
                               jax.random.fold_in(jax.random.PRNGKey(
                                   batch[0]), s)))[: len(batch)]
        for seed, img in zip(batch, u8):
            arr = img[..., 0] if img.shape[-1] == 1 else img
            Image.fromarray(arr).save(
                os.path.join(outdir, f"seed{seed:04d}.png"))
    click.echo(f"wrote {len(seed_list)} images to {outdir} "
               f"(trunc={truncation_psi}, noise={noise_mode})")
