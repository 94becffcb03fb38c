"""`style-mixing` command: coarse/fine style-mixing grid from a generator.

The stylegan2-ada ecosystem's ``style_mixing.py`` analogue (the reference's
GAN workflows live in that external repo — this framework keeps them in the
CLI). Upstream semantics kept: per-seed latents (each image a pure function
of its seed, like `generate`), ``--col-styles`` selects which style layers
each column seed overrides in each row seed's W+ (default 0-6 = the coarse/
mid layers), truncation through the exported w_avg, and the output is both
per-cell ``{row}-{col}.png`` files and a ``grid.png`` whose top row / left
column are the pure column / row images with a black top-left corner.

TPU-first: the W+ mixing is a masked select INSIDE the jitted program — the
mapping runs once over the unique seeds, every grid cell (mixed AND pure)
is an (row_idx, col_idx) gather + `jnp.where` over the layer mask, and
synthesis runs in fixed-shape padded batches (one compiled program for the
whole grid)."""

from __future__ import annotations

import click

from viscoin_tpu.cli.generate import parse_seeds


@click.command(name="style-mixing")
@click.option("--gan", "gan_path", type=click.Path(exists=True), required=True,
              help="Generator variables: a `train gan` export or a "
                   "`port_weights.py stylegan` port (architecture inferred)")
@click.option("--rows", "row_spec", default="85,100,75", show_default=True,
              help="Row seeds (comma-separated ints/ranges; upstream --rows)")
@click.option("--cols", "col_spec", default="55,821,1789", show_default=True,
              help="Column seeds (upstream --cols)")
@click.option("--col-styles", "style_spec", default="0-6", show_default=True,
              help="Style-layer indices the column seed overrides "
                   "(upstream --styles; 0-6 = coarse/mid)")
@click.option("--trunc", "truncation_psi", type=float, default=1.0,
              show_default=True,
              help="Truncation psi toward the exported w_avg (1.0 = off)")
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--outdir", type=click.Path(), default="mix", show_default=True)
@click.option("--batch-size", default=16, show_default=True)
def style_mixing(gan_path, row_spec, col_spec, style_spec, truncation_psi,
                 noise_mode, outdir, batch_size):
    """Render a style-mixing grid (writes {row}-{col}.png + grid.png)."""
    import os

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from viscoin_tpu.cli.utils import load_generator
    from viscoin_tpu.models.stylegan import num_ws_for_resolution

    row_seeds = parse_seeds(row_spec, flag="--rows")
    col_seeds = parse_seeds(col_spec, flag="--cols")
    col_styles = parse_seeds(style_spec, flag="--col-styles")

    generator, gvars = load_generator(gan_path)

    num_ws = num_ws_for_resolution(generator.img_resolution)
    bad = [s for s in col_styles if not 0 <= s < num_ws]
    if bad:
        raise click.UsageError(
            f"--col-styles {style_spec!r}: indices {bad} out of range for "
            f"this generator's {num_ws} style layers")
    mask = np.zeros((num_ws,), bool)
    mask[col_styles] = True

    seeds = sorted(set(row_seeds) | set(col_seeds))
    idx = {s: i for i, s in enumerate(seeds)}

    @jax.jit
    def map_seeds(gvars, seed_arr):
        z = jax.vmap(lambda s: jax.random.normal(
            jax.random.PRNGKey(s), (generator.z_dim,)))(seed_arr)
        return generator.apply(
            gvars, z, truncation_psi=truncation_psi,
            method=lambda mdl, z, **kw: mdl.mapping(z, **kw))

    ws_all = map_seeds(gvars, jnp.asarray(seeds, jnp.int32))

    @jax.jit
    def render_cells(gvars, ws_all, row_idx, col_idx, key):
        mixed = jnp.where(jnp.asarray(mask)[None, :, None],
                          ws_all[col_idx], ws_all[row_idx])
        img = generator.apply(
            gvars, mixed, rngs={"noise": key},
            method=lambda mdl, ws: mdl.synthesis(ws, noise_mode=noise_mode))
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5,
                        0.0, 255.0).astype(jnp.uint8)

    # Every grid cell through ONE program: mixed (r, c) pairs plus the pure
    # top-row/left-column images as self-pairs (mixing a seed with itself is
    # the identity for any mask). Deduped — a seed appearing in both --rows
    # and --cols would otherwise render its self-pair more than once.
    pairs = list(dict.fromkeys(
        [(r, c) for r in row_seeds for c in col_seeds]
        + [(r, r) for r in row_seeds] + [(c, c) for c in col_seeds]))
    images: dict[tuple[int, int], np.ndarray] = {}
    for s in range(0, len(pairs), batch_size):
        batch = pairs[s : s + batch_size]
        padded = batch + [batch[-1]] * (batch_size - len(batch))
        u8 = np.asarray(render_cells(
            gvars, ws_all,
            jnp.asarray([idx[r] for r, _ in padded], jnp.int32),
            jnp.asarray([idx[c] for _, c in padded], jnp.int32),
            jax.random.fold_in(jax.random.PRNGKey(batch[0][0]), s),
        ))[: len(batch)]
        images.update(zip(batch, u8))

    os.makedirs(outdir, exist_ok=True)
    for (r, c), img in images.items():
        arr = img[..., 0] if img.shape[-1] == 1 else img
        Image.fromarray(arr).save(os.path.join(outdir, f"{r}-{c}.png"))

    res = generator.img_resolution
    mode = "RGB" if generator.img_channels == 3 else "L"
    canvas = Image.new(mode, (res * (len(col_seeds) + 1),
                              res * (len(row_seeds) + 1)), "black")
    for ri, r in enumerate([None] + row_seeds):
        for ci, c in enumerate([None] + col_seeds):
            if r is None and c is None:
                continue
            key = (c, c) if r is None else ((r, r) if c is None else (r, c))
            img = images[key]
            arr = img[..., 0] if img.shape[-1] == 1 else img
            canvas.paste(Image.fromarray(arr), (res * ci, res * ri))
    canvas.save(os.path.join(outdir, "grid.png"))
    click.echo(f"wrote {len(images)} images + grid.png to {outdir} "
               f"(col-styles={sorted(col_styles)}, trunc={truncation_psi})")
