"""``dataset-tool`` command — the stylegan2-ada ``dataset_tool.py`` analogue.

The reference ecosystem packs every GAN training set with that tool before
training (the reference's pretrained CUB GAN was trained from such a zip,
reference README.md:209-241, and its FunnyBirds exporter produces one,
reference viscoin/datasets/funnybirds.py:116-144). This command packs an
image folder, an existing archive, or a registry dataset into the same zip
convention; the result trains here directly (``train gan --dataset out.zip``,
``fid --dataset out.zip``) and in the upstream trainer unchanged.
"""

from __future__ import annotations

import click


@click.command("dataset-tool")
@click.option("--source", required=True,
              help="Image directory (labels from top-level class folders), "
                   "an existing training zip (re-packed), or a registry "
                   "dataset name (cub / funnybirds / synthetic).")
@click.option("--dest", required=True, help="Output .zip path.")
@click.option("--resolution", type=int, default=None,
              help="Output resolution (square). Default: keep stored sizes "
                   "(requires a uniform square source).")
@click.option("--transform", type=click.Choice(["center-crop", "none"]),
              default="center-crop", show_default=True,
              help="Geometry applied when --resolution is set: full-short-"
                   "side center crop + resize, or refuse non-matching "
                   "images.")
@click.option("--max-images", type=int, default=None,
              help="Pack only the first N images.")
def dataset_tool(source: str, dest: str, resolution: int | None,
                 transform: str, max_images: int | None):
    """Pack images into a StyleGAN training zip (stylegan2-ada layout)."""
    from viscoin_tpu.data.stylegan_zip import pack_stylegan_zip

    try:
        count, res = pack_stylegan_zip(source, dest, resolution=resolution,
                                       transform=transform,
                                       max_images=max_images)
    except (ValueError, FileNotFoundError) as e:
        raise click.UsageError(str(e)) from e
    if res & (res - 1):
        click.echo(f"WARNING: resolution {res} is not a power of two — "
                   "StyleGAN training requires one (pass --resolution).")
    click.echo(f"packed {count} images at {res}x{res} into {dest}")
