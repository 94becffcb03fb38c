"""Space-to-batch folding: run lane-starved conv subgraphs at conv-batch ≥128.

Measured rule (BASELINE.md, scripts/micro_custom_vjp.py): on v5e, XLA gives
conv subgraphs with batch < 128 images at 64-channel shapes channel-minor
(half-lane) layouts — the same VGG block runs 0.509 ms/image at batch 64 vs
0.244 ms/image at batch 128 (2.09× per FLOP), independent of how the VJP is
expressed. True batch 128 loses to HBM pressure in the full step (195 vs
225 img/s), and tower concatenation doubles the backward. Folding each
image's H axis into the batch dim gets the ≥128 conv-batch WITHOUT more
images: (B, H, W, C) → (2B, H/2 + 2·halo, W, C) with overlap-save halos.

Unlike the width-paired channel folding (ops/paired_conv.py — a measured
dead end: reshaping the minor/lane dim materialized 18 ms transposes), the
H split moves a MAJOR dimension: under channel-minor tiled layouts the
fold/unfold are row-contiguous DMA copies, not relayouts.

Halo arithmetic is the caller's contract: fold with enough halo that every
SAME conv's edge corruption (1 row per 3×3 conv, at the scale it runs)
stays outside the core rows, keep halos EVEN across 2×2 max-pools so the
pooling grid stays aligned with the unfolded image, and unfold with the
remaining halo at the output scale. Zero padding at the outer edges
reproduces SAME-conv semantics exactly, so core outputs are bit-comparable
to the unfolded computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_h(x: jax.Array, halo: int) -> jax.Array:
    """(B, H, W, C) → (2B, H/2 + 2·halo, W, C): split H into two halves with
    ``halo`` rows of real overlap, zero-padded at the outer edges (SAME-conv
    semantics). H must be even. The VJP is the transposed overlap-ADD —
    pad/slice/concat adjoints compose automatically."""
    B, H, W, C = x.shape
    if H % 2:
        raise ValueError(f"fold_h needs an even H, got {H}")
    h2 = H // 2
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    top = xp[:, : h2 + 2 * halo]
    bot = xp[:, h2:]
    return jnp.concatenate([top, bot], axis=0)


def outer_halo_mask(n_tiles: int, tile_h: int, halo: int, dtype) -> jax.Array:
    """(n_tiles, tile_h, 1, 1) mask zeroing each tile's OUTER halo rows (the
    top tiles' first ``halo`` rows, the bottom tiles' last ``halo``).

    Multi-conv overlap-save needs it: after one SAME conv + bias + relu, the
    outer halo no longer holds zeros but relu(conv(0) + b) — the next conv's
    edge rows would read that instead of the zero padding the unfolded
    computation sees. Re-zeroing after every conv keeps the invariant "outer
    halo == SAME zero padding" at each conv input, which makes core outputs
    exact. (Interior halos hold real neighbor rows and need no masking —
    their growing corruption is covered by the halo crop.)"""
    rows = jnp.arange(tile_h)
    top = rows >= halo
    bot = rows < tile_h - halo
    b = n_tiles // 2
    m = jnp.concatenate([jnp.broadcast_to(top, (b, tile_h)),
                         jnp.broadcast_to(bot, (b, tile_h))])
    return m.astype(dtype)[:, :, None, None]


def unfold_h(y: jax.Array, halo: int) -> jax.Array:
    """Inverse of :func:`fold_h` at the output scale: crop ``halo`` rows from
    each tile edge and re-concatenate the halves along H."""
    B2 = y.shape[0]
    B = B2 // 2
    core = y[:, halo: y.shape[1] - halo]
    return jnp.concatenate([core[:B], core[B:]], axis=1)
