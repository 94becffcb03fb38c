"""Adaptive discriminator augmentation (ADA) — TPU-first.

The reference consumes GAN pickles produced by the upstream
stylegan2-ada-pytorch trainer (reference: viscoin/cli/train.py:204), whose
namesake capability is this augmentation pipe (upstream
training/augment.py::AugmentPipe, 'bgc' config) plus the adaptive-p
controller (upstream training_loop.py: adjust p every ``ada_interval``
batches toward ``ada_target`` using r_t = E[sign(D(real))]).

TPU-first redesign — everything is ONE jitted device function, no host RNG:

  * pixel blits (x-flip, 90° rotations, integer translation) as pure
    ``jnp.where``/``roll`` selects — exact, fusable, differentiable;
  * general geometric transforms (isotropic/anisotropic scaling, rotation,
    fractional translation) composed into ONE per-image inverse affine
    matrix and applied with a single bilinear resampling pass
    (``jax.scipy.ndimage.map_coordinates`` under vmap). The upstream pipe
    wraps its warp in orthonormal-wavelet padding to suppress resampling
    aliasing; this port uses plain bilinear sampling (documented
    divergence — ADA is a regularizer, and the adaptive controller absorbs
    the difference in effective augmentation strength);
  * color transforms (brightness, contrast, luma flip, hue rotation,
    saturation) composed into ONE per-image 4x4 homogeneous color matrix
    applied as a single einsum.

Each transform hits each image independently with probability ``p``
(upstream semantics). All draws key off one PRNG key, so augmentation is a
pure function of (images, p, key) — deterministic resume holds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _per_image(key, b):
    return jax.random.uniform(key, (b,))


def _rotation2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def augment(images: jax.Array, p: jax.Array, key: jax.Array) -> jax.Array:
    """Apply the ADA 'bgc' augmentation pipe to a batch.

    Args:
        images: (B, H, W, C) float images in [-1, 1].
        p: scalar augmentation probability (traced — adapting it never
           recompiles).
        key: PRNG key; the output is a pure function of (images, p, key).
    """
    B, H, W, C = images.shape
    keys = jax.random.split(key, 16)
    x = images

    # ---- pixel blits -------------------------------------------------------
    # x-flip
    do = jax.random.uniform(keys[0], (B,)) < p
    flip = jnp.logical_and(do, jax.random.uniform(keys[1], (B,)) < 0.5)
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    # 90° rotations: k ∈ {0,1,2,3} uniformly where triggered
    do = jax.random.uniform(keys[2], (B,)) < p
    k = jnp.where(do, jax.random.randint(keys[3], (B,), 0, 4), 0)
    rots = jnp.stack([x,
                      jnp.rot90(x, 1, axes=(1, 2)),
                      jnp.rot90(x, 2, axes=(1, 2)),
                      jnp.rot90(x, 3, axes=(1, 2))], axis=0)
    x = jnp.take_along_axis(rots, k[None, :, None, None, None], axis=0)[0]

    # integer translation within ±0.125 of the size (upstream xint_max)
    do = jax.random.uniform(keys[4], (B,)) < p
    max_t = 0.125
    tx = jnp.round(jax.random.uniform(keys[5], (B,), minval=-max_t,
                                      maxval=max_t) * W).astype(jnp.int32)
    ty = jnp.round(jax.random.uniform(keys[6], (B,), minval=-max_t,
                                      maxval=max_t) * H).astype(jnp.int32)
    tx = jnp.where(do, tx, 0)
    ty = jnp.where(do, ty, 0)

    def shift_img(img, sy, sx):
        # zero-fill translation (upstream xint zero-pads via the warp's
        # padding; a plain roll would wrap opposite-edge pixels into view —
        # a seam artifact real/generated images never contain, which the
        # discriminator could key on, leaking the augmentation into D).
        rolled = jnp.roll(img, (sy, sx), axis=(0, 1))
        rows = jnp.arange(H)[:, None, None]
        cols = jnp.arange(W)[None, :, None]
        inb = ((rows - sy >= 0) & (rows - sy < H)
               & (cols - sx >= 0) & (cols - sx < W))
        return rolled * inb

    x = jax.vmap(shift_img)(x, ty, tx)

    # ---- general geometric: ONE composed inverse affine + bilinear warp ----
    # isotropic scale (lognormal, std 0.2·log2)
    do = jax.random.uniform(keys[7], (B,)) < p
    s_iso = jnp.exp2(jax.random.normal(keys[8], (B,)) * 0.2)
    s_iso = jnp.where(do, s_iso, 1.0)
    # rotation (uniform angle)
    do = jax.random.uniform(keys[9], (B,)) < p
    theta = jax.random.uniform(keys[10], (B,), minval=-np.pi, maxval=np.pi)
    theta = jnp.where(do, theta, 0.0)
    # anisotropic scale along x (lognormal, std 0.2·log2)
    do = jax.random.uniform(keys[11], (B,)) < p
    s_aniso = jnp.exp2(jax.random.normal(keys[12], (B,)) * 0.2)
    s_aniso = jnp.where(do, s_aniso, 1.0)
    # fractional translation (normal, std 0.125 of size)
    do = jax.random.uniform(keys[13], (B,)) < p
    frac = jax.random.normal(keys[14], (B, 2)) * 0.125
    frac = jnp.where(do[:, None], frac, 0.0)

    # forward transform G = T(frac) · R(θ) · S_aniso · S_iso about the image
    # center; sample source coords with the INVERSE per output pixel.
    rot = _rotation2d(theta)  # (B, 2, 2)
    scale = (jnp.stack([s_aniso, jnp.ones_like(s_aniso)], -1)
             * s_iso[:, None])  # (B, 2) diag [sx, sy]
    fwd = rot * scale[:, None, :]  # R @ diag(scale): scales columns
    inv = jnp.linalg.inv(fwd)  # (B, 2, 2)
    t_pix = frac * jnp.asarray([W, H], jnp.float32)  # (B, 2) in pixels (x, y)

    identity_geom = (jnp.abs(theta) < 1e-12) & (jnp.abs(s_iso - 1) < 1e-12) \
        & (jnp.abs(s_aniso - 1) < 1e-12) & (jnp.abs(t_pix).sum(-1) < 1e-12)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    def warp(img, inv_m, t, skip):
        # output pixel (x, y) pulls from inv_m @ ((x, y) - t - c) + c.
        # Bilinear sampling as ONE all-channel gather per corner (4 total)
        # with per-corner zero-padding masks — identical semantics to
        # map_coordinates(order=1, mode="constant") but without the
        # per-channel gather loop (3x fewer gathers; gathers dominate the
        # augment cost on TPU).
        dx = xx - cx - t[0]
        dy = yy - cy - t[1]
        sx = inv_m[0, 0] * dx + inv_m[0, 1] * dy + cx
        sy = inv_m[1, 0] * dx + inv_m[1, 1] * dy + cy
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = (sx - x0)[..., None]
        wy = (sy - y0)[..., None]

        def corner(yi, xi):
            inb = ((yi >= 0) & (yi <= H - 1) & (xi >= 0)
                   & (xi <= W - 1))[..., None]
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            return img[yc, xc] * inb  # (H, W, C) advanced-index gather

        p00 = corner(y0, x0)
        p01 = corner(y0, x0 + 1)
        p10 = corner(y0 + 1, x0)
        p11 = corner(y0 + 1, x0 + 1)
        warped = ((1 - wy) * ((1 - wx) * p00 + wx * p01)
                  + wy * ((1 - wx) * p10 + wx * p11)).astype(img.dtype)
        return jnp.where(skip, img, warped)

    x = jax.vmap(warp)(x, inv, t_pix, identity_geom)

    # ---- color: ONE composed 4x4 homogeneous matrix ------------------------
    eye = jnp.eye(4)
    mats = jnp.broadcast_to(eye, (B, 4, 4))
    ck = jax.random.split(keys[15], 10)

    # brightness (add, std 0.2)
    do = jax.random.uniform(ck[0], (B,)) < p
    b_ = jnp.where(do, jax.random.normal(ck[1], (B,)) * 0.2, 0.0)
    m = jnp.broadcast_to(eye, (B, 4, 4)).at[:, :3, 3].set(b_[:, None])
    mats = jnp.einsum("bij,bjk->bik", m, mats)

    # contrast (mul, lognormal std 0.5·log2): diag([c, c, c, 1]) per image
    do = jax.random.uniform(ck[2], (B,)) < p
    c_ = jnp.where(do, jnp.exp2(jax.random.normal(ck[3], (B,)) * 0.5), 1.0)
    m = jax.vmap(lambda cc: jnp.diag(
        jnp.concatenate([jnp.full((3,), cc), jnp.ones((1,))])))(c_)
    mats = jnp.einsum("bij,bjk->bik", m, mats)

    v = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)  # luma axis

    # luma flip (householder reflection, prob p·0.5 triggered like xflip)
    do = jax.random.uniform(ck[4], (B,)) < p
    fl = jnp.logical_and(do, jax.random.uniform(ck[5], (B,)) < 0.5)
    refl = eye - 2.0 * jnp.outer(v, v)
    m = jnp.where(fl[:, None, None], refl[None], eye[None])
    mats = jnp.einsum("bij,bjk->bik", m, mats)

    # hue rotation (uniform angle about the luma axis)
    do = jax.random.uniform(ck[6], (B,)) < p
    ang = jnp.where(do, jax.random.uniform(ck[7], (B,), minval=-np.pi,
                                           maxval=np.pi), 0.0)

    def rot_axis(a):
        # Rodrigues rotation about v's rgb part, homogeneous 4x4
        k = v[:3]
        Km = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = jnp.eye(3) + jnp.sin(a) * Km + (1 - jnp.cos(a)) * (Km @ Km)
        return jnp.block([[R, jnp.zeros((3, 1))], [jnp.zeros((1, 3)), jnp.ones((1, 1))]])

    mats = jnp.einsum("bij,bjk->bik", jax.vmap(rot_axis)(ang), mats)

    # saturation (lognormal std log2, blend toward luma)
    do = jax.random.uniform(ck[8], (B,)) < p
    s_ = jnp.where(do, jnp.exp2(jax.random.normal(ck[9], (B,))), 1.0)
    vv = jnp.outer(v, v)
    m = vv[None] + (eye - vv)[None] * s_[:, None, None]
    mats = jnp.einsum("bij,bjk->bik", m, mats)

    ones = jnp.ones((B, H, W, 1), x.dtype)
    xh = jnp.concatenate([x, ones], axis=-1)  # (B, H, W, 4)
    x = jnp.einsum("bhwj,bij->bhwi", xh, mats)[..., :3]
    return x


def ada_update(ada_p, rt_acc, rt_batch, step, batch_size,
               target: float = 0.6, interval: int = 4, kimg: float = 500.0):
    """Adaptive-p controller (upstream training_loop.py ada heuristic).

    Accumulates the per-batch overfitting signal ``rt_batch`` =
    E[sign(D(real))]; every ``interval`` steps nudges p by
    ±(batch·interval)/(kimg·1000) toward r_t == target, clamped to [0, 1].
    Pure arithmetic — lives inside the jitted train step.

    Returns (new_ada_p, new_rt_acc).
    """
    rt_acc = rt_acc + rt_batch
    apply = (step + 1) % interval == 0
    rt = rt_acc / interval
    adjust = jnp.sign(rt - target) * (batch_size * interval) / (kimg * 1000.0)
    new_p = jnp.clip(ada_p + jnp.where(apply, adjust, 0.0), 0.0, 1.0)
    new_acc = jnp.where(apply, 0.0, rt_acc)
    return new_p, new_acc
