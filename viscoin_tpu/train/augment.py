"""Adaptive discriminator augmentation (ADA) — TPU-first.

The reference consumes GAN pickles produced by the upstream
stylegan2-ada-pytorch trainer (reference: viscoin/cli/train.py:204), whose
namesake capability is this augmentation pipe (upstream
training/augment.py::AugmentPipe, 'bgc' config) plus the adaptive-p
controller (upstream training_loop.py: adjust p every ``ada_interval``
batches toward ``ada_target`` using r_t = E[sign(D(real))]).

TPU-first redesign — everything is ONE jitted device function, no host RNG:

  * EVERY spatial transform — x-flip, 90° rotations, integer translation,
    isotropic/anisotropic scaling, rotation, fractional translation — is
    composed into ONE per-image inverse affine matrix, exactly like the
    upstream pipe composes its G matrix (upstream augment.py builds G_inv
    from all blits + geometric transforms and runs one warp);
  * the warp executes as a TWO-PASS bilinear resample where each pass is a
    batched one-hot-matrix product (``einsum`` over dense per-line
    interpolation matrices built from iota arithmetic). No gather, no
    scatter: per-element gathers run at ~memcpy/50 on TPU and their VJP
    scatters are worse (measured 42 ms PER CORNER at batch 16·256² — the
    gather-based warp cost ~300 ms of a 434 ms GAN step; the matmul form
    runs the same work on the MXU and its adjoint is the transposed
    matmul). Integer maps (blits) sample exactly (hat weights ∈ {0,1});
    the exact multiple-of-90° part of each map is factored out into a final
    rot90 select so the residual two-pass shear stays ≲1 px. The two-pass
    decomposition is the classic Catmull–Smith approximation: for maps with
    a rotation component it differs from one-pass bilinear by a sub-pixel
    anisotropic smear (exact whenever the residual ``a10 == 0``, i.e. all
    axis-aligned transforms). The upstream warp wraps itself in
    orthonormal-wavelet padding for anti-aliasing; this port's plain
    bilinear kernel was already a documented divergence — ADA is a
    regularizer, and the adaptive controller absorbs differences in
    effective augmentation strength;
  * color transforms (brightness, contrast, luma flip, hue rotation,
    saturation) composed into ONE per-image 4x4 homogeneous color matrix
    applied as a single einsum.

Each transform hits each image independently with probability ``p``
(upstream semantics). All draws key off one PRNG key, so augmentation is a
pure function of (images, p, key) — deterministic resume holds.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _per_image(key, b):
    return jax.random.uniform(key, (b,))


def _rotation2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def _hat(u):
    """Bilinear interpolation kernel max(0, 1 - |u|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


@jax.checkpoint
def twopass_warp(images: jax.Array, A: jax.Array, v: jax.Array) -> jax.Array:
    """Affine bilinear warp as two batched one-hot-matrix products.

    Rematerialized (``jax.checkpoint``): the dense per-line interpolation
    matrices S1/S2 are ~2·(H·W²+W·H²) elements PER IMAGE (33.5 MB bf16 at
    256²) and the warp runs on three augmented D passes (fake, real, R1) —
    keeping them alive as VJP residuals put the 256² batch-64 GAN step 7.4 GB
    over HBM (measured OOM: 23.1 of 15.75 GB). They are pure iota arithmetic,
    so the backward recomputes them instead; the adjoint stays a transposed
    matmul. Double-grad (R1 through the pipe) composes through checkpoint.

    Samples ``src = A @ (p - c) + c + v`` per output pixel ``p`` (coords in
    (x, y) order, ``c`` the image center), zero outside the image — the
    semantics of ``map_coordinates(order=1, mode="constant")`` — but with
    both interpolation passes expressed as dense matrix products so the TPU
    runs them (and their VJP) on the MXU instead of per-element
    gather/scatter loops.

    Pass 1 resamples along y at the original columns with
    ``sy'(x, Y) = (a10/a00)(x - cx - vx) + (det/a00)(Y - cy) + cy + vy``
    (the y source along the sheared line x = sx(X, Y)); pass 2 resamples
    along x with the exact ``sx(X, Y)``. Exact whenever ``a10 == 0``
    (axis-aligned maps, incl. every integer blit); for rotation components
    it is the Catmull–Smith two-pass approximation (sub-pixel smear,
    bounded by |a10/a00| ≤ ~1 when callers factor out the 90° part).

    Args:
        images: (B, H, W, C).
        A: (B, 2, 2) inverse maps (rows/cols in (x, y) order).
        v: (B, 2) translations in pixels, (x, y) order.
    """
    B, H, W, C = images.shape
    f32 = jnp.float32
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    a00, a01 = A[:, 0, 0, None, None], A[:, 0, 1, None, None]
    a10, a11 = A[:, 1, 0, None, None], A[:, 1, 1, None, None]
    vx, vy = v[:, 0, None, None], v[:, 1, None, None]
    det = a00 * a11 - a01 * a10
    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)

    # Pass 1: (B, x, Y) source-y positions -> S1 (B, x, Y, y).
    r = a10 / a00
    syp = (r * (xs[None, :, None] - cx - vx)
           + (det / a00) * (ys[None, None, :] - cy) + cy + vy)
    S1 = _hat(ys[None, None, None, :] - syp[..., None]).astype(images.dtype)
    tmp = jnp.einsum("bxYy,byxc->bYxc", S1, images)

    # Pass 2: (B, Y, X) exact source-x positions -> S2 (B, Y, X, x).
    sx = (a00 * (xs[None, None, :] - cx)
          + a01 * (ys[None, :, None] - cy) + cx + vx)
    S2 = _hat(xs[None, None, None, :] - sx[..., None]).astype(images.dtype)
    return jnp.einsum("bYXx,bYxc->bYXc", S2, tmp)


def augment(images: jax.Array, p: jax.Array, key: jax.Array) -> jax.Array:
    """Apply the ADA 'bgc' augmentation pipe to a batch.

    Args:
        images: (B, H, W, C) float images in [-1, 1].
        p: scalar augmentation probability (traced — adapting it never
           recompiles).
        key: PRNG key; the output is a pure function of (images, p, key).
    """
    B, H, W, C = images.shape
    if H != W:
        # The rot90 stages (the blit draw AND the 90°-factoring of the
        # composed map) are only area-preserving on square images; a
        # non-square batch would silently produce inf/NaN pixels whenever a
        # drawn map has a00 ≈ 0 (pure ±90° component). GAN pipes are square.
        raise ValueError(f"augment() requires square images, got {H}x{W}")
    keys = jax.random.split(key, 16)
    x = images

    # ---- spatial transforms: ONE composed inverse affine per image ---------
    # Draws (upstream 'bgc' probabilities/ranges), each independent per image.
    # x-flip (prob p·0.5 where triggered)
    do = jax.random.uniform(keys[0], (B,)) < p
    flip = jnp.logical_and(do, jax.random.uniform(keys[1], (B,)) < 0.5)
    # 90° rotations: k ∈ {0,1,2,3} uniformly where triggered
    do = jax.random.uniform(keys[2], (B,)) < p
    k_blit = jnp.where(do, jax.random.randint(keys[3], (B,), 0, 4), 0)
    # integer translation within ±0.125 of the size (upstream xint_max);
    # zero-fill comes from the warp's padding (a roll would wrap
    # opposite-edge pixels into view — a seam artifact real/generated images
    # never contain, which the discriminator could key on).
    do = jax.random.uniform(keys[4], (B,)) < p
    max_t = 0.125
    tx = jnp.round(jax.random.uniform(keys[5], (B,), minval=-max_t,
                                      maxval=max_t) * W)
    ty = jnp.round(jax.random.uniform(keys[6], (B,), minval=-max_t,
                                      maxval=max_t) * H)
    t_int = jnp.stack([jnp.where(do, tx, 0.0), jnp.where(do, ty, 0.0)], -1)
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

    # Compose the INVERSE source map src = A·(p - c) + c + v in centered
    # (x, y) pixel coordinates, stage by stage (image flows
    # flip → rot90 → xint → geometric, so the inverse maps compose
    # geometric⁻¹ then xint⁻¹ then rot90⁻¹ then flip⁻¹). Pure 2x2/2-vector
    # arithmetic per image — the exact-blit stages stay exact because their
    # matrices are exact signed permutations and bilinear hat weights at
    # integer sources are exactly {0, 1}.
    rot = _rotation2d(theta)  # (B, 2, 2) forward R(θ)
    scale = (jnp.stack([s_aniso, jnp.ones_like(s_aniso)], -1)
             * s_iso[:, None])  # (B, 2) diag [sx, sy]
    fwd = rot * scale[:, None, :]  # R @ diag(scale): scales columns
    A = jnp.linalg.inv(fwd)  # geometric⁻¹
    t_pix = frac * jnp.asarray([W, H], jnp.float32)  # (B, 2) pixels (x, y)
    v = -jnp.einsum("bij,bj->bi", A, t_pix)
    v = v - t_int  # xint⁻¹
    # rot90⁻¹: source map of jnp.rot90(·, k, axes=(1,2)) is q ↦ R90ᵏ·q with
    # R90 = [[0,-1],[1,0]] (centered coords; exact for square images).
    r90 = jnp.asarray([[0.0, -1.0], [1.0, 0.0]])
    r90_pows = jnp.stack([jnp.eye(2), r90, r90 @ r90, r90 @ r90 @ r90])
    rb = r90_pows[k_blit]  # (B, 2, 2) — R90^k = (rot90 by k)⁻¹ source map
    A = jnp.einsum("bij,bjk->bik", rb, A)
    v = jnp.einsum("bij,bj->bi", rb, v)
    # flip⁻¹ (self-inverse): diag(±1, 1)
    fsign = jnp.where(flip, -1.0, 1.0)
    A = A * jnp.stack([fsign, jnp.ones_like(fsign)], -1)[:, :, None]
    v = v * jnp.stack([fsign, jnp.ones_like(fsign)], -1)

    # Factor the exact multiple-of-90° part out of A so the two-pass warp's
    # shear |a10/a0| stays ≲1: between A and A·R90⁻¹ (whose (a00, a10) column
    # is (-a01, -a11)), pick the one with the smaller |a10/a00|, and undo
    # with an exact rot90 blit on the OUTPUT.
    ratio0 = jnp.abs(A[:, 1, 0]) / (jnp.abs(A[:, 0, 0]) + 1e-12)
    ratio1 = jnp.abs(A[:, 1, 1]) / (jnp.abs(A[:, 0, 1]) + 1e-12)
    use_k1 = ratio1 < ratio0
    r90_inv = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    A = jnp.where(use_k1[:, None, None],
                  jnp.einsum("bij,jk->bik", A, r90_inv), A)

    # Skip-select: images whose composed map is the exact identity (no
    # spatial transform triggered) pass through bitwise untouched.
    skip = ((jnp.abs(A - jnp.eye(2)).max(axis=(1, 2)) < 1e-9)
            & (jnp.abs(v).max(axis=1) < 1e-9) & ~use_k1)

    warped = twopass_warp(x, A, v)
    warped = jnp.where(use_k1[:, None, None, None],
                       jnp.rot90(warped, 1, axes=(1, 2)), warped)
    x = jnp.where(skip[:, None, None, None], x, warped)

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
    # Matrices compose in fp32; the per-pixel application runs in the image
    # dtype (bf16 under mixed precision — an fp32 promotion here would upcast
    # the whole batch and feed the discriminator fp32).
    x = jnp.einsum("bhwj,bij->bhwi", xh, mats.astype(x.dtype))[..., :3]
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
