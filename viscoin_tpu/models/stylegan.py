"""StyleGAN2 networks in Flax, TPU-first (NHWC, bf16-capable, MXU-friendly).

Re-design of the reference's `stylegan2_ada/training/networks.py` (SURVEY.md
§2.2) plus the VisCoIN adaptation layer (`viscoin/models/gan.py`):

  * :class:`FullyConnected` — equalized-LR linear layer (reference:
    FullyConnectedLayer). Parameters are stored in the torch layout
    ``weight (out, in)`` with identical runtime gains, so torch checkpoints
    port by direct copy.
  * :class:`SynthesisLayer` / :class:`ToRGBLayer` / :class:`SynthesisBlock` /
    :class:`SynthesisNetwork` — the 4→256 synthesis pyramid. Modulated conv
    uses the dense input/output-scaling decomposition
    (:func:`viscoin_tpu.ops.modulated_conv2d`), resampling uses the
    one-XLA-op upfirdn2d. Activations are NHWC; conv weights HWIO
    (torch ``(Co,Ci,kh,kw)`` → transpose ``(2,3,1,0)`` when porting).
  * :class:`MappingNetwork` — the original generator's mapping MLP (used for
    synthetic-sample generation, reference: viscoin/training/utils.py:26).
  * :class:`MappingNetworkAdapted` — VisCoIN's per-style-layer mapping
    (reference: viscoin/models/gan.py:147-234). TPU-first: the ``num_ws``
    independent single-layer MLPs are stacked into two vmapped groups (the
    z1 group, layers ``coarse..mid``, and the z2 group) so each group is a
    single batched MXU matmul instead of 14 small ones.
  * :class:`Generator` / :class:`GeneratorAdapted` — composition modules
    (reference: gan.py:35-144).

Noise buffers live in the ``noise`` variable collection (the reference's
registered buffers); ``noise_mode`` ∈ {"random", "const", "none"} matches the
reference's synthesis kwargs.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscoin_tpu.ops import bias_act, modulated_conv2d, setup_filter, upsample2d
from viscoin_tpu.ops.bias_act import activation_funcs
from viscoin_tpu.ops.conv2d_resample import conv2d_resample


def num_ws_for_resolution(img_resolution: int) -> int:
    """Number of style vectors for a skip-architecture synthesis pyramid:
    1 conv @4², 2 convs per higher block, +1 for the final toRGB (=14 @256²)."""
    return 2 * int(math.log2(img_resolution)) - 2


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2)) — reference: networks.py::normalize_2nd_moment."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def flatten_concepts(phi: jax.Array) -> jax.Array:
    """Flatten a (B, 3, 3, K) NHWC concept tensor to (B, 9*K) in the
    reference's concept-major order (torch view of (B, K, 3, 3)), so ported
    mapping weights line up (reference: gan.py:216 ``z1.view(-1, z1_dim)``)."""
    if phi.ndim == 2:
        return phi
    B = phi.shape[0]
    return jnp.transpose(phi, (0, 3, 1, 2)).reshape(B, -1)


class FullyConnected(nn.Module):
    """Equalized-LR fully connected layer (reference: FullyConnectedLayer)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
            (self.out_features, self.in_features),
        )
        w = weight.astype(x.dtype) * (self.lr_multiplier / math.sqrt(self.in_features))
        b = None
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.out_features,),
            )
            b = bias * self.lr_multiplier if self.lr_multiplier != 1.0 else bias
        x = x @ w.T
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Plain (non-modulated) equalized-LR conv layer (reference: Conv2dLayer).
    Used by skip/resnet architectures and available for discriminators."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels)
        )
        w = weight * (1.0 / math.sqrt(self.in_channels * k * k))
        f = setup_filter(list(self.resample_filter)) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(
            x,
            w.astype(x.dtype),
            f=f,
            up=self.up,
            down=self.down,
            padding=k // 2,
            flip_weight=(self.up == 1),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        act_gain = activation_funcs[self.activation].def_gain * gain
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=clamp)


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias + lrelu (reference: SynthesisLayer)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, noise_mode: str = "random",
                 gain: float = 1.0) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnected(self.w_dim, self.in_channels, bias_init=1.0, name="affine")(
            w.astype(jnp.float32)
        )
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels)
        )

        noise = None
        if self.use_noise:
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            noise_const = self.variable(
                "noise",
                "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("params"), (self.resolution, self.resolution), jnp.float32
                ),
            )
            if noise_mode == "random":
                key = self.make_rng("noise")
                noise = (
                    jax.random.normal(
                        key, (x.shape[0], self.resolution, self.resolution, 1), jnp.float32
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = noise_const.value[None, :, :, None] * noise_strength

        f = setup_filter(list(self.resample_filter)) if self.up > 1 else None
        x = modulated_conv2d(
            x,
            weight,
            styles,
            noise=noise,
            up=self.up,
            padding=k // 2,
            resample_filter=f,
            flip_weight=(self.up == 1),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv to image channels, no demodulation (reference: ToRGBLayer)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        styles = FullyConnected(self.w_dim, self.in_channels, bias_init=1.0, name="affine")(
            w.astype(jnp.float32)
        )
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels)
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        x = modulated_conv2d(x, weight, styles * weight_gain, demodulate=False, padding=k // 2)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, b, act="linear", clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution block: (conv0 up2), conv1, toRGB skip (reference: SynthesisBlock,
    architecture='skip' — the StyleGAN2 default used by the pretrained GANs)."""

    in_channels: int  # 0 for the 4x4 block (learned const input)
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = None

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x, img, ws_block, noise_mode: str = "random"):
        """ws_block: (B, num_conv + num_torgb, w_dim)."""
        B = ws_block.shape[0]
        w_idx = 0

        if self.in_channels == 0:
            const = self.param(
                "const", nn.initializers.normal(1.0), (4, 4, self.out_channels)
            )
            x = jnp.broadcast_to(const[None], (B, 4, 4, self.out_channels))
        else:
            x = SynthesisLayer(
                self.in_channels,
                self.out_channels,
                self.w_dim,
                self.resolution,
                up=2,
                resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp,
                name="conv0",
            )(x, ws_block[:, w_idx], noise_mode=noise_mode)
            w_idx += 1

        x = SynthesisLayer(
            self.out_channels,
            self.out_channels,
            self.w_dim,
            self.resolution,
            resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp,
            name="conv1",
        )(x, ws_block[:, w_idx], noise_mode=noise_mode)
        w_idx += 1

        if img is not None:
            img = upsample2d(img, setup_filter(list(self.resample_filter)), up=2)
        if self.num_torgb:
            y = ToRGBLayer(
                self.out_channels,
                self.img_channels,
                self.w_dim,
                conv_clamp=self.conv_clamp,
                name="torgb",
            )(x, ws_block[:, w_idx])
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """The full 4→img_resolution synthesis pyramid (reference: SynthesisNetwork).

    Default channel config matches the upstream defaults
    (channel_base=32768, channel_max=512 → 512 ch up to 64², 256 @128², 128 @256²);
    the StyleGAN2-ADA 'auto' config for 256² trains with channel_base=16384."""

    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = None
    resample_filter: Sequence[int] = (1, 3, 3, 1)

    @property
    def block_resolutions(self) -> list[int]:
        return [2**i for i in range(2, int(math.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        return num_ws_for_resolution(self.img_resolution)

    @nn.compact
    def __call__(self, ws: jax.Array, noise_mode: str = "random") -> jax.Array:
        """ws: (B, num_ws, w_dim) → (B, H, W, img_channels)."""
        assert ws.shape[1] == self.num_ws, f"expected {self.num_ws} ws, got {ws.shape[1]}"
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = 0 if res == 4 else self.channels(res // 2)
            num_conv = 1 if res == 4 else 2
            # toRGB reuses the w of the next block's first conv (reference
            # w-indexing: blocks consume num_conv ws; torgb peeks one ahead).
            ws_block = jax.lax.dynamic_slice_in_dim(ws, w_idx, num_conv + 1, axis=1)
            x, img = SynthesisBlock(
                in_channels=in_ch,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp,
                name=f"b{res}",
            )(x, img, ws_block, noise_mode=noise_mode)
            w_idx += num_conv
        return img


class MappingNetwork(nn.Module):
    """Original generator mapping MLP (reference: MappingNetwork). Used to
    draw synthetic training samples (viscoin/training/utils.py:26-39)."""

    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    num_ws: int = 14
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995

    @nn.compact
    def __call__(self, z, c=None, truncation_psi: float = 1.0,
                 truncation_cutoff: int | None = None):
        assert self.c_dim == 0, "conditional GANs are not used by VisCoIN"
        x = normalize_2nd_moment(z.astype(jnp.float32))
        features = [self.z_dim] + [self.w_dim] * self.num_layers
        for i in range(self.num_layers):
            x = FullyConnected(
                features[i],
                features[i + 1],
                activation="lrelu",
                lr_multiplier=self.lr_multiplier,
                name=f"fc{i}",
            )(x)
        w_avg = self.variable("moving_stats", "w_avg", lambda: jnp.zeros((self.w_dim,)))
        ws = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        if truncation_psi != 1.0:
            if truncation_cutoff is None:
                ws = w_avg.value + truncation_psi * (ws - w_avg.value)
            else:
                trunc = w_avg.value + truncation_psi * (ws[:, :truncation_cutoff] - w_avg.value)
                ws = jnp.concatenate([trunc, ws[:, truncation_cutoff:]], axis=1)
        return ws


class MappingNetworkAdapted(nn.Module):
    """VisCoIN's adapted mapping (reference: viscoin/models/gan.py:147-234).

    One independent MLP per style layer; layers ``coarse_layer..mid_layer``
    consume the normalized flattened concept tensor z1=Phi, the rest consume
    z2=Phi'. TPU-first: the per-layer MLPs are stacked into two groups and
    evaluated as single batched einsums. A learnable ``fixed_w_avg`` bias is
    added to every style vector."""

    z1_dim: int = 9 * 256
    z2_dim: int = 9 * 256
    w_dim: int = 512
    num_ws: int = 14
    num_layers: int = 1
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    coarse_layer: int = 2
    mid_layer: int = 10

    def group_indices(self) -> tuple[list[int], list[int]]:
        g1 = [i for i in range(self.num_ws) if self.coarse_layer <= i <= self.mid_layer]
        g2 = [i for i in range(self.num_ws) if i < self.coarse_layer or i > self.mid_layer]
        return g1, g2

    @nn.compact
    def __call__(self, z1, z2, truncation_psi: float = 1.0,
                 truncation_cutoff: int | None = None):
        z1 = flatten_concepts(z1)
        x1 = normalize_2nd_moment(z1.astype(jnp.float32))
        x2 = normalize_2nd_moment(z2.astype(jnp.float32))

        g1, g2 = self.group_indices()
        feats1 = [self.z1_dim] + [self.w_dim] * self.num_layers
        feats2 = [self.z2_dim] + [self.w_dim] * self.num_layers

        def run_group(x, idxs, feats, prefix):
            """Stacked equalized-LR MLP: one einsum per layer over the whole
            group of style indices."""
            n = len(idxs)
            h = jnp.broadcast_to(x[:, None, :], (x.shape[0], n, x.shape[-1]))
            for layer in range(self.num_layers):
                fin, fout = feats[layer], feats[layer + 1]
                w = self.param(
                    f"{prefix}_w{layer}",
                    nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
                    (n, fout, fin),
                )
                b = self.param(f"{prefix}_b{layer}", nn.initializers.zeros, (n, fout))
                scale = self.lr_multiplier / math.sqrt(fin)
                h = jnp.einsum("bki,koi->bko", h, w * scale) + b[None] * self.lr_multiplier
                h = bias_act(h, None, act=self.activation)
            return h  # (B, n, w_dim)

        B = x1.shape[0]
        styles = jnp.zeros((B, self.num_ws, self.w_dim), jnp.float32)
        if g1:
            s1 = run_group(x1, g1, feats1, "g1")
            styles = styles.at[:, jnp.asarray(g1)].set(s1)
        if g2:
            s2 = run_group(x2, g2, feats2, "g2")
            styles = styles.at[:, jnp.asarray(g2)].set(s2)

        fixed_w_avg = self.param("fixed_w_avg", nn.initializers.zeros, (self.w_dim,))
        return styles + fixed_w_avg[None, None, :]


class Generator(nn.Module):
    """Original StyleGAN2 generator: mapping + synthesis (reference:
    networks.py::Generator; used for synthetic samples in the VisCoIN loop)."""

    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    mapping_layers: int = 2  # ADA 'auto' config for 256² (reference README.md:209-223)
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = None

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws,
            num_layers=self.mapping_layers,
        )

    def __call__(self, z, c=None, truncation_psi: float = 1.0,
                 truncation_cutoff: int | None = None, noise_mode: str = "random"):
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(ws, noise_mode=noise_mode)


def generator_config_from_params(params: dict) -> dict:
    """Recover a :class:`Generator`'s constructor config from its params
    pytree (a ``train gan`` export or a ported pickle) — resolution and
    widths from the synthesis blocks, latent dims and depth from the mapping
    — so tools like the offline ``fid`` command rebuild the right module
    without the user re-supplying architecture flags."""
    import numpy as np

    syn = params["synthesis"]
    resolutions = sorted(int(k[1:]) for k in syn)
    img_resolution = max(resolutions)
    widths = {r: int(np.shape(syn[f"b{r}"]["conv1"]["weight"])[-1])
              for r in resolutions}
    channel_max = max(widths.values())
    channel_base = max(w * r for r, w in widths.items())
    for r, w in widths.items():
        if min(channel_base // r, channel_max) != w:
            raise ValueError(
                f"synthesis widths {widths} do not follow the StyleGAN2 "
                "min(channel_base//res, channel_max) schedule — cannot infer "
                "the module config; construct the Generator explicitly")
    mapping = params["mapping"]
    fcs = sorted(k for k in mapping if k.startswith("fc"))
    if not fcs:
        raise ValueError("params['mapping'] has no fc{i} layers — an adapted "
                         "(VisCoIN) mapping? config inference covers the "
                         "original Generator only")
    return {
        "z_dim": int(np.shape(mapping[fcs[0]]["weight"])[1]),
        "w_dim": int(np.shape(mapping[fcs[-1]]["weight"])[0]),
        "img_resolution": img_resolution,
        "mapping_layers": len(fcs),
        "channel_base": channel_base,
        "channel_max": channel_max,
        # HWIO: the top block's torgb out-dim is the image channel count
        # (a grayscale port must not silently rebuild as RGB).
        "img_channels": int(
            np.shape(syn[f"b{img_resolution}"]["torgb"]["weight"])[-1]),
    }


class GeneratorAdapted(nn.Module):
    """StyleGAN adapted for VisCoIN (reference: viscoin/models/gan.py:35-144).

    ``__call__(z1, z2)`` maps the concept spaces through
    :class:`MappingNetworkAdapted` and synthesizes the reconstruction.
    ``from_gan`` (see :func:`adapted_params_from_gan`) transplants a
    pretrained synthesis: in JAX that is a params-pytree operation, not a
    module mutation."""

    z_dim: int = 256
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    small_adjust: bool = False
    low_res256: bool = False
    mapping_num_layers: int = 1
    coarse_layer: int = 2
    mid_layer: int = 10
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = None

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
        )
        z2_dim = 8 * self.z_dim if self.small_adjust else 9 * self.z_dim
        self.mapping = MappingNetworkAdapted(
            z1_dim=9 * self.z_dim,
            z2_dim=z2_dim,
            w_dim=self.w_dim,
            num_ws=num_ws_for_resolution(self.img_resolution),
            num_layers=self.mapping_num_layers,
            coarse_layer=self.coarse_layer,
            mid_layer=self.mid_layer,
        )

    @property
    def num_ws(self) -> int:
        return num_ws_for_resolution(self.img_resolution)

    def _post(self, img):
        if self.low_res256:
            # center-crop to (384, 512) then resize to 256² (reference:
            # gan.py:66-68,102-103 — only used by a specific baseline model).
            # jax.image.resize defaults to antialias=True, which matches the
            # reference's torchvision Resize (antialias default since 0.17)
            # to 2.4e-7 max-abs on this geometry (test_stylegan.py twin).
            H, W = img.shape[1], img.shape[2]
            top, left = (H - 384) // 2, (W - 512) // 2
            img = img[:, top : top + 384, left : left + 512, :]
            img = jax.image.resize(img, (img.shape[0], 256, 256, img.shape[3]), "bilinear")
        return img

    def __call__(self, z1, z2, return_latents: bool = False,
                 truncation_psi: float = 1.0, truncation_cutoff: int | None = None,
                 noise_mode: str = "random"):
        ws = self.mapping(z1, z2, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        img = self._post(self.synthesis(ws, noise_mode=noise_mode))
        if return_latents:
            return img, ws
        return img

    def gen_from_w(self, w, noise_mode: str = "random"):
        """Generate directly from W+ latents (reference: gan.py:109-118)."""
        return self._post(self.synthesis(w, noise_mode=noise_mode))


class MinibatchStdLayer(nn.Module):
    """Append cross-group feature stddev as an extra channel (reference:
    networks.py::MinibatchStdLayer)."""

    group_size: int = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        G = min(self.group_size, B)
        G = B // (B // G) if B % G == 0 else 1
        F = self.num_channels
        c = C // F
        y = x.reshape(G, B // G, H, W, F, c).astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))  # (B//G, F)
        # TILE, not interleave: the (G, B//G) reshape above makes group m
        # contain the samples {m, m + B//G, ...}, so sample s's own stat is
        # y[s % (B//G)] — exactly what tiling lays out (NVlabs y.repeat(G,..)).
        y = jnp.tile(y, (G, 1)).astype(x.dtype)  # (B, F)
        y = jnp.broadcast_to(y[:, None, None, :], (B, H, W, F))
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorBlock(nn.Module):
    """fromRGB + 2 convs with residual downsample (reference:
    networks.py::DiscriminatorBlock, architecture='resnet' — the ADA default)."""

    in_channels: int  # 0 for the first block (consumes the image via fromrgb)
    tmp_channels: int
    out_channels: int
    img_channels: int = 3
    architecture: str = "resnet"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x, img):
        if self.in_channels == 0:
            x_in = Conv2dLayer(self.img_channels, self.tmp_channels, 1,
                               activation="lrelu", conv_clamp=self.conv_clamp,
                               name="fromrgb")(img)
            x = x_in if x is None else x + x_in
        y = None
        if self.architecture == "resnet":
            y = Conv2dLayer(self.tmp_channels, self.out_channels, 1, use_bias=False,
                            down=2, resample_filter=self.resample_filter,
                            name="skip")(x, gain=math.sqrt(0.5))
        x = Conv2dLayer(self.tmp_channels, self.tmp_channels, 3, activation="lrelu",
                        conv_clamp=self.conv_clamp, name="conv0")(x)
        x = Conv2dLayer(self.tmp_channels, self.out_channels, 3, activation="lrelu",
                        down=2, resample_filter=self.resample_filter,
                        conv_clamp=self.conv_clamp, name="conv1")(
            x, gain=math.sqrt(0.5) if y is not None else 1.0)
        if y is not None:
            x = y + x
        return x, None


class Discriminator(nn.Module):
    """StyleGAN2 discriminator (reference: networks.py::Discriminator).
    Unused by the VisCoIN training loop (the GAN arrives pretrained,
    SURVEY.md §2.2) — provided for capability completeness so GANs can be
    trained/fine-tuned in-framework."""

    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mbstd_group_size: int = 4
    conv_clamp: float | None = None

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        resolutions = [2**i for i in range(int(math.log2(self.img_resolution)), 2, -1)]
        x = None
        for i, res in enumerate(resolutions):
            x, _ = DiscriminatorBlock(
                in_channels=0 if i == 0 else self.channels(res),
                tmp_channels=self.channels(res),
                out_channels=self.channels(res // 2),
                img_channels=self.img_channels,
                conv_clamp=self.conv_clamp,
                name=f"b{res}",
            )(x, img if i == 0 else None)
        # Epilogue at 4x4 (reference: DiscriminatorEpilogue).
        x = MinibatchStdLayer(self.mbstd_group_size, name="mbstd")(x)
        ch4 = self.channels(4)
        x = Conv2dLayer(ch4 + 1, ch4, 3, activation="lrelu",
                        conv_clamp=self.conv_clamp, name="conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = FullyConnected(ch4 * 16, ch4, activation="lrelu", name="fc")(x)
        return FullyConnected(ch4, 1, name="out")(x)


def adapted_params_from_gan(adapted_variables, gan_variables):
    """Transplant a pretrained generator's synthesis params (and noise
    buffers) into a freshly initialized GeneratorAdapted variables pytree
    (reference: GeneratorAdapted.from_gan, gan.py:120-144)."""
    out = jax.tree_util.tree_map(lambda x: x, adapted_variables)  # shallow copy
    out = nn.FrozenDict(out).unfreeze() if isinstance(out, nn.FrozenDict) else dict(out)
    out["params"] = dict(out["params"])
    out["params"]["synthesis"] = gan_variables["params"]["synthesis"]
    if "noise" in gan_variables:
        out["noise"] = dict(out.get("noise", {}))
        out["noise"]["synthesis"] = gan_variables["noise"]["synthesis"]
    return out
