"""CLIP ViT-B/32 in Flax (image + text towers).

Replaces the pip `clip` package used by the reference
(viscoin/models/clip.py: ViT-B/32, 512-d embeddings, image/text encoders with
disk-cached whole-dataset embedding computation). Pretrained OpenAI weights
port via :func:`viscoin_tpu.utils.porting.convert_torch_clip` (state_dict of
the torch CLIP model). Text encoding additionally needs the BPE tokenizer
vocabulary (``bpe_simple_vocab_16e6.txt.gz``) — pass its path to
:class:`SimpleTokenizer`; without it, only image embeddings are available
(no network downloads in this framework).

Architecture (ViT-B/32): image tower = conv patchify 32, width 768, 12
layers × 12 heads, pre-LN transformer, class token, ln_post + projection to
512. Text tower: 77-token context, vocab 49408, width 512, 12 layers × 8
heads, causal mask, ln_final + projection; embedding = activation at the
argmax (EOT) token.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

CLIP_IMAGE_SIZE = 224
CLIP_EMBED_DIM = 512
# CLIP's image preprocessing constants (clip.load transform).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class MultiHeadAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        B, T, C = x.shape
        qkv = nn.Dense(3 * self.width, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, self.heads, C // self.heads).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(C // self.heads)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(self.width, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MultiHeadAttention(self.width, self.heads, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(y)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        x = x + nn.Dense(self.width, name="mlp_proj")(h)
        return x


class CLIPVisionTransformer(nn.Module):
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 32
    output_dim: int = CLIP_EMBED_DIM

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, 224, 224, 3) CLIP-normalized NHWC → (B, output_dim)."""
        B = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), use_bias=False,
                    padding="VALID", name="patch_embed")(x)
        x = x.reshape(B, -1, self.width)  # (B, 49, W)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], self.width))
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualBlock(self.width, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return x @ proj


class CLIPTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = CLIP_EMBED_DIM

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, 77) int32 → (B, output_dim)."""
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        x = emb[tokens]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos
        T = tokens.shape[1]
        mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
        for i in range(self.layers):
            x = ResidualBlock(self.width, self.heads, name=f"block{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT token has the highest id
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return x @ proj


class CLIP(nn.Module):
    """ViT-B/32 CLIP (reference wrapper: viscoin/models/clip.py:27-47)."""

    kind: str = "ViT-B/32"
    embedding_size: int = CLIP_EMBED_DIM

    def setup(self):
        self.visual = CLIPVisionTransformer()
        self.text = CLIPTextTransformer()

    def encode_image(self, x):
        return self.visual(x)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


def clip_preprocess_u8(images_u8: jax.Array) -> jax.Array:
    """Device-side CLIP preprocessing of uint8 NHWC batches: bilinear resize
    to 224², scale to [0,1], CLIP-normalize. Fallback path for datasets
    without original-image access; :func:`clip_preprocess_pil` is the
    exact-geometry path (measured drift bound in PARITY.md #6)."""
    x = images_u8.astype(jnp.float32) / 255.0
    B, H, W, C = x.shape
    if (H, W) != (CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE):
        x = jax.image.resize(x, (B, CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE, C), "bilinear")
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std


def clip_preprocess_pil(raw_u8: "np.ndarray") -> "np.ndarray":
    """EXACT ``clip.load`` preprocessing of one original image (reference:
    viscoin/models/clip.py:38 feeds the dataloaders ``self.preprocess``):
    PIL bicubic short-side resize to 224 → center crop 224 → [0,1] →
    CLIP-normalize. The pip package's transform is torchvision Resize/
    CenterCrop on PIL images, whose PIL backend this reproduces
    pixel-exactly (same Image.resize BICUBIC call, same crop box).

    Args: raw_u8 (H, W, 3) uint8. Returns (224, 224, 3) float32 normalized.
    """
    from PIL import Image

    img = Image.fromarray(raw_u8).convert("RGB")
    w, h = img.size
    short, long = min(w, h), max(w, h)
    # torchvision Resize(224): short side -> 224, long side int-TRUNCATED
    # (torchvision _compute_resized_output_size uses int(), not round())
    new_long = int(CLIP_IMAGE_SIZE * long / short)
    nw, nh = ((CLIP_IMAGE_SIZE, new_long) if w <= h
              else (new_long, CLIP_IMAGE_SIZE))
    img = img.resize((nw, nh), Image.BICUBIC)
    # torchvision CenterCrop(224): origin int(round((n - crop)/2.0))
    left = int(round((nw - CLIP_IMAGE_SIZE) / 2.0))
    top = int(round((nh - CLIP_IMAGE_SIZE) / 2.0))
    img = img.crop((left, top, left + CLIP_IMAGE_SIZE, top + CLIP_IMAGE_SIZE))
    x = np.asarray(img, np.float32) / 255.0
    return ((x - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32))


def _img_cache(mode: str, dataset: str, kind: str) -> str:
    # dataset may be an image-folder PATH — key caches by its basename
    # (dataset_key), or the filename would embed path separators and
    # scatter caches into never-created subdirectories of checkpoints/clip.
    from viscoin_tpu.data.utils import dataset_key

    kind = kind.replace("/", "-")
    return f"checkpoints/clip/{kind}_{dataset_key(dataset)}_img_{mode}.npz"


def _txt_cache(key: str, dataset: str, kind: str) -> str:
    from viscoin_tpu.data.utils import dataset_key

    kind = kind.replace("/", "-")
    return f"checkpoints/clip/{kind}_{dataset_key(dataset)}_txt_{key}.npz"


def compute_image_embeddings(clip: CLIP, dataset_name: str, train_ds, test_ds,
                             params=None, batch_size: int = 32):
    """CLIP image embeddings for both splits, disk-cached
    (reference: clip.py:49-107).

    When the dataset exposes original decoded images (``raw_image``, like
    the reference feeding PIL images to ``clip.load``'s transform), the
    EXACT preprocessing geometry runs on host (:func:`clip_preprocess_pil`);
    otherwise the device bilinear path is used."""
    tr_cache = _img_cache("train", dataset_name, clip.kind)
    te_cache = _img_cache("test", dataset_name, clip.kind)
    if os.path.exists(tr_cache) and os.path.exists(te_cache):
        return np.load(tr_cache)["emb"], np.load(te_cache)["emb"]

    if params is None:
        params = _init_or_warn(clip)

    @jax.jit
    def encode(params, u8):
        return clip.apply({"params": params}, clip_preprocess_u8(u8),
                          method=clip.encode_image)

    @jax.jit
    def encode_pre(params, x):
        return clip.apply({"params": params}, x, method=clip.encode_image)

    def run(ds):
        out = []
        n = len(ds)
        exact = hasattr(ds, "raw_image")
        for s in range(0, n, batch_size):
            idx = range(s, min(s + batch_size, n))
            if exact:
                batch = np.stack([clip_preprocess_pil(ds.raw_image(i))
                                  for i in idx])
            else:
                batch = np.stack([ds[i][0] for i in idx])
            if batch.shape[0] < batch_size:
                pad = batch_size - batch.shape[0]
                batch = np.concatenate([batch, np.repeat(batch[:1], pad, axis=0)])
            enc = encode_pre if exact else encode
            out.append(np.asarray(enc(params, jnp.asarray(batch)))[: len(idx)])
        return np.concatenate(out)

    train_emb, test_emb = run(train_ds), run(test_ds)
    os.makedirs(os.path.dirname(tr_cache), exist_ok=True)
    np.savez(tr_cache, emb=train_emb)
    np.savez(te_cache, emb=test_emb)
    return train_emb, test_emb


def compute_text_embeddings(clip: CLIP, captions: list[str], dataset_name: str,
                            cache_key: str, tokenizer, params=None,
                            batch_size: int = 32):
    """CLIP text embeddings for a caption list, disk-cached
    (reference: clip.py:109-166). ``tokenizer`` must provide
    tokenize(list[str]) -> (N, 77) int array (see SimpleTokenizer)."""
    cache = _txt_cache(cache_key, dataset_name, clip.kind)
    if os.path.exists(cache):
        return np.load(cache)["emb"]
    if params is None:
        params = _init_or_warn(clip)

    tokens = np.asarray(tokenizer.tokenize(captions))

    @jax.jit
    def encode(params, toks):
        return clip.apply({"params": params}, toks, method=clip.encode_text)

    out = []
    for s in range(0, len(tokens), batch_size):
        chunk = tokens[s : s + batch_size]
        n = len(chunk)
        if n < batch_size:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], batch_size - n, axis=0)])
        out.append(np.asarray(encode(params, jnp.asarray(chunk)))[:n])
    emb = np.concatenate(out)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, emb=emb)
    return emb


def _init_or_warn(clip: CLIP):
    ckpt_path = "checkpoints/clip/vit-b-32"
    if os.path.exists(ckpt_path):
        from viscoin_tpu.utils.checkpoints import restore_pytree

        return restore_pytree(ckpt_path)
    print("WARNING: no CLIP weights at checkpoints/clip/vit-b-32 — using random "
          "init (port OpenAI weights with convert_torch_clip).")
    return jax.jit(
        lambda k: clip.init(k, jnp.zeros((1, 224, 224, 3)),
                            jnp.zeros((1, 77), jnp.int32))
    )(jax.random.PRNGKey(0))["params"]


class SimpleTokenizer:
    """CLIP BPE tokenizer. Requires the vocabulary file
    ``bpe_simple_vocab_16e6.txt.gz`` (same file the pip package bundles);
    pass its path. Implements the same byte-level BPE merge procedure."""

    def __init__(self, bpe_path: str, context_length: int = 77):
        import gzip

        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        import re

        # ASCII approximation of CLIP's \p{L}/\p{N} pattern (the stdlib `re`
        # has no unicode property classes; CUB captions are ASCII).
        pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )
        text = " ".join(text.lower().strip().split())
        bpe_tokens: list[int] = []
        for token in re.findall(pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def tokenize(self, texts: list[str]) -> np.ndarray:
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        result = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            tokens = [sot] + self.encode(text) + [eot]
            tokens = tokens[: self.context_length]
            if len(tokens) == self.context_length:
                tokens[-1] = eot
            result[i, : len(tokens)] = tokens
        return result


def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs
