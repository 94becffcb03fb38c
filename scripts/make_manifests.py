"""Generate the state_dict key/shape manifests for the five pretrained torch
networks of the reference ecosystem (SURVEY.md §2.2) into
``viscoin_tpu/manifests/*.json``.

Zero-egress derivation: the architectures are instantiated with RANDOM
weights where a torch twin exists in this environment (transformers ResNet /
CLIP), and synthesized from the known layer schedules otherwise (pip-lpips
VGG, OpenAI clip, torchvision inception_v3, the NVlabs Generator — the last
via this framework's own NVlabs-naming exporter, which is twin-tested).

Manifest format (consumed by viscoin_tpu.utils.porting.validate_state_dict):
  {"required": {key: shape}, "optional": {key: shape},
   "optional_prefixes": [...], "one_of": [[keyA, keyB], ...]}
Dims of -1 are wildcards (class-count heads).

Re-run after architecture changes:  python scripts/make_manifests.py
The checked-in JSONs are themselves tested against fresh torch-twin
generation in tests/test_manifests.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "viscoin_tpu", "manifests")


def classifier_manifest() -> dict:
    """Reference Classifier (viscoin/models/classifiers.py:14-92): HF
    `microsoft/resnet-50` under ``resnet.`` + nn.Linear(2048, n_classes)
    head. ResNetConfig() defaults ARE the resnet-50 architecture."""
    import torch
    from transformers import ResNetConfig, ResNetModel

    with torch.device("meta"):  # shapes only — no weight init cost
        model = ResNetModel(ResNetConfig())
    required, optional = {}, {}
    for k, v in model.state_dict().items():
        (optional if k.endswith("num_batches_tracked") else required)[
            f"resnet.{k}"] = list(v.shape)
    required["linear.weight"] = [-1, 2048]  # n_classes × embedding
    required["linear.bias"] = [-1]
    # HF pooler is part of ResNetModel but unused by the converter
    return {"required": required, "optional": optional,
            "optional_prefixes": ["resnet.pooler."]}


def clip_hf_manifest() -> dict:
    """HF transformers CLIPModel, ViT-B/32 (CLIPConfig() defaults are the
    openai/clip-vit-base-patch32 architecture)."""
    import torch
    from transformers import CLIPConfig, CLIPModel

    with torch.device("meta"):
        model = CLIPModel(CLIPConfig())
    required, optional = {}, {}
    for k, v in model.state_dict().items():
        # logit_scale is unused by the converter; position_ids buffers exist
        # only in some transformers versions
        if k == "logit_scale" or k.endswith("position_ids"):
            optional[k] = list(v.shape)
        else:
            required[k] = list(v.shape)
    optional.setdefault("logit_scale", [])
    optional.setdefault("text_model.embeddings.position_ids", [1, 77])
    optional.setdefault("vision_model.embeddings.position_ids", [1, 50])
    return {"required": required, "optional": optional}


def clip_openai_manifest() -> dict:
    """OpenAI pip-`clip` ViT-B/32 state_dict (the reference's actual load,
    viscoin/models/clip.py:37-38), synthesized from the published
    architecture constants (vision: 768 wide / 12 layers / patch 32 / 224²;
    text: 512 wide / 12 layers / 77 ctx / 49408 vocab)."""
    W, L, P, G = 768, 12, 32, 224 // 32  # vision width/layers/patch/grid
    TW, TL, CTX, VOCAB = 512, 12, 77, 49408
    req = {
        "visual.conv1.weight": [W, 3, P, P],
        "visual.class_embedding": [W],
        "visual.positional_embedding": [G * G + 1, W],
        "visual.ln_pre.weight": [W], "visual.ln_pre.bias": [W],
        "visual.ln_post.weight": [W], "visual.ln_post.bias": [W],
        "visual.proj": [W, TW],
        "token_embedding.weight": [VOCAB, TW],
        "positional_embedding": [CTX, TW],
        "ln_final.weight": [TW], "ln_final.bias": [TW],
        "text_projection": [TW, TW],
    }

    def block(prefix: str, d: int) -> dict:
        return {
            f"{prefix}.ln_1.weight": [d], f"{prefix}.ln_1.bias": [d],
            f"{prefix}.ln_2.weight": [d], f"{prefix}.ln_2.bias": [d],
            f"{prefix}.attn.in_proj_weight": [3 * d, d],
            f"{prefix}.attn.in_proj_bias": [3 * d],
            f"{prefix}.attn.out_proj.weight": [d, d],
            f"{prefix}.attn.out_proj.bias": [d],
            f"{prefix}.mlp.c_fc.weight": [4 * d, d],
            f"{prefix}.mlp.c_fc.bias": [4 * d],
            f"{prefix}.mlp.c_proj.weight": [d, 4 * d],
            f"{prefix}.mlp.c_proj.bias": [d],
        }

    for i in range(L):
        req.update(block(f"visual.transformer.resblocks.{i}", W))
    for i in range(TL):
        req.update(block(f"transformer.resblocks.{i}", TW))
    return {"required": req, "optional": {"logit_scale": [],
                                          "input_resolution": [],
                                          "context_length": [],
                                          "vocab_size": []}}


def lpips_manifest() -> dict:
    """pip-`lpips` LPIPS(net='vgg') state_dict (reference
    viscoin/training/losses.py:104-112): torchvision vgg16.features convs
    grouped into slices + the five 1×1 linear heads."""
    # (torchvision feature idx, in_ch, out_ch) per conv, grouped by slice —
    # matches convert_torch_lpips's slice_layers table
    slices = {
        1: [(0, 3, 64), (2, 64, 64)],
        2: [(5, 64, 128), (7, 128, 128)],
        3: [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
        4: [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
        5: [(24, 512, 512), (26, 512, 512), (28, 512, 512)],
    }
    req, opt, one_of = {}, {}, []
    for s, layers in slices.items():
        for idx, cin, cout in layers:
            req[f"net.slice{s}.{idx}.weight"] = [cout, cin, 3, 3]
            req[f"net.slice{s}.{idx}.bias"] = [cout]
    head_ch = [64, 128, 256, 512, 512]
    for i, c in enumerate(head_ch):
        # pip-lpips exposes both naming generations; the converter takes either
        one_of.append([f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"])
        opt[f"lin{i}.model.1.weight"] = [1, c, 1, 1]
        opt[f"lins.{i}.model.1.weight"] = [1, c, 1, 1]
    opt["scaling_layer.shift"] = [1, 3, 1, 1]
    opt["scaling_layer.scale"] = [1, 3, 1, 1]
    return {"required": req, "optional": opt, "one_of": one_of}


def inception_manifest() -> dict:
    """torchvision `inception_v3` / pytorch-fid FIDInceptionV3 state_dict:
    the 94 conv+bn units (torch module paths map 1:1 onto
    InceptionV3Features — conv shapes derived from the Flax module via
    eval_shape, transposed HWIO→OIHW), fc / AuxLogits heads optional (the
    converter ignores them)."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.models.inception import InceptionV3Features
    from viscoin_tpu.utils.porting import _inception_unit_order

    model = InceptionV3Features()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 299, 299, 3))),
        jax.random.PRNGKey(0))
    req = {}
    for path in _inception_unit_order():
        node = shapes["params"]
        for part in path:
            node = node[part]
        h, w, ci, co = node["conv"]["kernel"].shape
        name = ".".join(path)
        req[f"{name}.conv.weight"] = [co, ci, h, w]
        req[f"{name}.bn.weight"] = [co]
        req[f"{name}.bn.bias"] = [co]
        req[f"{name}.bn.running_mean"] = [co]
        req[f"{name}.bn.running_var"] = [co]
    return {"required": req,
            "optional": {"fc.weight": [-1, 2048], "fc.bias": [-1]},
            "optional_prefixes": ["AuxLogits."]}


def stylegan_generator_manifest() -> dict:
    """NVlabs StyleGAN2 Generator state_dict at the reference pretrained-CUB
    config (README.md:209-223: z=512, w=512, 256², mapping_layers=2,
    channel_base 16384 = 'auto' at 256²), via this framework's twin-tested
    NVlabs-naming exporter over a random init. Buffers the converter treats
    as optional (resample filters, noise consts, w_avg) are marked so."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.models.stylegan import Generator
    from viscoin_tpu.utils import exporting

    gen = Generator(z_dim=512, w_dim=512, img_resolution=256,
                    channel_base=16384, mapping_layers=2)
    gvars = jax.eval_shape(
        lambda k: gen.init({"params": k}, jnp.zeros((1, 512)),
                           noise_mode="const"),
        jax.random.PRNGKey(0))
    gvars = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), gvars)
    sd = exporting.export_generator_torch(gvars)
    req, opt = {}, {}
    for k, v in sd.items():
        is_opt = any(t in k for t in ("resample_filter", "noise_const",
                                      "noise_strength", "w_avg"))
        (opt if is_opt else req)[k] = list(v.shape)
    return {"required": req, "optional": opt}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for kind, fn in [("classifier", classifier_manifest),
                     ("clip_hf", clip_hf_manifest),
                     ("clip_openai", clip_openai_manifest),
                     ("lpips", lpips_manifest),
                     ("inception", inception_manifest),
                     ("stylegan_generator", stylegan_generator_manifest)]:
        man = fn()
        path = os.path.join(OUT_DIR, f"{kind}.json")
        with open(path, "w") as f:
            json.dump(man, f, indent=1, sort_keys=True)
            f.write("\n")
        n_req, n_opt = len(man.get("required", {})), len(man.get("optional", {}))
        print(f"{kind}: {n_req} required + {n_opt} optional keys -> {path}")


if __name__ == "__main__":
    main()
