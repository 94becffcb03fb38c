"""Torch-checkpoint → Flax-params converters (weight porting).

The reference ships/loads five pretrained torch networks (SURVEY.md §2.2):
HF ResNet-50, the StyleGAN2 pickle, LPIPS VGG, CLIP ViT-B/32 and the FID
Inception. These converters map torch ``state_dict`` tensors (as numpy
arrays) onto the parameter pytrees of the corresponding Flax modules, so a
user of the reference can carry their checkpoints over.

Conventions:
  * torch conv weights (Co, Ci, kh, kw) → HWIO ``transpose(2, 3, 1, 0)``.
  * torch linear weights (out, in) stay (out, in) for the equalized-LR
    StyleGAN layers (stored torch-style) and transpose to (in, out) for
    flax ``nn.Dense`` kernels.
  * BatchNorm: weight→scale, bias→bias, running_mean/var→batch_stats.

All functions accept ``dict[str, np.ndarray]`` (call ``.numpy()`` on torch
tensors first, or use :func:`state_dict_to_numpy`).
"""

from __future__ import annotations

import json
import os

import numpy as np

# ------------------------------ manifests ---------------------------------- #
# Exact state_dict key/shape manifests for the torch networks the reference
# ecosystem ships (generated offline by scripts/make_manifests.py from
# random-weight torch twins — zero egress). Converters have only ever seen
# synthetically constructed state_dicts in this environment; validating real
# checkpoints against these manifests turns a silent KeyError / mis-shaped
# port into a clear report of missing / unexpected / mis-shaped keys.

_MANIFEST_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "manifests")

MANIFEST_KINDS = ("classifier", "lpips", "clip_openai", "clip_hf",
                  "inception", "stylegan_generator")


def load_manifest(kind: str) -> dict:
    """Load a checked-in manifest: {"required": {key: shape}, "optional":
    {key: shape}, "optional_prefixes": [...], "one_of": [[k, ...], ...]}.
    Shape dims of -1 are wildcards (e.g. the class-count head dim)."""
    if kind not in MANIFEST_KINDS:
        raise ValueError(f"no manifest for kind {kind!r}; have {MANIFEST_KINDS}")
    with open(os.path.join(_MANIFEST_DIR, f"{kind}.json")) as f:
        return json.load(f)


def _shape_ok(got: tuple, want: list) -> bool:
    return len(got) == len(want) and all(
        w == -1 or g == w for g, w in zip(got, want))


def validate_state_dict(sd: dict, kind: str, strict: bool = True) -> list[str]:
    """Validate a torch state_dict (tensor- or numpy-valued) against the
    ``kind`` manifest. Returns a list of problem strings (empty = clean);
    with ``strict`` a non-empty list raises ``ValueError`` with the full
    report. Checks: missing required keys, unexpected keys, shape mismatches
    on every present key (wildcard dims of -1 allowed, e.g. class counts)."""
    man = load_manifest(kind)
    required, optional = man.get("required", {}), man.get("optional", {})
    prefixes = tuple(man.get("optional_prefixes", []))
    one_of = man.get("one_of", [])
    shapes = {k: tuple(np.asarray(v).shape if not hasattr(v, "shape") else v.shape)
              for k, v in sd.items()}

    problems = []
    for k, want in required.items():
        if k not in shapes:
            problems.append(f"missing required key: {k} (shape {want})")
    for group in one_of:
        if not any(k in shapes for k in group):
            problems.append(f"missing key: one of {group} is required")
    known = set(required) | set(optional) | {k for g in one_of for k in g}
    for k in shapes:
        if (k not in known and not k.startswith(prefixes)
                and not k.endswith("num_batches_tracked")):
            problems.append(f"unexpected key: {k} (shape {list(shapes[k])})")
    for k, got in shapes.items():
        want = required.get(k, optional.get(k))
        if want is None:
            for g in one_of:
                if k in g:
                    want = required.get(g[0]) or optional.get(g[0])
        if want is not None and not _shape_ok(got, want):
            problems.append(f"shape mismatch: {k} has {list(got)}, manifest "
                            f"expects {want}")
    if problems and strict:
        shown = "\n  ".join(problems[:40])
        more = f"\n  ... and {len(problems) - 40} more" if len(problems) > 40 else ""
        raise ValueError(
            f"state_dict does not match the {kind!r} manifest "
            f"({len(problems)} problems):\n  {shown}{more}\n"
            f"(manifest: {os.path.join(_MANIFEST_DIR, kind + '.json')}; "
            "pass strict=False / drop --strict to port anyway)")
    return problems


def state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    """Detach a torch state_dict into plain numpy arrays."""
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _convbn(sd: dict, conv_key: str, bn_key: str) -> tuple[dict, dict]:
    bn_p, bn_s = _bn(sd, bn_key)
    return (
        {"conv": {"kernel": _conv(sd[f"{conv_key}.weight"])}, "bn": bn_p},
        {"bn": bn_s},
    )


def convert_torch_classifier(
    sd: dict[str, np.ndarray],
    depths=None,
    strict: bool = False,
) -> dict:
    """Convert the reference Classifier state_dict (HF ResNetModel under
    ``resnet.`` + head under ``linear.``, viscoin/models/classifiers.py) into
    variables for :class:`viscoin_tpu.models.resnet.Classifier`.
    ``depths`` is inferred from the keys when not given. ``strict`` validates
    against the resnet-50 manifest first (clear missing/unexpected/mis-shaped
    report instead of a KeyError mid-conversion)."""
    if strict:
        validate_state_dict(sd, "classifier")
    if depths is None:
        import re

        counts: dict[int, int] = {}
        for k in sd:
            m = re.match(r"resnet\.encoder\.stages\.(\d+)\.layers\.(\d+)\.", k)
            if m:
                s, l = int(m.group(1)), int(m.group(2))
                counts[s] = max(counts.get(s, 0), l + 1)
        depths = tuple(counts[i] for i in sorted(counts))
    params: dict = {"resnet": {}, "linear": {}}
    stats: dict = {"resnet": {}}

    p, s = _convbn(
        sd,
        "resnet.embedder.embedder.convolution",
        "resnet.embedder.embedder.normalization",
    )
    params["resnet"]["embedder"] = p
    stats["resnet"]["embedder"] = s

    for i, depth in enumerate(depths):
        for j in range(depth):
            base = f"resnet.encoder.stages.{i}.layers.{j}"
            blk_p, blk_s = {}, {}
            for conv_idx, name in enumerate(["conv1", "conv2", "conv3"]):
                p, s = _convbn(
                    sd,
                    f"{base}.layer.{conv_idx}.convolution",
                    f"{base}.layer.{conv_idx}.normalization",
                )
                blk_p[name], blk_s[name] = p, s
            if f"{base}.shortcut.convolution.weight" in sd:
                p, s = _convbn(sd, f"{base}.shortcut.convolution", f"{base}.shortcut.normalization")
                blk_p["shortcut"], blk_s["shortcut"] = p, s
            params["resnet"][f"stage{i}_block{j}"] = blk_p
            stats["resnet"][f"stage{i}_block{j}"] = blk_s

    params["linear"] = {
        "kernel": np.transpose(sd["linear.weight"], (1, 0)),
        "bias": sd["linear.bias"],
    }
    return {"params": params, "batch_stats": stats}


# ------------------------- Psi / Theta / Concept2CLIP ----------------------- #


def _dense(sd: dict, prefix: str) -> dict:
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv_with_bias(sd: dict, prefix: str) -> dict:
    return {"kernel": _conv(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def convert_torch_concept_extractor(sd: dict[str, np.ndarray]) -> dict:
    """Reference ConceptExtractor (viscoin/models/concept_extractors.py)
    state_dict → params for :class:`ConceptExtractor`."""
    return {
        "conv1": _conv_with_bias(sd, "conv1"),
        "conv2": _conv_with_bias(sd, "conv2"),
        "conv3": _conv_with_bias(sd, "conv3"),
        "conv4": _conv_with_bias(sd, "conv4"),
        "conv5": _conv_with_bias(sd, "conv5"),
        "linear1": _dense(sd, "linear1"),
        "linear2": _dense(sd, "linear2"),
    }


def convert_torch_explainer(sd: dict[str, np.ndarray]) -> dict:
    """Reference Explainer (viscoin/models/explainers.py) state_dict →
    params for :class:`Explainer` (handles the weight_norm parametrization)."""
    if "linear.parametrizations.weight.original0" in sd:
        return {
            "weight_g": sd["linear.parametrizations.weight.original0"].reshape(-1, 1),
            "weight_v": sd["linear.parametrizations.weight.original1"],
            "bias": sd["linear.bias"],
        }
    if "linear.weight_g" in sd:  # legacy torch weight_norm
        return {
            "weight_g": sd["linear.weight_g"].reshape(-1, 1),
            "weight_v": sd["linear.weight_v"],
            "bias": sd["linear.bias"],
        }
    return {"linear": _dense(sd, "linear")}


def convert_torch_concept2clip(sd: dict[str, np.ndarray]) -> dict:
    """Reference Concept2CLIP / Concept2CLIPStyleGAN (3 Linear layers in an
    nn.Sequential at indices 0, 2, 4) state_dict → params."""
    return {
        "fc0": _dense(sd, "model.0"),
        "fc1": _dense(sd, "model.2"),
        "fc2": _dense(sd, "model.4"),
    }


# --------------------------------- LPIPS ----------------------------------- #


def convert_torch_lpips(sd: dict[str, np.ndarray], strict: bool = False) -> dict:
    """Convert a pip-`lpips` LPIPS(net='vgg') state_dict into params for
    :class:`viscoin_tpu.models.lpips.LPIPS`.

    Torch keys: ``net.slice{s}.{layer_idx}.weight/bias`` (torchvision VGG16
    feature indices) and ``lin{i}.model.1.weight`` (1x1 conv heads, shape
    (1, C, 1, 1))."""
    if strict:
        validate_state_dict(sd, "lpips")
    # torchvision vgg16.features conv indices grouped by LPIPS slice
    slice_layers = {
        1: [0, 2],
        2: [5, 7],
        3: [10, 12, 14],
        4: [17, 19, 21],
        5: [24, 26, 28],
    }
    vgg: dict = {}
    conv_idx = 0
    for s in range(1, 6):
        for li in slice_layers[s]:
            key = f"net.slice{s}.{li}.weight"
            vgg[f"conv{conv_idx}"] = {
                "kernel": _conv(sd[key]),
                "bias": sd[f"net.slice{s}.{li}.bias"],
            }
            conv_idx += 1
    params: dict = {"vgg": vgg}
    for i in range(5):
        w = sd.get(f"lin{i}.model.1.weight")
        if w is None:
            w = sd[f"lins.{i}.model.1.weight"]
        params[f"lin{i}"] = np.asarray(w).reshape(-1)
    return params


# -------------------------------- Inception --------------------------------- #


def convert_torch_inception(sd: dict[str, np.ndarray],
                            strict: bool = False) -> dict:
    """Convert a torchvision ``inception_v3`` (or pytorch-fid FIDInceptionV3)
    state_dict into variables for
    :class:`viscoin_tpu.models.inception.InceptionV3Features`.

    Torch module paths (e.g. ``Mixed_5b.branch1x1.conv.weight``) map 1:1 onto
    our module names; BN stats go to batch_stats. The fc / AuxLogits heads are
    ignored (features only)."""
    if strict:
        validate_state_dict(sd, "inception")
    params: dict = {}
    stats: dict = {}
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0] for k in sd
                       if k.endswith(".conv.weight")})
    for prefix in prefixes:
        parts = prefix.split(".")
        if parts[0] in ("fc", "AuxLogits") or "AuxLogits" in parts:
            continue
        p_node, s_node = params, stats
        for part in parts[:-1]:
            p_node = p_node.setdefault(part, {})
            s_node = s_node.setdefault(part, {})
        leaf = parts[-1]
        bn_p, bn_s = _bn(sd, f"{prefix}.bn")
        p_node[leaf] = {"conv": {"kernel": _conv(sd[f"{prefix}.conv.weight"])},
                        "bn": bn_p}
        s_node[leaf] = {"bn": bn_s}
    return {"params": params, "batch_stats": stats}


def _inception_unit_order() -> list[tuple[str, ...]]:
    """The 94 conv+bn units of InceptionV3Features in EXECUTION order (the
    order the TF-slim graph — and hence the NVlabs TorchScript trace —
    instantiates them)."""
    order: list[tuple[str, ...]] = [("Conv2d_1a_3x3",), ("Conv2d_2a_3x3",),
                                    ("Conv2d_2b_3x3",), ("Conv2d_3b_1x1",),
                                    ("Conv2d_4a_3x3",)]
    A = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
         "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    B = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
    C = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
         "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
         "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    D = ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
         "branch7x7x3_3", "branch7x7x3_4"]
    E = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
         "branch3x3dbl_3b", "branch_pool"]
    blocks = [("Mixed_5b", A), ("Mixed_5c", A), ("Mixed_5d", A),
              ("Mixed_6a", B), ("Mixed_6b", C), ("Mixed_6c", C),
              ("Mixed_6d", C), ("Mixed_6e", C), ("Mixed_7a", D),
              ("Mixed_7b", E), ("Mixed_7c", E)]
    for name, branches in blocks:
        order.extend((name, b) for b in branches)
    return order


def convert_torchscript_inception(ts_module) -> dict:
    """Convert the NVlabs TorchScript FID detector (`inception-2015-12-05.pt`,
    reference: viscoin/testing/viscoin.py:85-88) into variables for
    :class:`viscoin_tpu.models.inception.InceptionV3Features`.

    The TorchScript trace's parameter/buffer iteration follows the TF graph's
    topological order, which is the execution order of our units
    (:func:`_inception_unit_order`): the i-th 4-d conv kernel and the i-th BN
    running-stat pair map onto the i-th unit. Every kernel shape is validated
    against the architecture, and ``scripts/port_weights.py inception-nvlabs``
    additionally self-verifies the conversion numerically against the
    TorchScript module before saving — a silent mis-mapping cannot survive.
    TF-slim BN has no scale parameter; missing gammas become ones."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.models.inception import InceptionV3Features

    convs: list[np.ndarray] = []
    bn_units: dict[str, dict[str, np.ndarray]] = {}
    bn_order: list[str] = []
    for name, p in ts_module.named_parameters():
        arr = p.detach().cpu().numpy()
        if arr.ndim == 4:
            convs.append(arr)
        elif arr.ndim == 1:
            prefix, leaf = name.rsplit(".", 1)
            bn_units.setdefault(prefix, {})[leaf] = arr
    for name, b in ts_module.named_buffers():
        arr = b.detach().cpu().numpy()
        prefix, leaf = name.rsplit(".", 1)
        if leaf in ("running_mean", "running_var"):
            if leaf == "running_mean":
                bn_order.append(prefix)
            bn_units.setdefault(prefix, {})[leaf] = arr

    units = _inception_unit_order()
    if len(convs) != len(units) or len(bn_order) != len(units):
        raise ValueError(
            f"expected {len(units)} conv+bn units, found {len(convs)} convs "
            f"and {len(bn_order)} batch-norms — not an InceptionV3 FID "
            "detector export")

    # Expected kernel shapes from the architecture (no compute: eval_shape).
    model = InceptionV3Features()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 299, 299, 3))),
        jax.random.PRNGKey(0))

    params: dict = {}
    stats: dict = {}
    for i, path in enumerate(units):
        kernel = _conv(convs[i])  # OIHW -> HWIO
        exp = shapes["params"]
        for part in path:
            exp = exp[part]
        want = tuple(exp["conv"]["kernel"].shape)
        if tuple(kernel.shape) != want:
            raise ValueError(
                f"unit {'/'.join(path)}: kernel shape {kernel.shape} != "
                f"expected {want} — the export's parameter order does not "
                "match the TF graph topology")
        bn = bn_units[bn_order[i]]
        n = kernel.shape[-1]
        bn_p = {"scale": bn.get("weight", np.ones(n, np.float32)),
                "bias": bn.get("bias", np.zeros(n, np.float32))}
        bn_s = {"mean": bn["running_mean"], "var": bn["running_var"]}
        p_node, s_node = params, stats
        for part in path[:-1]:
            p_node = p_node.setdefault(part, {})
            s_node = s_node.setdefault(part, {})
        p_node[path[-1]] = {"conv": {"kernel": kernel}, "bn": bn_p}
        s_node[path[-1]] = {"bn": bn_s}
    return {"params": params, "batch_stats": stats}


# ---------------------------------- CLIP ----------------------------------- #


def _clip_block_openai(sd: dict, p: str) -> dict:
    return {
        "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
        "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
        "attn": {
            "in_proj": {"kernel": np.transpose(sd[f"{p}.attn.in_proj_weight"]),
                        "bias": sd[f"{p}.attn.in_proj_bias"]},
            "out_proj": _dense(sd, f"{p}.attn.out_proj"),
        },
        "mlp_fc": _dense(sd, f"{p}.mlp.c_fc"),
        "mlp_proj": _dense(sd, f"{p}.mlp.c_proj"),
    }


def convert_torch_clip(sd: dict[str, np.ndarray], vision_layers: int = 12,
                       text_layers: int = 12, strict: bool = False) -> dict:
    """Convert an OpenAI pip-`clip` ViT-B/32 state_dict into params for
    :class:`viscoin_tpu.models.clip.CLIP`."""
    if strict:
        validate_state_dict(sd, "clip_openai")
    visual: dict = {
        "patch_embed": {"kernel": _conv(sd["visual.conv1.weight"])},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
    }
    for i in range(vision_layers):
        visual[f"block{i}"] = _clip_block_openai(sd, f"visual.transformer.resblocks.{i}")

    text: dict = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    for i in range(text_layers):
        text[f"block{i}"] = _clip_block_openai(sd, f"transformer.resblocks.{i}")

    return {"visual": visual, "text": text}


def convert_hf_clip(sd: dict[str, np.ndarray], vision_layers: int = 12,
                    text_layers: int = 12, strict: bool = False) -> dict:
    """Convert a HuggingFace `transformers.CLIPModel` state_dict (ViT-B/32
    config) into params for :class:`viscoin_tpu.models.clip.CLIP`.

    HF splits q/k/v projections; our module uses the fused in_proj, so they
    are concatenated. HF's visual_projection/text_projection Linear weights
    (out, in) become our (in, out) matrices."""
    if strict:
        validate_state_dict(sd, "clip_hf")

    def block(p: str) -> dict:
        qw = sd[f"{p}.self_attn.q_proj.weight"]
        kw = sd[f"{p}.self_attn.k_proj.weight"]
        vw = sd[f"{p}.self_attn.v_proj.weight"]
        qb = sd[f"{p}.self_attn.q_proj.bias"]
        kb = sd[f"{p}.self_attn.k_proj.bias"]
        vb = sd[f"{p}.self_attn.v_proj.bias"]
        return {
            "ln_1": {"scale": sd[f"{p}.layer_norm1.weight"], "bias": sd[f"{p}.layer_norm1.bias"]},
            "ln_2": {"scale": sd[f"{p}.layer_norm2.weight"], "bias": sd[f"{p}.layer_norm2.bias"]},
            "attn": {
                "in_proj": {"kernel": np.transpose(np.concatenate([qw, kw, vw], axis=0)),
                            "bias": np.concatenate([qb, kb, vb])},
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp_fc": _dense(sd, f"{p}.mlp.fc1"),
            "mlp_proj": _dense(sd, f"{p}.mlp.fc2"),
        }

    v = "vision_model"
    visual: dict = {
        "patch_embed": {"kernel": _conv(sd[f"{v}.embeddings.patch_embedding.weight"])},
        "class_embedding": sd[f"{v}.embeddings.class_embedding"],
        "positional_embedding": sd[f"{v}.embeddings.position_embedding.weight"],
        "ln_pre": {"scale": sd[f"{v}.pre_layrnorm.weight"], "bias": sd[f"{v}.pre_layrnorm.bias"]},
        "ln_post": {"scale": sd[f"{v}.post_layernorm.weight"], "bias": sd[f"{v}.post_layernorm.bias"]},
        "proj": np.transpose(sd["visual_projection.weight"]),
    }
    for i in range(vision_layers):
        visual[f"block{i}"] = block(f"{v}.encoder.layers.{i}")

    t = "text_model"
    text: dict = {
        "token_embedding": sd[f"{t}.embeddings.token_embedding.weight"],
        "positional_embedding": sd[f"{t}.embeddings.position_embedding.weight"],
        "ln_final": {"scale": sd[f"{t}.final_layer_norm.weight"],
                     "bias": sd[f"{t}.final_layer_norm.bias"]},
        "text_projection": np.transpose(sd["text_projection.weight"]),
    }
    for i in range(text_layers):
        text[f"block{i}"] = block(f"{t}.encoder.layers.{i}")

    return {"visual": visual, "text": text}


# ------------------------------- StyleGAN2 --------------------------------- #


def _fc(sd: dict, prefix: str) -> dict:
    out = {"weight": sd[f"{prefix}.weight"]}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _infer_resolution(sd: dict, prefix: str) -> int:
    """Image resolution from the ``{prefix}b{res}.`` key family (the NVlabs
    naming both synthesis and discriminator state_dicts use) — so converters
    work on any-resolution checkpoints without the caller guessing."""
    import re

    pat = re.compile(rf"^{re.escape(prefix)}b(\d+)\.")
    res = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    if not res:
        raise ValueError(
            f"no '{prefix}b<res>.' keys found — cannot infer the resolution "
            "(not a StyleGAN2 synthesis/discriminator state_dict?)")
    return max(res)


def _synthesis_layer(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "affine": _fc(sd, f"{prefix}.affine"),
        "weight": _conv(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }
    noise = {}
    if f"{prefix}.noise_strength" in sd:
        params["noise_strength"] = np.asarray(sd[f"{prefix}.noise_strength"])
        if f"{prefix}.noise_const" in sd:
            noise["noise_const"] = sd[f"{prefix}.noise_const"]
    return params, noise


def convert_torch_synthesis(sd: dict[str, np.ndarray], prefix: str = "synthesis",
                            img_resolution: int | None = None) -> dict:
    """Convert a torch SynthesisNetwork state_dict subtree into
    {"params": ..., "noise": ...} for :class:`SynthesisNetwork`.
    ``img_resolution=None`` infers it from the ``b{res}`` keys."""
    import math

    if img_resolution is None:
        img_resolution = _infer_resolution(sd, f"{prefix}." if prefix else "")
    params: dict = {}
    noise: dict = {}
    resolutions = [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]
    for res in resolutions:
        bp: dict = {}
        bn: dict = {}
        base = f"{prefix}.b{res}"
        if res == 4:
            bp["const"] = np.transpose(sd[f"{base}.const"], (1, 2, 0))  # CHW -> HWC
        else:
            p, n = _synthesis_layer(sd, f"{base}.conv0")
            bp["conv0"] = p
            if n:
                bn["conv0"] = n
        p, n = _synthesis_layer(sd, f"{base}.conv1")
        bp["conv1"] = p
        if n:
            bn["conv1"] = n
        if f"{base}.torgb.weight" in sd:
            bp["torgb"] = {
                "affine": _fc(sd, f"{base}.torgb.affine"),
                "weight": _conv(sd[f"{base}.torgb.weight"]),
                "bias": sd[f"{base}.torgb.bias"],
            }
        params[f"b{res}"] = bp
        if bn:
            noise[f"b{res}"] = bn
    return {"params": params, "noise": noise}


def convert_torch_generator(sd: dict[str, np.ndarray],
                            img_resolution: int | None = None,
                            mapping_layers: int | None = None,
                            strict: bool = False) -> dict:
    """Convert a full torch StyleGAN2 Generator state_dict into variables for
    :class:`viscoin_tpu.models.stylegan.Generator`. Resolution and mapping
    depth default to inference from the keys, so any-config pickles port
    without the caller hardcoding the 256² reference shape. ``strict``
    validates against the manifest of the reference pretrained-CUB config
    (256², z=512, 'auto' channels) — other configs port fine non-strict."""
    if strict:
        validate_state_dict(sd, "stylegan_generator")
    if mapping_layers is None:
        mapping_layers = sum(1 for k in sd
                             if k.startswith("mapping.fc") and
                             k.endswith(".weight"))
        if not mapping_layers:
            raise ValueError("no mapping.fc{i} keys — not a Generator "
                             "state_dict?")
    syn = convert_torch_synthesis(sd, "synthesis", img_resolution)
    mapping: dict = {}
    for i in range(mapping_layers):
        mapping[f"fc{i}"] = _fc(sd, f"mapping.fc{i}")
    # w_avg buffer (truncation): default zeros when absent — the collection
    # must exist for apply().
    w_dim = sd[f"mapping.fc{mapping_layers - 1}.weight"].shape[0]
    w_avg = sd.get("mapping.w_avg", np.zeros((w_dim,), np.float32))
    return {
        "params": {"synthesis": syn["params"], "mapping": mapping},
        "noise": {"synthesis": syn["noise"]},
        "moving_stats": {"mapping": {"w_avg": w_avg}},
    }


def convert_torch_adapted_mapping(
    sd: dict[str, np.ndarray],
    prefix: str = "mapping",
    num_ws: int = 14,
    num_layers: int = 1,
    coarse_layer: int = 2,
    mid_layer: int = 10,
) -> dict:
    """Convert the reference MappingNetworkAdapted per-index MLPs (s0..s13,
    viscoin/models/gan.py:189-209) into the stacked two-group layout of
    :class:`MappingNetworkAdapted` (g1 = coarse..mid from z1, g2 = rest)."""
    g1 = [i for i in range(num_ws) if coarse_layer <= i <= mid_layer]
    g2 = [i for i in range(num_ws) if i < coarse_layer or i > mid_layer]
    p = f"{prefix}." if prefix else ""
    params: dict = {}
    for name, idxs in (("g1", g1), ("g2", g2)):
        for layer in range(num_layers):
            w = np.stack([sd[f"{p}s{i}.{layer}.weight"] for i in idxs])
            b = np.stack([sd[f"{p}s{i}.{layer}.bias"] for i in idxs])
            params[f"{name}_w{layer}"] = w
            params[f"{name}_b{layer}"] = b
    params["fixed_w_avg"] = sd[f"{p}fixed_w_avg"]
    return params


def convert_torch_discriminator(sd: dict[str, np.ndarray],
                                img_resolution: int | None = None,
                                prefix: str = "") -> dict:
    """Convert a torch StyleGAN2 Discriminator state_dict (NVlabs naming:
    b{res}.{fromrgb,conv0,conv1,skip}, b4.{conv,fc,out}) into params for
    :class:`viscoin_tpu.models.stylegan.Discriminator` — needed to fine-tune
    a pretrained reference GAN in-framework (train/gan.py).
    ``img_resolution=None`` infers it from the ``b{res}`` keys."""
    import math

    p = f"{prefix}." if prefix else ""
    if img_resolution is None:
        img_resolution = _infer_resolution(sd, p)
    params: dict = {}
    resolutions = [2**i for i in range(int(math.log2(img_resolution)), 2, -1)]
    for i, res in enumerate(resolutions):
        base = f"{p}b{res}"
        bp: dict = {}
        if f"{base}.fromrgb.weight" in sd:
            bp["fromrgb"] = {"weight": _conv(sd[f"{base}.fromrgb.weight"]),
                             "bias": sd[f"{base}.fromrgb.bias"]}
        bp["conv0"] = {"weight": _conv(sd[f"{base}.conv0.weight"]),
                       "bias": sd[f"{base}.conv0.bias"]}
        bp["conv1"] = {"weight": _conv(sd[f"{base}.conv1.weight"]),
                       "bias": sd[f"{base}.conv1.bias"]}
        bp["skip"] = {"weight": _conv(sd[f"{base}.skip.weight"])}
        params[f"b{res}"] = bp

    params["conv"] = {"weight": _conv(sd[f"{p}b4.conv.weight"]),
                      "bias": sd[f"{p}b4.conv.bias"]}
    # The epilogue FC consumes a flattened 4x4 map: torch flattens NCHW
    # (channel-major), our Discriminator flattens NHWC — permute the columns.
    w = sd[f"{p}b4.fc.weight"]
    c4 = w.shape[1] // 16
    w = w.reshape(-1, c4, 4, 4).transpose(0, 2, 3, 1).reshape(-1, 16 * c4)
    params["fc"] = {"weight": w, "bias": sd[f"{p}b4.fc.bias"]}
    params["out"] = {"weight": sd[f"{p}b4.out.weight"],
                     "bias": sd[f"{p}b4.out.bias"]}
    return params


def convert_torch_generator_adapted(sd: dict[str, np.ndarray],
                                    img_resolution: int | None = None,
                                    num_layers: int = 1, coarse_layer: int = 2,
                                    mid_layer: int = 10) -> dict:
    """Convert the reference GeneratorAdapted state_dict (viscoin/models/gan.py).
    ``img_resolution=None`` infers it from the synthesis ``b{res}`` keys."""
    import math

    if img_resolution is None:
        img_resolution = _infer_resolution(sd, "synthesis.")
    num_ws = 2 * int(math.log2(img_resolution)) - 2
    syn = convert_torch_synthesis(sd, "synthesis", img_resolution)
    mapping = convert_torch_adapted_mapping(
        sd, "mapping", num_ws=num_ws, num_layers=num_layers,
        coarse_layer=coarse_layer, mid_layer=mid_layer,
    )
    return {
        "params": {"synthesis": syn["params"], "mapping": mapping},
        "noise": {"synthesis": syn["noise"]},
    }
