"""Weight-porting manifests (VERDICT r4 item 6): zero egress means no real
pretrained checkpoint has ever flowed through the converters — their key-name
coverage has only seen synthetically constructed state_dicts. The checked-in
manifests (viscoin_tpu/manifests/*.json) pin the EXACT key/shape inventory of
each reference torch network so first real contact fails with a clear report
instead of a KeyError. Tested here three ways:

1. the manifests match freshly instantiated torch twins (transformers
   ResNet-50 / CLIP ViT-B/32 — the same architectures the reference loads);
2. a state_dict built FROM each manifest both passes strict validation and
   converts cleanly (manifest coverage == converter consumption);
3. validation errors name the problem (missing / unexpected / mis-shaped).
"""

import subprocess
import sys

import numpy as np
import pytest

from viscoin_tpu.utils import porting

torch = pytest.importorskip("torch")


def _build_sd(manifest: dict, wildcard: int = 200) -> dict:
    """Random numpy state_dict realizing a manifest (required + optional;
    one_of groups realized by their first member, already in optional)."""
    rng = np.random.default_rng(0)
    out = {}
    for part in ("required", "optional"):
        for k, shape in manifest.get(part, {}).items():
            if k.startswith("lins."):
                continue  # alternate naming of the lin{i} heads
            shape = [wildcard if d == -1 else d for d in shape]
            out[k] = rng.standard_normal(shape).astype(np.float32)
    return out


# ------------------------- twins match manifests --------------------------- #


def test_classifier_manifest_matches_transformers_twin():
    """The manifest IS the microsoft/resnet-50 architecture: ResNetConfig()
    defaults (reference viscoin/models/classifiers.py:52 loads exactly
    microsoft/resnet-50, whose config equals the defaults)."""
    from transformers import ResNetConfig, ResNetModel

    man = porting.load_manifest("classifier")
    with torch.device("meta"):
        model = ResNetModel(ResNetConfig())
    twin = {f"resnet.{k}": list(v.shape) for k, v in model.state_dict().items()
            if not k.endswith("num_batches_tracked")
            and not k.startswith("pooler.")}
    required = {k: v for k, v in man["required"].items()
                if not k.startswith("linear.")}
    assert required == twin


def test_clip_hf_manifest_matches_transformers_twin():
    from transformers import CLIPConfig, CLIPModel

    man = porting.load_manifest("clip_hf")
    with torch.device("meta"):
        model = CLIPModel(CLIPConfig())
    twin = {k: list(v.shape) for k, v in model.state_dict().items()}
    for k, want in man["required"].items():
        assert k in twin, f"manifest key {k} not in transformers CLIPModel"
        assert twin[k] == want, (k, twin[k], want)
    # and the twin has nothing the manifest doesn't know about
    known = set(man["required"]) | set(man.get("optional", {}))
    extra = set(twin) - known
    assert not extra, f"transformers CLIPModel keys missing from manifest: {sorted(extra)[:10]}"


# ------------------- manifest-built dicts convert cleanly ------------------ #


@pytest.mark.parametrize("kind,converter", [
    ("classifier", lambda sd: porting.convert_torch_classifier(sd, strict=True)),
    ("lpips", lambda sd: porting.convert_torch_lpips(sd, strict=True)),
    ("clip_openai", lambda sd: porting.convert_torch_clip(sd, strict=True)),
    ("clip_hf", lambda sd: porting.convert_hf_clip(sd, strict=True)),
    ("inception", lambda sd: porting.convert_torch_inception(sd, strict=True)),
    ("stylegan_generator",
     lambda sd: porting.convert_torch_generator(sd, strict=True)),
])
def test_manifest_built_state_dict_converts(kind, converter):
    """Strict validation passes on a manifest-realized state_dict AND the
    converter consumes every key it needs from exactly that inventory."""
    sd = _build_sd(porting.load_manifest(kind))
    out = converter(sd)
    assert out, kind
    n_leaves = len([x for x in _tree_leaves(out)])
    assert n_leaves > 10, (kind, n_leaves)


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


# --------------------------- error-report quality -------------------------- #


def test_validation_reports_missing_unexpected_misshaped():
    man = porting.load_manifest("lpips")
    sd = _build_sd(man)
    del sd["net.slice1.0.weight"]
    sd["net.slice9.0.weight"] = np.zeros((1,), np.float32)
    sd["net.slice1.2.bias"] = np.zeros((3,), np.float32)

    problems = porting.validate_state_dict(sd, "lpips", strict=False)
    text = "\n".join(problems)
    assert "missing required key: net.slice1.0.weight" in text
    assert "unexpected key: net.slice9.0.weight" in text
    assert "shape mismatch: net.slice1.2.bias" in text

    with pytest.raises(ValueError, match="net.slice1.0.weight"):
        porting.validate_state_dict(sd, "lpips")

    # one_of: dropping BOTH naming generations of a lin head is missing
    sd2 = _build_sd(man)
    del sd2["lin0.model.1.weight"]
    problems = porting.validate_state_dict(sd2, "lpips", strict=False)
    assert any("one of" in p and "lin0.model.1.weight" in p for p in problems)
    # ... but the alternate naming alone satisfies the group
    sd2["lins.0.model.1.weight"] = np.zeros((1, 64, 1, 1), np.float32)
    assert porting.validate_state_dict(sd2, "lpips", strict=False) == []


def test_wildcard_dims_accept_any_class_count():
    man = porting.load_manifest("classifier")
    for n_classes in (2, 200, 555):
        sd = _build_sd(man, wildcard=n_classes)
        assert porting.validate_state_dict(sd, "classifier", strict=False) == []


def test_unknown_manifest_kind_refused():
    with pytest.raises(ValueError, match="no manifest"):
        porting.load_manifest("vae")


# ------------------------------ CLI --check -------------------------------- #


def test_port_weights_check_cli(tmp_path):
    """`port_weights.py KIND SRC --check` exits 0 on a clean checkpoint and
    1 with a report on a broken one, writing nothing either way."""
    sd = _build_sd(porting.load_manifest("lpips"))
    clean = tmp_path / "lpips.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, clean)

    bad_sd = dict(sd)
    del bad_sd["net.slice5.28.bias"]
    bad = tmp_path / "broken.pth"
    torch.save({k: torch.from_numpy(v) for k, v in bad_sd.items()}, bad)

    def run(path):
        return subprocess.run(
            [sys.executable, "scripts/port_weights.py", "lpips", str(path),
             "--check"], capture_output=True, text=True)

    r = run(clean)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
    r = run(bad)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "net.slice5.28.bias" in r.stdout
    assert list(tmp_path.iterdir()) == [clean, bad] or {
        p.name for p in tmp_path.iterdir()} == {"lpips.pth", "broken.pth"}
