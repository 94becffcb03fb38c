"""Port torch checkpoints from the reference ecosystem to orbax checkpoints.

Usage (requires torch, CPU is enough):

    python scripts/port_weights.py classifier   model.pt  checkpoints/cub/classifier-cub
    python scripts/port_weights.py viscoin      viscoin.pth out_dir       # joint state_dict (models/utils.py:177)
    python scripts/port_weights.py stylegan     gan.pkl   checkpoints/cub/gan-cub
    python scripts/port_weights.py lpips        lpips_vgg.pth checkpoints/lpips-vgg
    python scripts/port_weights.py clip         ViT-B-32.pt  checkpoints/clip/vit-b-32
    python scripts/port_weights.py inception    inception_v3.pth checkpoints/inception

Every port validates the source against the checked-in architecture manifest
(viscoin_tpu/manifests/*.json — exact key/shape inventories of the five
reference torch networks) and prints any missing / unexpected / mis-shaped
keys. `--strict` turns a dirty report into an abort; `--check` validates
WITHOUT writing anything (exit 0 clean / 1 problems):

    python scripts/port_weights.py clip ViT-B-32.pt --check

`stylegan` accepts either a plain state_dict or an NVlabs stylegan2-ada
pickle: the pickle is parsed with a shimmed `torch_utils.persistence` module
(the NVlabs format embeds its source; we only extract the raw tensors), so
the submodule is NOT needed.

Reverse direction (TPU-trained → reference ecosystem, utils/exporting.py):

    python scripts/port_weights.py export-viscoin      checkpoints/cub/viscoin-cub viscoin.pth
    python scripts/port_weights.py export-stylegan     checkpoints/cub/gan-cub     gan_state_dict.pth
    python scripts/port_weights.py export-classifier   checkpoints/cub/classifier  classifier.pth
    python scripts/port_weights.py export-concept2clip checkpoints/cub/concept2clip concept2clip.pth

`export-viscoin` writes the exact joint dict the reference's ``load_viscoin``
reads (models/utils.py:195-208); `export-stylegan` writes an NVlabs-naming
Generator state_dict (``Generator(...).load_state_dict(sd)`` against
stylegan2-ada-pytorch), plus ``<dst>.discriminator`` when a ported/trained
discriminator sits next to the source checkpoint. NVlabs constant buffers
(resample_filter) are reconstructed so strict loads succeed.
"""

import os
import sys

# Repo root from this file's location — the script works from any cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_file(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_nvlabs_pickle(path: str):
    """Best-effort extraction of {name: tensor} state dicts from an NVlabs
    stylegan2-ada network pickle WITHOUT the submodule: shim
    torch_utils.persistence so unpickling yields the embedded state dict.

    The NVlabs format pickles `_reconstruct_persistent_obj(meta)` calls where
    ``meta['state']`` holds the module state (incl. the state_dict tensors).
    """
    import pickle
    import sys
    import types

    import torch

    captured = []

    class _Stub:
        """Absorbs any reconstruction call and keeps the state."""

        def __init__(self, *args, **kwargs):
            self.args = args
            self.kwargs = kwargs

        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {"state": state})
            captured.append(self.__dict__)

    def _reconstruct(meta):
        captured.append(meta)
        return meta

    persistence = types.ModuleType("torch_utils.persistence")
    persistence._reconstruct_persistent_obj = _reconstruct
    # Shim torch_utils.persistence ONLY for the duration of this load: a
    # permanently-installed stub would shadow any real NVlabs torch_utils
    # imported later in the same process.
    saved = {n: sys.modules.get(n) for n in ("torch_utils", "torch_utils.persistence")}
    saved_attr = getattr(saved["torch_utils"], "persistence", None) if saved["torch_utils"] else None
    shim_root = saved["torch_utils"] or types.ModuleType("torch_utils")
    sys.modules["torch_utils"] = shim_root
    sys.modules["torch_utils.persistence"] = persistence
    shim_root.persistence = persistence

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return _Stub

        def persistent_load(self, pid):  # torch storage loading
            raise pickle.UnpicklingError("use torch.load path")

    try:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False,
                             pickle_module=pickle)
        except Exception:
            with open(path, "rb") as f:
                obj = _Unpickler(f).load()
    finally:
        for n, mod in saved.items():
            if mod is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = mod
        if saved["torch_utils"] is not None:
            if saved_attr is None:
                if getattr(saved["torch_utils"], "persistence", None) is persistence:
                    del saved["torch_utils"].persistence
            else:
                saved["torch_utils"].persistence = saved_attr

    # Collect tensor dicts from the object / captured metas, producing
    # torch state_dict naming ("synthesis.b4.conv1.weight"). With the
    # persistence shim, submodules unpickle to nested meta dicts
    # {type, version, module_src, class_name, state}, and torch module state
    # nests tensors under _parameters/_buffers and children under _modules —
    # all of these are TRANSPARENT containers that must not contribute a
    # path segment.
    _META_KEYS = {"type", "version", "module_src", "class_name", "state"}

    def _is_meta(d) -> bool:
        return isinstance(d, dict) and "state" in d and len(_META_KEYS & set(d)) >= 2

    def tensors_from(o, prefix=""):
        out = {}
        if isinstance(o, _Stub):
            o = o.__dict__
        if hasattr(o, "state_dict") and not isinstance(o, dict):
            try:
                return {f"{prefix}{k}": v for k, v in o.state_dict().items()}
            except Exception:
                pass
        if _is_meta(o):
            return tensors_from(o["state"], prefix)
        if not isinstance(o, dict):
            o = getattr(o, "__dict__", None)
            if o is None:
                return out
        for k, v in o.items():
            if k in ("_modules", "_parameters", "_buffers"):
                out.update(tensors_from(v, prefix))  # transparent container
            elif hasattr(v, "numpy") and hasattr(v, "shape"):
                out[f"{prefix}{k}"] = v
            elif isinstance(v, (dict, _Stub)) or _is_meta(v):
                out.update(tensors_from(v, f"{prefix}{k}."))
            elif hasattr(v, "__dict__") and not isinstance(v, (str, bytes)):
                out.update(tensors_from(v.__dict__, f"{prefix}{k}."))
        return out

    result = {}
    if isinstance(obj, dict):
        for key in ("G_ema", "G", "generator", "gan", "D", "discriminator"):
            if key in obj:
                result[key] = tensors_from(obj[key] if isinstance(obj[key], dict)
                                           else getattr(obj[key], "__dict__", {}))
        if not result:
            result["G_ema"] = tensors_from(obj)
    for meta in captured:
        state = meta.get("state", meta)
        if isinstance(state, dict):
            t = tensors_from(state)
            if t and "G_ema" not in result:
                result["G_ema"] = t
    return result


def _to_torch(sd: dict):
    import numpy as np
    import torch

    return {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}


def _clip_manifest_kind(sd) -> str:
    return ("clip_hf" if any(k.startswith("vision_model") for k in sd)
            else "clip_openai")


def check_source(kind: str, sd: dict, strict: bool) -> list[str]:
    """Validate a source state_dict against its manifest; print the report.
    Returns the problem list (empty = clean). With ``strict`` a dirty
    state_dict aborts the port."""
    from viscoin_tpu.utils import porting

    manifest_kind = {"classifier": "classifier", "lpips": "lpips",
                     "inception": "inception",
                     "stylegan": "stylegan_generator"}.get(kind)
    if kind == "clip":
        manifest_kind = _clip_manifest_kind(sd)
    if manifest_kind is None:
        print(f"# no manifest for kind {kind!r} — skipping validation")
        return []
    problems = porting.validate_state_dict(sd, manifest_kind, strict=False)
    if not problems:
        print(f"manifest check [{manifest_kind}]: OK "
              f"({len(sd)} keys, all accounted for)")
    else:
        for p in problems[:40]:
            print(f"manifest check [{manifest_kind}]: {p}")
        if len(problems) > 40:
            print(f"manifest check [{manifest_kind}]: ... and "
                  f"{len(problems) - 40} more")
        if strict:
            raise SystemExit(
                f"{len(problems)} manifest problems (strict mode) — the "
                "checkpoint does not match the reference architecture; "
                "re-run without --strict to port anyway")
    return problems


def main():
    from viscoin_tpu.utils import porting
    from viscoin_tpu.utils.checkpoints import save_pytree

    argv = [a for a in sys.argv[1:] if a not in ("--check", "--strict")]
    check_only = "--check" in sys.argv
    strict = "--strict" in sys.argv
    kind, src = argv[0], argv[1]
    dst = argv[2] if len(argv) > 2 else None
    if dst is None and not check_only:
        raise SystemExit("usage: port_weights.py KIND SRC DST "
                         "[--check|--strict]")
    # export-* sources are orbax checkpoints, stylegan parses its own pickle
    obj = (load_torch_file(src)
           if kind != "stylegan" and not kind.startswith("export-") else None)

    if check_only:
        # Validate-only path: report missing/unexpected/mis-shaped keys
        # against the checked-in architecture manifests, write nothing.
        if kind == "stylegan":
            nets = load_nvlabs_pickle(src)
            sd = (nets.get("G_ema") or nets.get("G") or nets.get("generator")
                  or nets.get("gan") or {})
        elif kind == "viscoin":
            sd = obj["classifier"]  # the joint dict's manifest-covered part
            kind = "classifier"
        else:
            sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        problems = check_source(kind, porting.state_dict_to_numpy(sd),
                                strict=False)
        raise SystemExit(1 if problems else 0)

    if kind == "classifier":
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        check_source(kind, porting.state_dict_to_numpy(sd), strict)
        out = porting.convert_torch_classifier(porting.state_dict_to_numpy(sd))
    elif kind == "viscoin":
        sd = obj  # {"classifier":..., "concept_extractor":..., ...} of state_dicts
        check_source("classifier",
                     porting.state_dict_to_numpy(sd["classifier"]), strict)
        out = {
            "classifier": porting.convert_torch_classifier(
                porting.state_dict_to_numpy(sd["classifier"])),
            "concept_extractor": porting.convert_torch_concept_extractor(
                porting.state_dict_to_numpy(sd["concept_extractor"])),
            "explainer": porting.convert_torch_explainer(
                porting.state_dict_to_numpy(sd["explainer"])),
            "gan": porting.convert_torch_generator_adapted(
                porting.state_dict_to_numpy(sd["gan"])),
        }
    elif kind == "stylegan":
        nets = load_nvlabs_pickle(src)
        sd = (nets.get("G_ema") or nets.get("G") or nets.get("generator")
              or nets.get("gan"))
        if not sd:
            raise SystemExit(f"no generator tensors found in {src} — is this a "
                             "stylegan2-ada network pickle with a G/G_ema entry?")
        check_source(kind, porting.state_dict_to_numpy(sd), strict)
        out = porting.convert_torch_generator(porting.state_dict_to_numpy(sd))
        # Discriminator (when the pickle ships one): written NEXT to the
        # generator as <dst>.discriminator — `train gan --init-from <dst>`
        # picks it up for transfer learning (upstream --resume semantics).
        d_sd = nets.get("D") or nets.get("discriminator")
        if d_sd:
            save_pytree(
                porting.convert_torch_discriminator(
                    porting.state_dict_to_numpy(d_sd)),
                f"{dst}.discriminator")
            print(f"ported stylegan discriminator: {src} -> "
                  f"{dst}.discriminator")
    elif kind == "lpips":
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        check_source(kind, porting.state_dict_to_numpy(sd), strict)
        out = porting.convert_torch_lpips(porting.state_dict_to_numpy(sd))
    elif kind == "clip":
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        keys = list(sd)
        check_source(kind, porting.state_dict_to_numpy(sd), strict)
        conv = (porting.convert_hf_clip if any(k.startswith("vision_model") for k in keys)
                else porting.convert_torch_clip)
        out = conv(porting.state_dict_to_numpy(sd))
    elif kind == "inception":
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        check_source(kind, porting.state_dict_to_numpy(sd), strict)
        out = porting.convert_torch_inception(porting.state_dict_to_numpy(sd))
    elif kind == "inception-nvlabs":
        out = port_inception_nvlabs(src, dst)
        return
    elif kind == "export-viscoin":
        import torch

        from viscoin_tpu.utils import exporting
        from viscoin_tpu.utils.checkpoints import load_viscoin_bundle

        joint = exporting.export_viscoin_torch(load_viscoin_bundle(src))
        torch.save({m: _to_torch(sd) for m, sd in joint.items()}, dst)
        print(f"exported viscoin joint state_dict (load_viscoin format): "
              f"{src} -> {dst}")
        return
    elif kind == "export-classifier":
        import torch

        from viscoin_tpu.utils import exporting
        from viscoin_tpu.utils.checkpoints import restore_pytree

        sd = exporting.export_classifier_torch(restore_pytree(src))
        torch.save(_to_torch(sd), dst)
        print(f"exported classifier state_dict (reference Classifier "
              f"naming): {src} -> {dst}")
        return
    elif kind == "export-concept2clip":
        import torch

        from viscoin_tpu.utils import exporting
        from viscoin_tpu.utils.checkpoints import restore_pytree

        sd = exporting.export_concept2clip_torch(restore_pytree(src))
        torch.save(_to_torch(sd), dst)
        print(f"exported concept2clip state_dict (reference nn.Sequential "
              f"naming): {src} -> {dst}")
        return
    elif kind == "export-stylegan":
        import torch

        from viscoin_tpu.utils import exporting
        from viscoin_tpu.utils.checkpoints import restore_pytree

        sd = exporting.export_generator_torch(restore_pytree(src))
        torch.save(_to_torch(sd), dst)
        d_src = f"{src}.discriminator"
        if os.path.exists(d_src):
            d_sd = exporting.export_discriminator_torch(restore_pytree(d_src))
            torch.save(_to_torch(d_sd), f"{dst}.discriminator")
            print(f"exported stylegan discriminator: {d_src} -> "
                  f"{dst}.discriminator")
        print(f"exported stylegan generator state_dict (NVlabs naming): "
              f"{src} -> {dst}")
        return
    else:
        raise SystemExit(f"unknown kind: {kind}")

    save_pytree(out, dst)
    print(f"ported {kind}: {src} -> {dst}")


def port_inception_nvlabs(src: str, dst: str, verify: bool = True):
    """Convert the NVlabs TorchScript FID detector (inception-2015-12-05.pt,
    reference: viscoin/testing/viscoin.py:85-88) and SELF-VERIFY the
    conversion numerically against the TorchScript module before saving:

      * at 299² input (the resize is identity there) the converted Flax
        features must match the TorchScript features — proves the weight
        mapping and the (x−128)/128 scaling;
      * at 256² (the eval resolution, exercising the internal TF1 resize) a
        mismatch prints the measured deviation as a WARNING rather than
        failing, since the resize path tolerates small convention drift.

    On verification failure the port aborts with a pointer to
    ``make_torchscript_fid_detector`` (bit-exact, host-CPU)."""
    import json as _json

    import numpy as np
    import torch
    import jax.numpy as jnp

    from viscoin_tpu.models.inception import (
        InceptionV3Features,
        nvlabs_fid_preprocess,
    )
    from viscoin_tpu.utils import porting
    from viscoin_tpu.utils.checkpoints import _abs, save_pytree

    mod = torch.jit.load(src, map_location="cpu").eval()
    out = porting.convert_torchscript_inception(mod)
    model = InceptionV3Features()

    def flax_features(x_nhwc):
        return np.asarray(model.apply(
            {"params": out["params"], "batch_stats": out["batch_stats"]},
            nvlabs_fid_preprocess(jnp.asarray(x_nhwc))))

    def ts_features(x_nhwc):
        t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        with torch.no_grad():
            try:
                return mod(t, return_features=True).numpy()
            except (TypeError, RuntimeError):
                return mod(t).numpy()

    if verify:
        rng = np.random.default_rng(0)
        x299 = rng.uniform(-2.1, 2.6, (2, 299, 299, 3)).astype(np.float32)
        want, got = ts_features(x299), flax_features(x299)
        err = np.abs(want - got).max() / max(np.abs(want).max(), 1e-8)
        if err > 1e-2:
            raise SystemExit(
                f"self-verification FAILED at 299² (rel err {err:.2e}): the "
                "export's layout or scaling does not match the assumed NVlabs "
                "convention. Use the bit-exact host path instead: "
                "viscoin_tpu.models.inception.make_torchscript_fid_detector("
                f"{src!r})")
        x256 = rng.uniform(-2.1, 2.6, (2, 256, 256, 3)).astype(np.float32)
        err256 = (np.abs(ts_features(x256) - flax_features(x256)).max()
                  / max(np.abs(want).max(), 1e-8))
        if err256 > 1e-2:
            print(f"WARNING: 256²-input deviation {err256:.2e} (internal "
                  "resize convention drift); 299² verification passed")
        print(f"self-verified: 299² rel err {err:.2e}, 256² rel err {err256:.2e}")

    save_pytree(out, dst)
    with open(os.path.join(_abs(dst), "fid_convention.json"), "w") as f:
        _json.dump({"convention": "nvlabs"}, f)
    print(f"ported inception-nvlabs: {src} -> {dst}")
    return out


if __name__ == "__main__":
    main()
