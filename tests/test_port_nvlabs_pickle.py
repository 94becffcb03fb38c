"""NVlabs persistence-pickle extraction (scripts/port_weights.py stylegan path).

Fabricates a stylegan2-ada-style network pickle — nested
`torch_utils.persistence._reconstruct_persistent_obj(meta)` objects whose
torch-module state nests tensors under `_parameters`/`_buffers` and children
under `_modules` — WITHOUT the NVlabs submodule, and asserts
`load_nvlabs_pickle` recovers flat torch state_dict naming
('synthesis.b4.conv1.weight', 'mapping.fc0.weight', ...) that
`convert_torch_generator` can consume end-to-end.
"""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _reconstruct_persistent_obj(meta):  # pickled by reference (GLOBAL opcode)
    return meta


_reconstruct_persistent_obj.__module__ = "torch_utils.persistence"


class _Persisted:
    """Pickles as a call to torch_utils.persistence._reconstruct_persistent_obj,
    exactly like NVlabs persistence-decorated modules do."""

    def __init__(self, meta):
        self.meta = meta

    def __reduce__(self):
        import torch_utils.persistence as pers  # the fake module below

        return (pers._reconstruct_persistent_obj, (self.meta,))


def _module_meta(class_name, params=None, buffers=None, modules=None):
    state = {
        "training": False,
        "_parameters": {k: torch.as_tensor(v) for k, v in (params or {}).items()},
        "_buffers": {k: torch.as_tensor(v) for k, v in (buffers or {}).items()},
        "_modules": {k: _Persisted(v) for k, v in (modules or {}).items()},
    }
    return {
        "type": "class",
        "version": 3,
        "module_src": "# embedded source elided",
        "class_name": class_name,
        "state": state,
    }


def _fabricate_pickle(path, rng):
    """{'G_ema': Generator(mapping(fc0), synthesis(b4(const, conv1(affine))))}"""
    affine = _module_meta("FullyConnectedLayer", params={
        "weight": rng.standard_normal((8, 16)).astype(np.float32),
        "bias": np.ones(8, np.float32),
    })
    conv1 = _module_meta("SynthesisLayer", params={
        "weight": rng.standard_normal((8, 8, 3, 3)).astype(np.float32),
        "bias": np.zeros(8, np.float32),
        "noise_strength": np.zeros((), np.float32),
    }, buffers={
        "noise_const": rng.standard_normal((4, 4)).astype(np.float32),
    }, modules={"affine": affine})
    b4 = _module_meta("SynthesisBlock", params={
        "const": rng.standard_normal((8, 4, 4)).astype(np.float32),
    }, modules={"conv1": conv1})
    synthesis = _module_meta("SynthesisNetwork", modules={"b4": b4})
    fc0 = _module_meta("FullyConnectedLayer", params={
        "weight": rng.standard_normal((16, 16)).astype(np.float32),
        "bias": np.zeros(16, np.float32),
    })
    mapping = _module_meta("MappingNetwork", buffers={
        "w_avg": rng.standard_normal(16).astype(np.float32),
    }, modules={"fc0": fc0})
    gen = _module_meta("Generator", modules={"synthesis": synthesis,
                                             "mapping": mapping})

    # Pickling _Persisted needs a importable torch_utils.persistence symbol.
    pers = types.ModuleType("torch_utils.persistence")
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu = types.ModuleType("torch_utils")
    tu.persistence = pers
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pers
    try:
        with open(path, "wb") as f:
            pickle.dump({"G_ema": _Persisted(gen), "G": _Persisted(gen)}, f)
    finally:
        # The loader must work in a process where the submodule is ABSENT.
        del sys.modules["torch_utils"]
        del sys.modules["torch_utils.persistence"]


def test_load_nvlabs_pickle_extracts_discriminator(tmp_path):
    """Pickles ship G_ema AND D; the D entry is recovered with flat torch
    naming and flows through convert_torch_discriminator (4² epilogue-only
    config) — the `train gan --init-from` transfer-learning path."""
    sys.path.insert(0, "scripts")
    from port_weights import load_nvlabs_pickle

    rng = np.random.default_rng(1)
    conv = _module_meta("Conv2dLayer", params={
        "weight": rng.standard_normal((8, 8, 3, 3)).astype(np.float32),
        "bias": np.zeros(8, np.float32),
    })
    fc = _module_meta("FullyConnectedLayer", params={
        "weight": rng.standard_normal((16, 8 * 16)).astype(np.float32),
        "bias": np.zeros(16, np.float32),
    })
    out = _module_meta("FullyConnectedLayer", params={
        "weight": rng.standard_normal((1, 16)).astype(np.float32),
        "bias": np.zeros(1, np.float32),
    })
    b4 = _module_meta("DiscriminatorEpilogue",
                      modules={"conv": conv, "fc": fc, "out": out})
    disc = _module_meta("Discriminator", modules={"b4": b4})

    pers = types.ModuleType("torch_utils.persistence")
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu = types.ModuleType("torch_utils")
    tu.persistence = pers
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pers
    path = str(tmp_path / "net.pkl")
    try:
        with open(path, "wb") as f:
            pickle.dump({"G_ema": _Persisted(_module_meta("Generator")),
                         "D": _Persisted(disc)}, f)
    finally:
        del sys.modules["torch_utils"]
        del sys.modules["torch_utils.persistence"]

    nets = load_nvlabs_pickle(path)
    assert "D" in nets
    sd = nets["D"]
    assert {"b4.conv.weight", "b4.conv.bias", "b4.fc.weight", "b4.fc.bias",
            "b4.out.weight", "b4.out.bias"} <= set(sd)

    from viscoin_tpu.utils.porting import (
        convert_torch_discriminator,
        state_dict_to_numpy,
    )

    params = convert_torch_discriminator(state_dict_to_numpy(sd),
                                         img_resolution=4)
    assert params["conv"]["weight"].shape == (3, 3, 8, 8)  # HWIO
    assert params["fc"]["weight"].shape == (16, 128)  # NHWC-permuted columns
    assert params["out"]["weight"].shape == (1, 16)


def test_load_nvlabs_pickle_state_dict_naming(tmp_path):
    sys.path.insert(0, "scripts")
    from port_weights import load_nvlabs_pickle

    path = str(tmp_path / "net.pkl")
    rng = np.random.default_rng(0)
    _fabricate_pickle(path, rng)

    nets = load_nvlabs_pickle(path)
    assert "G_ema" in nets
    sd = nets["G_ema"]
    expected = {
        "synthesis.b4.const",
        "synthesis.b4.conv1.weight",
        "synthesis.b4.conv1.bias",
        "synthesis.b4.conv1.noise_strength",
        "synthesis.b4.conv1.noise_const",
        "synthesis.b4.conv1.affine.weight",
        "synthesis.b4.conv1.affine.bias",
        "mapping.fc0.weight",
        "mapping.fc0.bias",
        "mapping.w_avg",
    }
    assert expected <= set(sd), f"missing: {expected - set(sd)}"
    assert sd["synthesis.b4.conv1.weight"].shape == (8, 8, 3, 3)

    # End-to-end through the converter (4x4-only pyramid).
    from viscoin_tpu.utils.porting import convert_torch_generator, state_dict_to_numpy

    # add the torgb layer the converter expects for a complete 4² generator
    sd["synthesis.b4.torgb.weight"] = torch.as_tensor(
        rng.standard_normal((3, 8, 1, 1)).astype(np.float32))
    sd["synthesis.b4.torgb.bias"] = torch.zeros(3)
    sd["synthesis.b4.torgb.affine.weight"] = torch.as_tensor(
        rng.standard_normal((8, 16)).astype(np.float32))
    sd["synthesis.b4.torgb.affine.bias"] = torch.ones(8)
    out = convert_torch_generator(state_dict_to_numpy(sd), img_resolution=4,
                                  mapping_layers=1)
    assert out["params"]["synthesis"]["b4"]["conv1"]["weight"].shape == (3, 3, 8, 8)
    assert np.allclose(out["moving_stats"]["mapping"]["w_avg"],
                       sd["mapping.w_avg"].numpy())
