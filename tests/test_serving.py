"""Tests for the serving layer: engine, micro-batcher, HTTP server, AOT
export artifacts."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted
from viscoin_tpu.serve.batching import MicroBatcher
from viscoin_tpu.serve.engine import InferenceEngine
from viscoin_tpu.serve.export import export_serving, load_exported
from viscoin_tpu.serve.server import VisCoINServer, _decode_images

IMG, NC, NK = 32, 5, 8


@pytest.fixture(scope="module")
def models():
    m = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    return init_models(m, jax.random.PRNGKey(0), image_size=IMG)


@pytest.fixture(scope="module")
def engine(models):
    return InferenceEngine(models, batch_size=4)


def _images(n, size=IMG, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, size, size, 3), dtype=np.uint8)


# ------------------------------- engine ---------------------------------- #


def test_engine_classify_shapes_and_consistency(engine, models):
    imgs = _images(3)
    out = engine.classify(imgs)
    assert out["logits"].shape == (3, NC)
    assert out["expl_probas"].shape == (3, NC)
    assert out["concepts"].shape == (3, NK)
    np.testing.assert_allclose(out["probas"].sum(-1), 1.0, atol=1e-5)
    # Consistency with the direct bundle forward (same preprocessing).
    from viscoin_tpu.data.transforms import device_preprocess

    ref = models.forward_all(device_preprocess(jnp.asarray(imgs)))
    np.testing.assert_allclose(out["logits"], np.asarray(ref["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_engine_padding_invariance(engine):
    """3 images through a batch-4 engine == each image alone (padding rows
    must not leak into real rows)."""
    imgs = _images(3, seed=1)
    batched = engine.classify(imgs)
    for i in range(3):
        single = engine.classify(imgs[i])
        np.testing.assert_allclose(batched["logits"][i], single["logits"][0],
                                   rtol=1e-5, atol=1e-5)


def test_engine_chunking(engine):
    """9 images chunk into 3 device batches and concatenate back."""
    imgs = _images(9, seed=2)
    out = engine.classify(imgs)
    assert out["logits"].shape == (9, NC)
    half = engine.classify(imgs[4:])
    np.testing.assert_allclose(out["logits"][4:], half["logits"],
                               rtol=1e-5, atol=1e-5)


def test_engine_reconstruct(engine):
    out = engine.reconstruct(_images(2, seed=3))
    rec = out["reconstruction_u8"]
    assert rec.shape == (2, IMG, IMG, 3) and rec.dtype == np.uint8
    assert out["preds"].shape == (2,)


def test_engine_prepare_image_resizes(engine):
    big = _images(1, size=77, seed=4)[0]
    prep = engine.prepare_image(big)
    assert prep.shape == (IMG, IMG, 3) and prep.dtype == np.uint8


def test_engine_amplify(engine):
    res = engine.amplify(_images(1, seed=5)[0],
                         {"method": "top_k", "k": 2}, [0.0, 2.0])
    assert len(res.amplified_images) == 2
    assert len(res.best_concept_probas_best) == 2
    assert np.isfinite(res.best_concept_probas_best).all()


# ----------------------------- micro-batcher ------------------------------ #


def test_microbatcher_correctness_under_concurrency():
    def run(items):
        return [x * 2 for x in items]

    mb = MicroBatcher(run, max_batch=4, max_delay_ms=10)
    try:
        futs = [mb.submit(i) for i in range(17)]
        results = [f.result(timeout=5) for f in futs]
        assert results == [2 * i for i in range(17)]
        snap = mb.stats.snapshot()
        assert snap["requests"] == 17
        # 17 requests through batch-4 windows: must coalesce into >=5 but
        # strictly fewer than 17 dispatches.
        assert 5 <= snap["batches"] < 17
        assert snap["mean_batch_occupancy"] > 1.0
    finally:
        mb.close()


def test_microbatcher_coalesces_queued_requests():
    started = threading.Event()

    def run(items):
        started.wait(5)
        return items

    mb = MicroBatcher(run, max_batch=8, max_delay_ms=50)
    try:
        futs = [mb.submit(i) for i in range(8)]
        started.set()
        for f in futs:
            f.result(timeout=5)
        # All 8 were enqueued within the batching window -> few dispatches.
        assert mb.stats.snapshot()["batches"] <= 2
    finally:
        mb.close()


def test_microbatcher_error_propagates_and_recovers():
    def run(items):
        if any(x is None for x in items):
            raise ValueError("poison")
        return items

    mb = MicroBatcher(run, max_batch=2, max_delay_ms=1)
    try:
        bad = mb.submit(None)
        with pytest.raises(ValueError, match="poison"):
            bad.result(timeout=5)
        assert mb.submit(7).result(timeout=5) == 7  # worker survived
        assert mb.stats.snapshot()["errors"] >= 1
    finally:
        mb.close()


def test_microbatcher_rejects_after_close():
    mb = MicroBatcher(lambda items: items, max_batch=2)
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(1)


# ------------------------------ HTTP server ------------------------------- #


def _npz_body(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _post(url, body, content_type="application/octet-stream"):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


@pytest.fixture(scope="module")
def server(engine):
    vs = VisCoINServer(engine, max_delay_ms=2.0)
    httpd = vs.make_server(port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, vs
    httpd.shutdown()
    httpd.server_close()
    vs.close()


def test_server_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["resolution"] == IMG


def test_server_classify_npz(server):
    base, _ = server
    status, ctype, body = _post(base + "/v1/classify?top_k=3",
                                _npz_body(images=_images(2, seed=6)))
    assert status == 200 and ctype == "application/json"
    payload = json.loads(body)
    assert len(payload["preds"]) == 2
    assert len(payload["top_classes"][0]) == 3
    assert len(payload["top_concepts"][0]) == 3


def test_server_classify_json_and_image_bodies(server):
    base, _ = server
    img = _images(1, seed=7)[0]
    status, _, body = _post(base + "/v1/classify",
                            json.dumps({"images": img.tolist()}).encode(),
                            "application/json")
    assert status == 200 and len(json.loads(body)["preds"]) == 1

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    status, _, body = _post(base + "/v1/classify", buf.getvalue(), "image/png")
    assert status == 200 and len(json.loads(body)["preds"]) == 1


def test_server_reconstruct_and_stats(server):
    base, vs = server
    status, ctype, body = _post(base + "/v1/reconstruct",
                                _npz_body(images=_images(3, seed=8)))
    assert status == 200 and ctype == "application/octet-stream"
    data = np.load(io.BytesIO(body))
    assert data["reconstruction_u8"].shape == (3, IMG, IMG, 3)
    assert data["preds"].shape == (3,)
    with urllib.request.urlopen(base + "/v1/stats", timeout=10) as resp:
        stats = json.loads(resp.read())
    assert stats["reconstruct"]["requests"] >= 3


def test_server_concurrent_clients_coalesce(server):
    """Many parallel batch-1 clients should share device batches."""
    base, vs = server
    before = vs.stats()["classify"]
    body = _npz_body(images=_images(1, seed=9))
    errors = []

    def hit():
        try:
            status, _, _ = _post(base + "/v1/classify", body)
            assert status == 200
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=hit) for _ in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    after = vs.stats()["classify"]
    new_reqs = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_reqs == 12
    assert new_batches < 12  # coalescing actually happened


def test_server_amplify(server):
    base, _ = server
    status, _, body = _post(
        base + "/v1/amplify?multipliers=0,2&top_k_concepts=2",
        _npz_body(images=_images(1, seed=10)))
    assert status == 200
    data = np.load(io.BytesIO(body))
    assert data["amplified_u8"].shape == (2, IMG, IMG, 3)
    assert data["probas_best"].shape == (2,)


def test_server_bad_requests(server):
    base, _ = server
    for url, body, ctype in [
        (base + "/v1/classify", b"not an npz", "application/octet-stream"),
        (base + "/v1/classify", b"{}", "application/json"),
        (base + "/v1/amplify", _npz_body(images=_images(2)), None),
    ]:
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": ctype or "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope", timeout=10)
    assert e.value.code == 404


def test_decode_images_normalizes_float01():
    imgs = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
    out = _decode_images(_npz_body(images=imgs), "application/octet-stream")
    assert out.dtype == np.uint8 and out.max() <= 255


# ------------------------------ AOT export -------------------------------- #


def test_export_roundtrip(engine, models, tmp_path):
    path = str(tmp_path / "artifact")
    manifest = export_serving(models, path, batch_size=4)
    assert set(manifest["endpoints"]) == {"classify", "reconstruct", "explain"}

    exported = load_exported(path)
    imgs = _images(6, seed=11)  # exercises chunk + pad through the artifact
    ref = engine.classify(imgs)
    out = exported.classify(imgs)
    np.testing.assert_allclose(out["logits"], ref["logits"], rtol=1e-5,
                               atol=1e-5)
    rec_ref = engine.reconstruct(imgs[:2])
    rec = exported.reconstruct(imgs[:2])
    # u8 quantization: allow off-by-one from float rounding differences.
    assert np.abs(rec["reconstruction_u8"].astype(int)
                  - rec_ref["reconstruction_u8"].astype(int)).max() <= 1


def test_export_served_over_http(models, tmp_path):
    """A sealed artifact drives the same HTTP server (amplify refuses)."""
    path = str(tmp_path / "artifact2")
    export_serving(models, path, batch_size=2)
    eng = load_exported(path)
    assert eng.compute_dtype == "float32"  # from the manifest
    vs = VisCoINServer(eng, max_delay_ms=1.0)
    httpd = vs.make_server(port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, _, body = _post(base + "/v1/classify",
                                _npz_body(images=_images(1, seed=12)))
        assert status == 200 and len(json.loads(body)["preds"]) == 1
        req = urllib.request.Request(
            base + "/v1/amplify", data=_npz_body(images=_images(1)),
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
        vs.close()


def test_export_roundtrip_bfloat16(models, tmp_path):
    """bf16 artifacts must load (npz degrades ml_dtypes bfloat16 to raw void
    unless the saver upcasts — the CLI default is bfloat16)."""
    path = str(tmp_path / "artifact_bf16")
    export_serving(models, path, batch_size=4, compute_dtype="bfloat16")
    eng = load_exported(path)
    assert eng.compute_dtype == "bfloat16"
    out = eng.classify(_images(2, seed=13))
    assert out["logits"].shape == (2, NC)
    assert np.isfinite(out["logits"]).all()
    # Equality with a live bf16 engine on the same weights.
    live = InferenceEngine(models, batch_size=4, compute_dtype="bfloat16")
    np.testing.assert_allclose(out["logits"],
                               live.classify(_images(2, seed=13))["logits"],
                               rtol=1e-3, atol=1e-3)


def test_engine_empty_batch_raises(engine):
    imgs = np.zeros((0, IMG, IMG, 3), np.uint8)
    with pytest.raises(ValueError, match="empty"):
        engine.classify(imgs)


def test_server_empty_batch_and_bad_params_400(server):
    base, _ = server
    for url, body in [
        (base + "/v1/classify",
         _npz_body(images=np.zeros((0, IMG, IMG, 3), np.uint8))),
        (base + "/v1/classify?top_k=abc", _npz_body(images=_images(1))),
        (base + "/v1/amplify?multipliers=x", _npz_body(images=_images(1))),
    ]:
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": "application/octet-stream"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400


def test_stats_snapshot_concurrent_with_appends():
    """snapshot() must not race the worker's latency appends."""
    mb = MicroBatcher(lambda items: items, max_batch=1, max_delay_ms=0)
    try:
        stop = threading.Event()
        errors = []

        def reader():
            while not stop.is_set():
                try:
                    mb.stats.snapshot()
                except RuntimeError as e:  # "deque mutated during iteration"
                    errors.append(e)
                    return

        t = threading.Thread(target=reader)
        t.start()
        futs = [mb.submit(i) for i in range(3000)]
        for f in futs:
            f.result(timeout=30)
        stop.set()
        t.join(timeout=5)
        assert not errors
    finally:
        mb.close()


def test_cli_registers_serving_commands():
    from main import main

    assert {"serve", "export-serving"} <= set(main.commands)
    for name in ("serve", "export-serving"):
        runner = __import__("click.testing", fromlist=["CliRunner"]).CliRunner()
        res = runner.invoke(main.commands[name], ["--help"])
        assert res.exit_code == 0, res.output


def test_engine_mesh_matches_single_device(models):
    """A data-parallel serving engine returns the single-device results."""
    from viscoin_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    single = InferenceEngine(models, batch_size=8)
    sharded = InferenceEngine(models, batch_size=8, mesh=mesh)
    imgs = _images(8, seed=20)
    ref, out = single.classify(imgs), sharded.classify(imgs)
    np.testing.assert_allclose(out["logits"], ref["logits"], rtol=1e-4,
                               atol=1e-5)
    rec_ref = single.reconstruct(imgs)
    rec = sharded.reconstruct(imgs)
    assert np.abs(rec["reconstruction_u8"].astype(int)
                  - rec_ref["reconstruction_u8"].astype(int)).max() <= 1

    with pytest.raises(ValueError, match="divide"):
        InferenceEngine(models, batch_size=6, mesh=mesh)


def test_cli_serve_refuses_sealed_flags_with_artifact(tmp_path):
    """--batch-size/--compute-dtype/--data-parallel are fixed by the artifact
    manifest; passing them with --from-artifact is a UsageError, not a silent
    mismatch."""
    from click.testing import CliRunner

    from main import main

    runner = CliRunner()
    res = runner.invoke(main.commands["serve"],
                        ["--from-artifact", str(tmp_path), "--batch-size", "64"])
    assert res.exit_code != 0
    assert "--batch-size" in res.output and "from-artifact" in res.output
    # default values of the sealed flags are fine (the artifact wins)
    res = runner.invoke(main.commands["serve"],
                        ["--from-artifact", str(tmp_path / "missing")])
    assert "--batch-size" not in res.output


# ------------------------------- explain --------------------------------- #


def test_engine_explain_matches_offline_gradcam(engine, models):
    """The serving explain endpoint is the online form of the
    concept-heatmaps CLI: same taps, same GradCAM math — given the same
    explained class (the explainer's argmax), heatmaps must agree with
    utils.gradcam.concept_extractor_gradcams exactly."""
    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.utils.gradcam import concept_extractor_gradcams

    imgs = _images(3, seed=21)
    out = engine.explain(imgs)
    assert out["preds"].shape == (3,)
    for i in range(1, 6):
        hm = out[f"heatmap_conv{i}"]
        assert hm.shape[0] == 3 and hm.ndim == 3
        assert np.isfinite(hm).all() and hm.min() >= 0.0 and hm.max() <= 1.0

    x = device_preprocess(jnp.asarray(imgs))
    ref_maps, ref_logits = concept_extractor_gradcams(
        models, images=x, labels=jnp.asarray(out["expl_preds"]))
    np.testing.assert_allclose(out["expl_logits"], ref_logits,
                               rtol=1e-4, atol=1e-4)
    for name, ref in ref_maps.items():
        np.testing.assert_allclose(out[f"heatmap_{name}"], ref,
                                   rtol=1e-4, atol=1e-4)


def test_engine_explain_padding_invariance(engine):
    """Padding rows must not leak into real heatmaps (the mean-reduced CE
    scales every sample's tap gradient uniformly, and the per-sample min-max
    normalization cancels that scale)."""
    imgs = _images(3, seed=22)
    batched = engine.explain(imgs)
    for i in range(3):
        single = engine.explain(imgs[i])
        np.testing.assert_allclose(batched["heatmap_conv5"][i],
                                   single["heatmap_conv5"][0],
                                   rtol=1e-4, atol=1e-5)
        assert batched["expl_preds"][i] == single["expl_preds"][0]


def test_server_explain_npz(server):
    base, _ = server
    buf = io.BytesIO()
    np.savez(buf, images=_images(2, seed=23))
    status, ctype, body = _post(base + "/v1/explain?top_k=3", buf.getvalue())
    assert status == 200 and ctype == "application/octet-stream"
    data = np.load(io.BytesIO(body))
    assert set(data.files) >= {"preds", "expl_preds", "top_concepts",
                               "top_concept_activations"} | {
                               f"heatmap_conv{i}" for i in range(1, 6)}
    assert data["top_concepts"].shape == (2, 3)
    assert data["heatmap_conv1"].shape[0] == 2


def test_export_explain_roundtrip(engine, models, tmp_path):
    """The sealed artifact carries the explain program (a traced backward)
    and reproduces the live engine's heatmaps."""
    path = str(tmp_path / "artifact_explain")
    export_serving(models, path, batch_size=2)
    exported = load_exported(path)
    imgs = _images(3, seed=24)  # chunk + pad through the artifact
    ref = engine.explain(imgs)
    out = exported.explain(imgs)
    np.testing.assert_allclose(out["heatmap_conv5"], ref["heatmap_conv5"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out["expl_preds"], ref["expl_preds"])


def test_server_explain_unavailable_in_partial_artifact(models, tmp_path):
    """An artifact exported without `explain` serves 400 on /v1/explain, not
    a worker crash."""
    path = str(tmp_path / "artifact_partial")
    export_serving(models, path, batch_size=2,
                   endpoints=("classify", "reconstruct"))
    eng = load_exported(path)
    vs = VisCoINServer(eng, max_delay_ms=1.0)
    httpd = vs.make_server(port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        buf = io.BytesIO()
        np.savez(buf, images=_images(1, seed=25))
        try:
            _post(base + "/v1/explain", buf.getvalue())
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "explain" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
        vs.close()
