"""Real 2-process multi-host test (CPU, jax.distributed + gloo): spawns two
worker processes (tests/multihost_worker.py) that run the genuinely multi-host
code paths — per-host sharded DataLoaders reassembled with global_shard_batch
(jax.make_array_from_process_local_data), the full train_viscoin loop with
multi-host in-loop eval and device-reduced FID moments, process-0-only
checkpoint/log writes, and the process-0-only faithfulness probe.

The reference has no distributed capability at all (SURVEY.md §2.4); this is
the new-capability scaling layer, exercised end to end so the only untested
path left is the physical DCN fabric."""

import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"

    results = {}
    for pid, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK ")]
        assert lines, f"rank {pid} produced no result line:\n{out[-4000:]}"
        results[pid] = json.loads(lines[0][len("MULTIHOST_OK "):])

    # Replicated eval metrics are identical on every host (GSPMD-reduced) —
    # likewise the GAN trainer's replicated losses.
    for key in ("acc_loss", "lp_loss", "fid", "gan_g_loss", "gan_d_loss",
                "eval0_acc_loss", "eval0_lp_loss", "eval0_fid"):
        assert results[0][key] == results[1][key], (key, results)

    # Ragged-tail exactness: the workers evaluated a deterministic
    # PRNGKey(0)-initialized bundle over a 6-sample dataset through a
    # batch-4 pad_final SHARDED loader; recompute the same eval here,
    # single-device and unsharded — equality proves the multi-host eval
    # includes the tail samples and matches the exact averages.
    ref = _reference_eval0()
    import numpy as np

    for key in ("acc_loss", "lp_loss", "correct_preds", "fid"):
        np.testing.assert_allclose(
            results[0][f"eval0_{key}"], ref[key], rtol=2e-4, atol=2e-4,
            err_msg=f"multi-host padded eval diverges on {key}")

    # Checkpoints + jsonl logs are process-0-only (per-rank dirs simulate a
    # non-shared filesystem).
    assert results[0]["wrote_ckpt"] and not results[1]["wrote_ckpt"]
    assert results[0]["n_log_lines"] >= 2  # evals at iterations 0 and 2
    assert results[1]["n_log_lines"] == 0

    # The faithfulness probe ran once, on rank 0.
    assert "Faithfullness stats" in outs[0]
    assert "Faithfullness stats" not in outs[1]


def _reference_eval0():
    """The single-process, unsharded version of the workers' eval0."""
    import jax
    import jax.numpy as jnp

    from viscoin_tpu.data.datasets import SyntheticDataset
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.eval.viscoin import test_viscoin
    from viscoin_tpu.models.bundle import VisCoINModels, init_models
    from viscoin_tpu.models.concept_extractor import ConceptExtractor
    from viscoin_tpu.models.explainer import Explainer
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.models.stylegan import GeneratorAdapted

    IMG, NC, NK = 32, 4, 8
    models0 = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models0 = init_models(models0, jax.random.PRNGKey(0), image_size=IMG)
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]

    @jax.jit
    def fid_detector(images):
        m = jnp.mean(images, axis=(1, 2))
        return jnp.concatenate([m, jnp.std(images, axis=(1, 2, 3))[:, None]],
                               axis=1)

    test_ds = SyntheticDataset(n=6, n_classes=NC, image_size=IMG, mode="test")
    loader = DataLoader(test_ds, batch_size=4, shuffle=False, num_threads=0)
    res = test_viscoin(models0, lpips, lparams, loader, compute_fid=True,
                       fid_detector=fid_detector, verbose=False)
    return {"acc_loss": res.acc_loss, "lp_loss": res.lp_loss,
            "correct_preds": res.correct_preds, "fid": res.fid_score}
