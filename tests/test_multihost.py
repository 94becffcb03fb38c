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

import pytest

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
    for key in ("acc_loss", "lp_loss", "fid", "gan_g_loss", "gan_d_loss"):
        assert results[0][key] == results[1][key], (key, results)

    # Checkpoints + jsonl logs are process-0-only (per-rank dirs simulate a
    # non-shared filesystem).
    assert results[0]["wrote_ckpt"] and not results[1]["wrote_ckpt"]
    assert results[0]["n_log_lines"] >= 2  # evals at iterations 0 and 2
    assert results[1]["n_log_lines"] == 0

    # The faithfulness probe ran once, on rank 0.
    assert "Faithfullness stats" in outs[0]
    assert "Faithfullness stats" not in outs[1]
