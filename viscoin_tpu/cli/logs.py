"""`logs` command (reference: viscoin/cli/logs.py): parse jsonl training logs
and plot the loss/metric curves. The schema is byte-compatible with the
reference, so logs from either implementation plot identically."""

from __future__ import annotations

import json

import click

from viscoin_tpu.utils.types import TestingResults, TrainingResults


def _plot_gan_logs(records: list[dict]) -> None:
    """Loss/metric curves for `train gan` jsonl logs (a capability extension:
    the reference has no GAN-training logs — it trains GANs externally)."""
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    # Records are heterogeneous: loss records every 100 it, fid-only records
    # on the --fid-every cadence — select per key instead of assuming a
    # rectangular schema.
    for key in ("g_loss", "d_loss"):
        pts = [(r["iteration"], r[key]) for r in records if key in r]
        ax1.plot([p[0] for p in pts], [p[1] for p in pts], label=key)
    ax1.set_xlabel("iteration"), ax1.legend(), ax1.set_title("adversarial losses")
    for key in ("r1", "pl_lengths", "pl_mean", "ada_p", "fid"):
        if any(key in r for r in records):
            pts = [(r["iteration"], r[key]) for r in records if key in r]
            ax2.plot([p[0] for p in pts], [p[1] for p in pts], label=key)
    ax2.set_xlabel("iteration"), ax2.legend(), ax2.set_title("regularizers / fid")
    plt.tight_layout()
    plt.show()


def _plot_scalar_logs(records: list[dict], title: str) -> None:
    """Generic per-epoch scalar curves for the classifier / concept2clip
    jsonl schemas (the reference's logs command handles only the viscoin
    schema and crashes on its own other logs; here every schema plots)."""
    import matplotlib.pyplot as plt

    # Union of keys across records (not records[0]'s): epochs may log
    # different key sets, and a missing key just skips that point below.
    keys: list[str] = []
    for r in records:
        keys += [k for k in r
                 if k not in keys and isinstance(r[k], (int, float))]
    fig, ax = plt.subplots(figsize=(8, 4))
    for key in keys:
        pts = [(i, r[key]) for i, r in enumerate(records) if key in r]
        ax.plot([p[0] for p in pts], [p[1] for p in pts], label=key)
    ax.set_xlabel("epoch"), ax.legend(), ax.set_title(title)
    plt.tight_layout()
    plt.show()


def _read_records(logs_path: str) -> list[dict]:
    """Parse a jsonl log, skipping blank lines and tolerating a truncated
    final line (a run killed mid-write leaves one); mid-file corruption
    still raises with the line number."""
    lines: list[tuple[int, str]] = []
    with open(logs_path) as f:
        for i, line in enumerate(f, 1):
            if line.strip():
                lines.append((i, line))
    records = []
    for pos, (i, line) in enumerate(lines):
        try:
            records.append(json.loads(line))
        except json.JSONDecodeError:
            if pos == len(lines) - 1:
                continue  # partial last line from a killed run
            raise ValueError(f"{logs_path}:{i}: unparseable jsonl line")
    return records


@click.command()
@click.option("--logs-path", help="The path to the logs file", required=True, type=str)
def logs(logs_path: str):
    """Parse a viscoin training jsonl log file and plot the losses and metrics."""
    training_results: list[TrainingResults] = []
    testing_results: list[TestingResults] = []

    records = _read_records(logs_path)
    # Schema sniffs scan ALL records, not records[0]: the first record of a
    # run is cadence-dependent (a resumed `train gan` with a small
    # --fid-every writes a fid-only record before the first %100 loss
    # record), so keying off records[0] misroutes real logs.
    if any("g_loss" in r or "fid" in r for r in records):  # `train gan`
        _plot_gan_logs(records)
        return
    if any("matching_accuracy" in r  # concept2clip schema
           or "train_accuracy" in r for r in records):  # classifier schema
        _plot_scalar_logs(records, "training curves")
        return

    for data in records:
        train_kwargs, test_kwargs = {}, {}
        for key, value in data.items():
            # NOTE: the reference slices key[6:] for BOTH prefixes
            # (cli/logs.py:33-35), which mangles "test_*" keys ("test_" is
            # 5 chars) and crashes its own command on viscoin logs —
            # fixed here by stripping the actual prefix.
            if key.startswith("train_"):
                train_kwargs[key[len("train_"):]] = value
            elif key.startswith("test_"):
                test_kwargs[key[len("test_"):]] = value
            else:
                raise ValueError(f"Unknown key: {key}")
        training_results.append(TrainingResults(**train_kwargs))
        testing_results.append(TestingResults(**test_kwargs))

    TrainingResults.plot_losses(training_results)
    TestingResults.plot_losses(testing_results)
    TestingResults.plot_preds_overlap(testing_results)
