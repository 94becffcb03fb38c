"""Serving layer: production inference for the VisCoIN ensemble.

New capability — the reference has no serving story (SURVEY.md §1: "no
scheduler, no serving layer"; its interpretability inference is the offline
`amplify` CLI). TPU-first design:

  * :class:`~viscoin_tpu.serve.engine.InferenceEngine` — every endpoint is ONE
    jitted program at a fixed batch shape (static shapes: no recompiles ever
    after warmup), padding + valid-masking partial batches.
  * :class:`~viscoin_tpu.serve.batching.MicroBatcher` — concurrent requests
    coalesce into full device batches (TPUs amortize; a batch-1 dispatch
    wastes the MXU), with a bounded batching delay.
  * :mod:`~viscoin_tpu.serve.server` — a dependency-free threaded HTTP server
    exposing classify / explain / reconstruct / amplify.
  * :mod:`~viscoin_tpu.serve.export` — AOT deployment artifacts via
    ``jax.export``: sealed StableHLO + weights, loadable without any model
    code (version-stable serving).
"""

from viscoin_tpu.serve.batching import BatcherStats, MicroBatcher
from viscoin_tpu.serve.engine import InferenceEngine
from viscoin_tpu.serve.export import export_serving, load_exported

__all__ = [
    "BatcherStats",
    "InferenceEngine",
    "MicroBatcher",
    "export_serving",
    "load_exported",
]
