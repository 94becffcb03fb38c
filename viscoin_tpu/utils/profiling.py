"""Tracing / profiling / debugging helpers.

The reference's observability is vestigial (one torch profiler scope,
viscoin/models/gan.py:214, plus tqdm — SURVEY.md §5). Here:

  * :func:`trace` — jax.profiler trace context (Perfetto/XProf-compatible),
    degrading gracefully on backends that cannot profile (remote-attached
    devices).
  * named scopes: the train step annotates its phases with
    ``jax.named_scope`` so traces and HLO dumps are readable.
  * :func:`enable_nan_debugging` — jax.debug_nans mode (the JAX-native
    equivalent of a sanitizer pass for this single-controller runtime).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace to ``log_dir`` (view with XProf/TensorBoard);
    a no-op (with a warning) if the backend cannot profile."""
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"WARNING: profiler unavailable ({type(e).__name__}); "
              "continuing without a trace")
        yield


def enable_nan_debugging():
    """Fail fast on NaNs in any jitted computation (jax.config.debug_nans)."""
    jax.config.update("jax_debug_nans", True)


def annotate(name: str):
    """Named scope for readable traces/HLO."""
    return jax.named_scope(name)
