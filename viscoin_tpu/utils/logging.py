"""jsonl metric logging (reference: viscoin/utils/logging.py — byte-compatible
log contract so the `logs` CLI works on files from either implementation).

Divergence: the reference configures the ROOT logger (logging.basicConfig),
which would interleave third-party INFO records (orbax, absl) into the jsonl
file in this stack; we scope a dedicated non-propagating logger instead —
the file contents stay pure jsonl."""

import logging

_LOGGER_NAME = "viscoin_tpu.metrics"


def get_logger():
    """Returns the metrics logger."""
    return logging.getLogger(_LOGGER_NAME)


def configure_score_logging(log_path: str):
    """Log bare INFO messages to a file, overwriting it (reference behavior:
    filemode='w', format='%(message)s').

    Multi-host: only process 0 attaches the file handler — every process
    calls this at subcommand start, and N processes opening the SAME
    relative path with mode='w' would truncate/interleave each other's
    records (a slow-starting rank would erase rank 0's first records).
    Non-zero ranks keep a handler-less logger, so their ``.info`` calls are
    dropped instead of racing."""
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for handler in list(logger.handlers):
        logger.removeHandler(handler)
        handler.close()
    import jax

    if jax.process_index() != 0:
        return
    handler = logging.FileHandler(log_path, mode="w")
    handler.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(handler)
