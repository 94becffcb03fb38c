"""jsonl metric logging (reference: viscoin/utils/logging.py — byte-compatible
log contract so the `logs` CLI works on files from either implementation)."""

import logging


def get_logger():
    """Returns the current scope logger."""
    return logging.getLogger(__name__)


def configure_score_logging(log_path: str):
    """Log bare INFO messages to a file, overwriting it (reference behavior:
    filemode='w', format='%(message)s')."""
    logging.basicConfig(
        level=logging.INFO, filemode="w", format="%(message)s", filename=log_path, force=True
    )
