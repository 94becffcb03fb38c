"""Result dataclasses + plotting (reference: viscoin/utils/types.py).

The field names define the jsonl schema (train_*/test_* keys) — kept
identical so logs from the reference and this framework interchange."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

Mode = Literal["train", "test"]


@dataclass
class TestingResults:
    """VisCoIN testing results (reference: types.py:17-82)."""

    acc_loss: float
    cr_loss: float
    of_loss: float
    lp_loss: float
    rec_loss_l1: float
    rec_loss_l2: float
    preds_overlap: float
    correct_preds: float
    correct_expl_preds: float
    fid_score: float | None = None

    @staticmethod
    def plot_losses(results: list["TestingResults"]):
        import matplotlib.pyplot as plt

        for key in ["acc_loss", "cr_loss", "of_loss", "lp_loss", "rec_loss_l1", "rec_loss_l2"]:
            plt.plot([getattr(r, key) for r in results], label=key)
        plt.title("Testing Losses")
        plt.ylabel("Loss")
        plt.xlabel("per 20,000 batches")
        plt.legend()
        plt.show()

    @staticmethod
    def plot_preds_overlap(results: list["TestingResults"]):
        import matplotlib.pyplot as plt

        for key in ["preds_overlap", "correct_preds", "correct_expl_preds"]:
            plt.plot([getattr(r, key) for r in results], label=key)
        plt.title("Prediction Overlaps")
        plt.ylabel("Overlap")
        plt.xlabel("per 20,000 batches")
        plt.legend()
        plt.show()


@dataclass
class TrainingResults:
    """VisCoIN ensemble training losses (reference: types.py:85-130)."""

    acc_loss: float
    cr_loss: float
    of_loss: float
    ortho_loss: float
    rec_loss: float
    gan_loss: float
    inter_loss: float

    @staticmethod
    def plot_losses(results: list["TrainingResults"]):
        import matplotlib.pyplot as plt

        for key in ["acc_loss", "cr_loss", "of_loss", "ortho_loss",
                    "rec_loss", "gan_loss", "inter_loss"]:
            plt.plot([getattr(r, key) for r in results], label=key)
        plt.title("Training Losses")
        plt.ylabel("Loss")
        plt.xlabel("per 20,000 batches")
        plt.legend()
        plt.show()
