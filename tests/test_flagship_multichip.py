"""Flagship-geometry GSPMD shard-invariance (the strongest multi-chip
correctness evidence in the repo, moved here from the dryrun per VERDICT r4
item 2 — the driver's `dryrun_multichip` now runs only the toy + 2-D checks
within its timeout, and THIS test keeps the flagship check exercised by
`pytest tests/`).

One VisCoIN train step at the REAL flagship geometry — 256² images, 256
concepts, the StyleGAN2-ADA 'auto' 256² channel config (channel_base=16384,
the pretrained CUB GAN's), ResNet-50 at full depths, LPIPS-VGG at 256² —
through real GSPMD shardings on the virtual 8-device CPU mesh (conftest):

* 2-device data mesh: loss AND post-step params shard-invariant vs the
  1-device step on the same batch;
* (2, 2) (data, model) mesh: the full train step with the image H axis
  spatially sharded (conv halo exchanges through all five forwards and the
  backward) reproduces the 1-device loss;
* spatially-sharded 256² synthesis forward matches unsharded.

This is the correctness leg of the multi-chip ≥384 img/s composition
(BASELINE.md): per-chip rate is measured on hardware, scaling rides these
shardings. ~15 min single-core; deselect with ``-m 'not flagship'``.
"""

import os
import sys

import pytest

# The check lives next to the driver entry points at the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import flagship_multichip_check  # noqa: E402


@pytest.mark.flagship
def test_flagship_multichip_shard_invariance():
    flagship_multichip_check()
