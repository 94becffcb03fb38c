"""DP-scaling evidence (BASELINE.md's ≥384 img/s composition): the compiled
2-device data-parallel train step must actually contain the gradient
all-reduce the arithmetic bounds — the scaling claim rests on (measured
per-chip rate) × (shard-invariant step) × (bounded all-reduce cost), and this
test pins the middle term's collective structure so a sharding regression
(e.g. an accidentally-replicated batch axis, or grads reduced twice) is
caught on CPU.

Uses the toy geometry (the collectives' structure is geometry-independent;
scripts/dp_scaling.py computes the flagship byte volume for BASELINE.md).
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import dp_scaling  # noqa: E402


@pytest.fixture(scope="module")
def hlo_text():
    return dp_scaling.compiled_dp_step_hlo(toy=True)


def _toy_trainable_bytes() -> int:
    import jax.numpy as jnp

    models, _, img = dp_scaling.toy_setup()

    def init(rng):
        x = jnp.zeros((1, img, img, 3), jnp.float32)
        cvars = models.classifier.init(rng, x, train=False)
        _, hidden = models.classifier.apply(cvars, x, train=False)
        psi = models.concept_extractor.init(rng, tuple(hidden[-3:]))["params"]
        phi, phi_prime = models.concept_extractor.apply(
            {"params": psi}, tuple(hidden[-3:]))
        theta = models.explainer.init(rng, phi)["params"]
        gan = models.gan.init({"params": rng}, phi, phi_prime,
                              noise_mode="const")
        return {"psi": psi, "theta": theta,
                "mapping": gan["params"]["mapping"]}

    shapes = jax.eval_shape(init, jax.random.PRNGKey(0))
    _, nbytes = dp_scaling.tree_bytes(shapes)
    return nbytes


def test_dp_step_allreduces_exactly_the_gradients(hlo_text):
    """The optimized HLO of the dp step contains all-reduce collectives whose
    total volume covers every trainable gradient exactly once (XLA's
    all-reduce combiner may merge them into fewer ops, and adds O(scalar)
    metric reductions on top — bounded here by 4 KB of slack)."""
    colls = dp_scaling.collective_bytes(hlo_text)
    assert "all-reduce" in colls, f"no all-reduce in the dp step: {colls}"
    grad_bytes = _toy_trainable_bytes()
    got = colls["all-reduce"]["bytes"]
    # every gradient reduced at least once ...
    assert got >= grad_bytes, (
        f"all-reduce volume {got} B < trainable grads {grad_bytes} B — "
        "some gradients are not being reduced over the data axis")
    # ... and none reduced twice (plus scalar metrics/loss reductions)
    assert got <= grad_bytes + 4096, (
        f"all-reduce volume {got} B >> trainable grads {grad_bytes} B — "
        "unexpected extra collective traffic in the step")


def test_dp_step_no_unexpected_heavy_collectives(hlo_text):
    """Parameters are replicated and the batch is sharded: there is no reason
    for heavy all-gather / reduce-scatter traffic in the 1-D dp step (GSPMD
    resorting to them usually means a sharding got lost mid-graph)."""
    colls = dp_scaling.collective_bytes(hlo_text)
    for kind in ("all-gather", "reduce-scatter"):
        nbytes = colls.get(kind, {}).get("bytes", 0)
        assert nbytes < 1 << 20, (
            f"{kind} moves {nbytes} B in the dp step — a sharding is being "
            "reconstructed mid-graph")


def test_scaling_arithmetic_clears_north_star():
    """The closing arithmetic of BASELINE.md: the flagship trainable set's
    ring all-reduce on 2 chips leaves ≥384 img/s even fully serialized."""
    shapes = dp_scaling.flagship_trainable_shapes()
    n, volume = dp_scaling.tree_bytes(shapes)
    assert n == 96_074_952, f"flagship trainable param count drifted: {n:,}"
    step_s = dp_scaling.BATCH_PER_CHIP / dp_scaling.MEASURED_IMG_PER_S
    t_ar = dp_scaling.ring_allreduce_seconds(
        volume, 2, dp_scaling.ICI_ONE_WAY_BYTES_PER_S)
    imgs = 2 * dp_scaling.BATCH_PER_CHIP / (step_s + t_ar)
    assert imgs >= 384, (imgs, t_ar)
    # and even over a 100 Gbps-class DCN hop
    t_dcn = dp_scaling.ring_allreduce_seconds(
        volume, 2, dp_scaling.DCN_ONE_WAY_BYTES_PER_S)
    assert 2 * dp_scaling.BATCH_PER_CHIP / (step_s + t_dcn) >= 384
    np.testing.assert_allclose(volume / 1e6, 384.3, atol=0.1)
