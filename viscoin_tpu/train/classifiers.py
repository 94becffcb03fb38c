"""Classifier training (reference: viscoin/training/classifiers.py).

Adam + StepLR(30, 0.1), per-epoch test, best-accuracy model kept; jsonl
logging with the reference's key schema. The train step is one jitted
function including device-side preprocessing and BatchNorm running-stat
updates.

NOTE: the reference logs the *test* accuracy under ``train_accuracy`` (its
train accuracy is overwritten at classifiers.py:100); we log the actual
train-epoch accuracy — same keys, corrected semantics.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from viscoin_tpu.data.transforms import device_preprocess
from viscoin_tpu.eval.classifiers import test_classifier
from viscoin_tpu.utils.dataclasses import IgnoreNone
from viscoin_tpu.utils.logging import get_logger


@dataclass
class ClassifierTrainingParams(IgnoreNone):
    epochs: int = 90
    learning_rate: float = 0.001
    batch_size: int = 32
    # "adam" (reference code, training/classifiers.py:55) or "sgd": the
    # reference README documents an SGD recipe (lr 0.1, ×0.1 every 30 epochs,
    # 90 epochs — Stanford-Cars, README.md:203) that its hardcoded-Adam code
    # cannot run; both ride the same StepLR(30, 0.1) schedule.
    optimizer: str = "adam"
    momentum: float = 0.9  # SGD only (the standard ResNet fine-tune setting)
    # Mixed precision: params/images cast to ``compute_dtype`` inside the
    # loss (bf16 convs on the MXU), fp32 Adam masters, fp32 loss/accuracy
    # reductions. BatchNorm is safe under the cast: flax computes batch
    # statistics "always at least float32" (flax _compute_stats), and the
    # running stats stay fp32 because the EMA update promotes. The per-epoch
    # eval always runs fp32 on the fp32 masters (metric parity). "float32"
    # (the default here) is bit-identical to the pre-mixed-precision step.
    compute_dtype: str = "float32"


class ClassifierState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def make_classifier_train_step(classifier, tx, mesh=None,
                               compute_dtype: str = "float32"):
    """One jitted train step. With ``mesh``, the batch shards over the
    ``data`` axis (2-D meshes additionally shard the images' H axis over
    ``model``) and the state replicates — GSPMD all-reduces the gradients
    AND the BatchNorm batch statistics (jnp.mean over a sharded axis has
    global semantics under GSPMD, so the running stats match the
    single-device step exactly).

    ``compute_dtype="bfloat16"``: params + images cast at the loss boundary
    (grads flow through the cast back to the fp32 Adam masters); BatchNorm
    batch stats are fp32 regardless (flax forces float32 reductions), so the
    running statistics keep full precision."""
    from viscoin_tpu.train.viscoin import make_cast

    dt = jnp.dtype(compute_dtype)
    f32 = jnp.float32
    cast = make_cast(compute_dtype)

    def step(state: ClassifierState, images_u8, labels, rng):
        flips = jax.random.bernoulli(rng, 0.5, (images_u8.shape[0],))
        x = device_preprocess(images_u8, flips).astype(dt)

        def loss_fn(params):
            (logits, _), updates = classifier.apply(
                {"params": cast(params), "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            logits = logits.astype(f32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
            correct = jnp.sum(jnp.argmax(logits, axis=1) == labels)
            return loss, (updates["batch_stats"], correct)

        (loss, (batch_stats, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=batch_stats,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, loss, correct

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscoin_tpu.parallel.mesh import image_spec

    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(rep, NamedSharding(mesh, image_spec(mesh)),
                      NamedSharding(mesh, P("data")), rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0,),
    )


def train_classifier(classifier, variables, train_loader, test_loader,
                     params: ClassifierTrainingParams, seed: int = 0,
                     mesh=None):
    """Train and return the variables of the best-test-accuracy model
    (reference: training/classifiers.py:32-120). With ``mesh``, every
    batch (train step AND per-epoch eval) shards over the ``data`` axis —
    the classifier trainer scales like the ensemble loop (new capability,
    the reference is single-GPU)."""
    logger = get_logger()
    # Fail fast: the ragged-batch skip in the epoch loop drops EVERY batch
    # when the loader's batch size differs — all epochs would silently be
    # no-ops and the init weights would come back as "best" (same guard as
    # train_viscoin).
    loader_bs = getattr(train_loader, "batch_size", params.batch_size)
    if loader_bs != params.batch_size:
        raise ValueError(f"train_loader.batch_size={loader_bs} != "
                         f"params.batch_size={params.batch_size}")
    if mesh is not None and params.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch_size={params.batch_size} does not divide over the mesh's "
            f"{mesh.shape['data']}-way 'data' axis — the first device_put "
            "would otherwise die mid-epoch with an XLA sharding error")
    # StepLR(step_size=30, gamma=0.1) on epochs → piecewise-constant on steps.
    steps_per_epoch = max(1, len(train_loader))
    schedule = optax.piecewise_constant_schedule(
        params.learning_rate,
        {30 * steps_per_epoch: 0.1, 60 * steps_per_epoch: 0.1},
    )
    if params.optimizer == "adam":
        tx = optax.adam(schedule)
    elif params.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=params.momentum)
    else:
        raise ValueError(f"optimizer={params.optimizer!r}: expected adam|sgd")
    state = ClassifierState(
        params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      variables["params"]),
        batch_stats=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                           variables["batch_stats"]),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_classifier_train_step(classifier, tx, mesh=mesh,
                                         compute_dtype=params.compute_dtype)
    rng = jax.random.PRNGKey(seed)
    if mesh is not None:
        from viscoin_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from viscoin_tpu.parallel.mesh import image_spec

        img_sh = NamedSharding(mesh, image_spec(mesh))
        lbl_sh = NamedSharding(mesh, P("data"))

    best_accuracy = 0.0
    # Host copy: the jitted step donates the state, so aliasing the initial
    # device buffers here would leave `best` pointing at deleted arrays if
    # no epoch ever beats accuracy 0.0.
    best = jax.tree_util.tree_map(
        np.asarray, {"params": state.params, "batch_stats": state.batch_stats})

    for epoch in range(params.epochs):
        total_correct, total_loss, total_samples, n_batches = 0, 0.0, 0, 0
        for images, labels in train_loader:
            if images.shape[0] != params.batch_size:
                continue  # drop ragged last batch (shape stability)
            rng, k = jax.random.split(rng)
            images = jnp.asarray(images)
            labels = jnp.asarray(labels.astype(np.int32))
            if mesh is not None:
                # Place with the step's exact specs (jit refuses to reshard
                # committed arrays).
                images = jax.device_put(images, img_sh)
                labels = jax.device_put(labels, lbl_sh)
            state, loss, correct = step_fn(state, images, labels, k)
            total_correct += int(correct)
            total_loss += float(loss)
            total_samples += images.shape[0]
            n_batches += 1

        train_accuracy = total_correct / max(total_samples, 1)
        batch_mean_loss = total_loss / max(n_batches, 1)

        test_vars = {"params": state.params, "batch_stats": state.batch_stats}
        accuracy, mean_loss = test_classifier(classifier, test_vars, test_loader,
                                              verbose=False, mesh=mesh)
        if accuracy > best_accuracy:
            best_accuracy = accuracy
            best = jax.tree_util.tree_map(np.asarray, test_vars)

        logger.info(json.dumps({
            "train_loss": batch_mean_loss,
            "train_accuracy": train_accuracy,
            "test_loss": mean_loss,
            "test_accuracy": accuracy,
        }))

    print(f"Best test accuracy: {best_accuracy:.4f}")
    return best, best_accuracy
