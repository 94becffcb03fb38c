"""Integration test of the full train_viscoin outer loop (reference:
training/viscoin.py:84-295): eval cadence, jsonl logging, checkpointing,
faithfulness probe, and resume — on tiny models + synthetic data."""

import json
import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.data.datasets import SyntheticDataset
from viscoin_tpu.data.loader import DataLoader
from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.lpips import LPIPS
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import Generator, GeneratorAdapted
from viscoin_tpu.train.viscoin import VisCoINTrainingParams, train_viscoin

IMG, NC, NK = 32, 4, 8


@pytest.fixture(scope="module")
def tiny():
    models = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models = init_models(models, jax.random.PRNGKey(0), image_size=IMG)
    generator = Generator(z_dim=16, w_dim=32, img_resolution=IMG,
                          channel_base=256, channel_max=16, mapping_layers=2)
    gvars = generator.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 16)),
                           noise_mode="const")
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    return models, generator, gvars, lpips, lparams


def test_train_viscoin_loop(tiny, tmp_path):
    from viscoin_tpu.utils.logging import configure_score_logging

    models, generator, gvars, lpips, lparams = tiny
    log_path = str(tmp_path / "viscoin_4.jsonl")
    configure_score_logging(log_path)

    train_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="train")
    test_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=2, num_threads=0)
    test_loader = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)

    cfg = VisCoINTrainingParams(iterations=4, batch_size=2, cd_fid_iteration=-1)
    p_before = jax.tree_util.tree_map(np.copy, models.concept_params)

    out = train_viscoin(models, generator, gvars, lpips, lparams,
                        train_loader, test_loader, cfg,
                        checkpoint_dir=str(tmp_path),
                        eval_every=2, checkpoint_every=3, faithfulness_every=2)

    # params moved and were synced back into the bundle
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(p_before),
                                jax.tree_util.tree_leaves(out.concept_params)))
    assert moved

    # jsonl has the reference's train_/test_ key schema (iterations 0 and 2)
    logging.shutdown()
    lines = [json.loads(line) for line in open(log_path)]
    assert len(lines) == 2
    assert "train_acc_loss" in lines[0] and "test_lp_loss" in lines[0]
    assert "test_correct_expl_preds" in lines[0]

    # checkpoints written (it 0 and 3) + train state
    assert os.path.isdir(tmp_path / "viscoin0-1")
    assert os.path.isdir(tmp_path / "viscoin1-1")
    assert os.path.isdir(tmp_path / "train_state")


def test_train_viscoin_resume(tiny, tmp_path):
    models, generator, gvars, lpips, lparams = tiny
    train_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG, mode="train")
    test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=2, num_threads=0)
    test_loader = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)

    cfg = VisCoINTrainingParams(iterations=2, batch_size=2, cd_fid_iteration=-1)
    train_viscoin(models, generator, gvars, lpips, lparams,
                  train_loader, test_loader, cfg, checkpoint_dir=str(tmp_path),
                  eval_every=10, checkpoint_every=1, faithfulness_every=0)

    # resume: starts at the saved step (2 == iterations → no more steps run)
    out = train_viscoin(models, generator, gvars, lpips, lparams,
                        train_loader, test_loader, cfg,
                        checkpoint_dir=str(tmp_path), eval_every=10,
                        checkpoint_every=10, faithfulness_every=0,
                        resume_from=str(tmp_path / "train_state"))
    assert out is models


def test_train_viscoin_resume_deterministic(tiny, tmp_path):
    """Train 4 steps, 'kill', resume to 8 — the final params must be IDENTICAL
    to an unbroken 8-step run (per-step fold_in rng + (seed, epoch)-pure
    loader shuffle + loader fast-forward). The reference cannot resume at all
    (SURVEY.md §5)."""
    models, generator, gvars, lpips, lparams = tiny
    snapshot = jax.tree_util.tree_map(np.copy, (models.classifier_vars,
                                                models.concept_params,
                                                models.explainer_params,
                                                models.gan_vars))

    def restore_bundle():
        (models.classifier_vars, models.concept_params,
         models.explainer_params, models.gan_vars) = jax.tree_util.tree_map(
            np.copy, snapshot)

    def loaders():
        # full train-mode augmentation: crop geometry is keyed by
        # (seed, epoch, index), so even the random crops replay across resume
        train_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG, mode="test")
        return (DataLoader(train_ds, batch_size=2, num_threads=0, seed=7),
                DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0))

    def run(iterations, ckpt_dir, resume_from=None, checkpoint_every=100):
        os.makedirs(ckpt_dir, exist_ok=True)
        if resume_from is None:
            restore_bundle()
        tl, el = loaders()
        cfg = VisCoINTrainingParams(iterations=iterations, batch_size=2,
                                    cd_fid_iteration=-1)
        out = train_viscoin(models, generator, gvars, lpips, lparams, tl, el,
                            cfg, checkpoint_dir=ckpt_dir, eval_every=100,
                            checkpoint_every=checkpoint_every,
                            faithfulness_every=0, resume_from=resume_from)
        return jax.tree_util.tree_map(np.asarray, (out.concept_params,
                                                   out.explainer_params))

    unbroken = run(8, str(tmp_path / "a"))
    restore_bundle()
    run(4, str(tmp_path / "b"), checkpoint_every=3)  # saves state at i=3 (step 4)
    resumed = run(8, str(tmp_path / "b"),
                  resume_from=str(tmp_path / "b" / "train_state"))

    for a, b in zip(jax.tree_util.tree_leaves(unbroken),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_train_viscoin_resume_deterministic_mesh(tiny, tmp_path):
    """Resume on a data mesh: the restore must happen BEFORE replication
    (restore_train_state returns host numpy leaves; the mesh jit needs
    committed replicated state — on multi-host an implicit per-leaf
    device_put would run startup collectives, see parallel.mesh.replicate),
    and the resumed mesh run must replay the unbroken mesh run exactly."""
    from viscoin_tpu.parallel.mesh import make_mesh

    models, generator, gvars, lpips, lparams = tiny
    mesh = make_mesh(2)  # batch 2 → 1 row per device
    snapshot = jax.tree_util.tree_map(np.copy, (models.classifier_vars,
                                                models.concept_params,
                                                models.explainer_params,
                                                models.gan_vars))

    def restore_bundle():
        (models.classifier_vars, models.concept_params,
         models.explainer_params, models.gan_vars) = jax.tree_util.tree_map(
            np.copy, snapshot)

    def run(iterations, ckpt_dir, resume_from=None, checkpoint_every=100):
        os.makedirs(ckpt_dir, exist_ok=True)
        if resume_from is None:
            restore_bundle()
        train_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG,
                                   mode="test")
        tl = DataLoader(train_ds, batch_size=2, num_threads=0, seed=7)
        el = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)
        cfg = VisCoINTrainingParams(iterations=iterations, batch_size=2,
                                    cd_fid_iteration=-1)
        out = train_viscoin(models, generator, gvars, lpips, lparams, tl, el,
                            cfg, mesh=mesh, checkpoint_dir=ckpt_dir,
                            eval_every=100, checkpoint_every=checkpoint_every,
                            faithfulness_every=0, resume_from=resume_from)
        return jax.tree_util.tree_map(np.asarray, (out.concept_params,
                                                   out.explainer_params))

    unbroken = run(4, str(tmp_path / "a"))
    restore_bundle()
    run(2, str(tmp_path / "b"), checkpoint_every=1)  # saves state at i=1 (step 2)
    resumed = run(4, str(tmp_path / "b"),
                  resume_from=str(tmp_path / "b" / "train_state"))

    for a, b in zip(jax.tree_util.tree_leaves(unbroken),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_train_viscoin_rejects_mismatched_shard_world(tiny, tmp_path):
    """A shard=(rank, world) loader must match jax.process_count(): the
    world-4 loader yields batch_size//4 rows, which would otherwise spin the
    ragged-batch skip forever (single-process CI has process_count == 1)."""
    models, generator, gvars, lpips, lparams = tiny
    ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG)
    loader = DataLoader(ds, batch_size=4, num_threads=0, shard=(0, 4))
    cfg = VisCoINTrainingParams(iterations=1, batch_size=4)
    with pytest.raises(ValueError, match="shard world size"):
        train_viscoin(models, generator, gvars, lpips, lparams,
                      loader, loader, cfg, checkpoint_dir=str(tmp_path))


def test_train_viscoin_prefetch_deterministic(tiny, tmp_path):
    """prefetch>0 (background loader + device_put overlap, VERDICT r4 item 7)
    must be a pure latency optimization: identical final params to the
    synchronous path (one producer, FIFO order), and the timings dict gets
    the per-phase split the sustained bench reports."""
    models, generator, gvars, lpips, lparams = tiny
    snapshot = jax.tree_util.tree_map(np.copy, (models.classifier_vars,
                                                models.concept_params,
                                                models.explainer_params,
                                                models.gan_vars))

    def run(prefetch, timings=None):
        (models.classifier_vars, models.concept_params,
         models.explainer_params, models.gan_vars) = jax.tree_util.tree_map(
            np.copy, snapshot)
        train_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG,
                                   mode="test")
        tl = DataLoader(train_ds, batch_size=2, num_threads=0, seed=7)
        el = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)
        cfg = VisCoINTrainingParams(iterations=5, batch_size=2,
                                    cd_fid_iteration=-1)
        out = train_viscoin(models, generator, gvars, lpips, lparams, tl, el,
                            cfg, checkpoint_dir=str(tmp_path), eval_every=0,
                            checkpoint_every=0, faithfulness_every=0,
                            prefetch=prefetch, timings=timings)
        return jax.tree_util.tree_map(np.asarray, (out.concept_params,
                                                   out.explainer_params))

    timings = {}
    sync = run(0)
    pre = run(2, timings=timings)
    for a, b in zip(jax.tree_util.tree_leaves(sync),
                    jax.tree_util.tree_leaves(pre)):
        np.testing.assert_array_equal(a, b)
    assert timings["n_steps"] == 5 and timings["steps"] > 0


def test_train_viscoin_stop_after(tiny, tmp_path):
    """stop_after bounds THIS CALL's steps while keeping the configured
    horizon (the LR schedule — and compiled program — depend on
    cfg.iterations; the sustained bench runs the production program briefly).
    A resume from the stopped state continues to the same final params as an
    unbroken run."""
    models, generator, gvars, lpips, lparams = tiny
    snapshot = jax.tree_util.tree_map(np.copy, (models.classifier_vars,
                                                models.concept_params,
                                                models.explainer_params,
                                                models.gan_vars))

    def run(ckpt_dir, stop_after=None, resume_from=None, timings=None):
        if resume_from is None:
            (models.classifier_vars, models.concept_params,
             models.explainer_params, models.gan_vars) = jax.tree_util.tree_map(
                np.copy, snapshot)
        train_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG,
                                    mode="train")
        test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG,
                                   mode="test")
        tl = DataLoader(train_ds, batch_size=2, num_threads=0, seed=7)
        el = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)
        cfg = VisCoINTrainingParams(iterations=6, batch_size=2,
                                    cd_fid_iteration=-1)
        out = train_viscoin(models, generator, gvars, lpips, lparams, tl, el,
                            cfg, checkpoint_dir=str(ckpt_dir), eval_every=0,
                            checkpoint_every=5, faithfulness_every=0,
                            stop_after=stop_after, resume_from=resume_from,
                            timings=timings)
        return jax.tree_util.tree_map(np.asarray, (out.concept_params,
                                                   out.explainer_params))

    unbroken = run(tmp_path / "a")
    timings = {}
    run(tmp_path / "b", stop_after=5, timings=timings)  # state saved at i=5
    assert timings["n_steps"] == 5
    resumed = run(tmp_path / "b",
                  resume_from=str(tmp_path / "b" / "train_state"))
    for a, b in zip(jax.tree_util.tree_leaves(unbroken),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_train_viscoin_cadences_disabled(tiny, tmp_path):
    """eval_every=0 / checkpoint_every=0 DISABLE those cadences (like
    faithfulness_every=0) instead of dying on a modulo-by-zero — the natural
    bench/drive configuration (surfaced by a TPU drive with eval off)."""
    models, generator, gvars, lpips, lparams = tiny
    train_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG, mode="train")
    test_ds = SyntheticDataset(n=2, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=2, num_threads=0)
    test_loader = DataLoader(test_ds, batch_size=2, shuffle=False, num_threads=0)
    cfg = VisCoINTrainingParams(iterations=2, batch_size=2, cd_fid_iteration=-1)
    train_viscoin(models, generator, gvars, lpips, lparams,
                  train_loader, test_loader, cfg, checkpoint_dir=str(tmp_path),
                  eval_every=0, checkpoint_every=0, faithfulness_every=0)
    assert not os.path.isdir(tmp_path / "train_state")  # nothing saved
