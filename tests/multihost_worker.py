"""Worker for tests/test_multihost.py: one of two CPU processes running the
REAL multi-host code paths — jax.distributed + a 2-process gloo backend, a
4-device global mesh (2 local devices per process), sharded DataLoaders,
global_shard_batch reassembly, the full train_viscoin loop with in-loop
test_viscoin eval (incl. the device-side FID moment reduction), process-0-only
checkpointing/logging, and the process-0-only faithfulness probe.

Run as: python multihost_worker.py <process_id> <coordinator_port> <tmpdir>
Prints MULTIHOST_OK <json> on success (asserted by the pytest wrapper).
"""

import json
import os
import sys


def main():
    pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_mh_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from viscoin_tpu.data.datasets import SyntheticDataset
    from viscoin_tpu.data.loader import DataLoader
    from viscoin_tpu.models.bundle import VisCoINModels, init_models
    from viscoin_tpu.models.concept_extractor import ConceptExtractor
    from viscoin_tpu.models.explainer import Explainer
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.resnet import Classifier
    from viscoin_tpu.models.stylegan import Generator, GeneratorAdapted
    from viscoin_tpu.parallel.mesh import global_shard_batch, make_mesh, replicated
    from viscoin_tpu.train.viscoin import VisCoINTrainingParams, train_viscoin
    from viscoin_tpu.utils.logging import configure_score_logging

    IMG, NC, NK = 32, 4, 8
    mesh = make_mesh(4)

    def barrier(name: str, timeout_ms: int = 600_000):
        """Align the two ranks between phases via the coordination service
        (NOT a device collective): each new collective XLA program creates a
        gloo context whose key-value rendezvous has a hard ~30s deadline, so
        inter-phase compile/retrace skew beyond that kills whichever rank
        arrives first. The coordination barrier has a configurable timeout."""
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_ms)

    # --- global_shard_batch reassembly: the sharded loaders' local slices
    # must concatenate to exactly the unsharded loader's global batch.
    ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="train")
    sharded = DataLoader(ds, batch_size=4, num_threads=0, seed=5, shard=(pid, 2))
    ref_loader = DataLoader(SyntheticDataset(n=8, n_classes=NC, image_size=IMG,
                                             mode="train"),
                            batch_size=4, num_threads=0, seed=5, drop_last=True)
    local_imgs, local_lbls = next(iter(sharded))
    ref_imgs, ref_lbls = next(iter(ref_loader))
    g_imgs, g_lbls = global_shard_batch(mesh, local_imgs,
                                        local_lbls.astype(np.int32))
    rep = jax.jit(lambda a, b: (a, b),
                  out_shardings=(replicated(mesh), replicated(mesh)))
    g_imgs, g_lbls = rep(g_imgs, g_lbls)
    np.testing.assert_array_equal(np.asarray(g_imgs), ref_imgs)
    np.testing.assert_array_equal(np.asarray(g_lbls), ref_lbls.astype(np.int32))

    # --- the full training loop, multi-host.
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

    train_ds = SyntheticDataset(n=8, n_classes=NC, image_size=IMG, mode="train")
    # n=6 at batch 4 leaves a ragged tail of 2: pad_final delivers it as
    # equal per-rank slices with sentinel-masked padding — without it a
    # sharded loader DROPS the tail and eval metrics exclude those samples
    # (test_viscoin refuses such loaders).
    test_ds = SyntheticDataset(n=6, n_classes=NC, image_size=IMG, mode="test")
    train_loader = DataLoader(train_ds, batch_size=4, num_threads=0,
                              shard=(pid, 2))
    test_loader = DataLoader(test_ds, batch_size=4, shuffle=False, num_threads=0,
                             shard=(pid, 2), pad_final=True)

    # Tiny stand-in FID detector (4-d features): exercises the device-side
    # moment reduction path without an Inception network.
    @jax.jit
    def fid_detector(images):
        m = jnp.mean(images, axis=(1, 2))  # (B, 3)
        return jnp.concatenate([m, jnp.std(images, axis=(1, 2, 3))[:, None]],
                               axis=1)

    log_path = os.path.join(tmp, f"log_rank{pid}.jsonl")
    configure_score_logging(log_path)
    ckpt_dir = os.path.join(tmp, f"ckpt_rank{pid}")  # per-rank: simulates
    os.makedirs(ckpt_dir, exist_ok=True)             # a non-shared filesystem

    cfg = VisCoINTrainingParams(iterations=4, batch_size=4, cd_fid_iteration=-1)
    barrier("pre-train")
    train_viscoin(models, generator, gvars, lpips, lparams,
                  train_loader, test_loader, cfg, mesh=mesh,
                  checkpoint_dir=ckpt_dir, eval_every=2, checkpoint_every=3,
                  faithfulness_every=3, fid_detector=fid_detector)

    # --- standalone multi-host eval: replicated metrics identical on both
    # ranks (printed; compared across ranks by the pytest wrapper). The
    # eval step closes over module DEFS only, so ONE compiled step serves
    # both evals (and skips a rank-skewing retrace).
    from viscoin_tpu.eval.viscoin import make_test_step, test_viscoin

    barrier("pre-eval")
    eval_step = make_test_step(models, lpips, mesh=mesh)
    results = test_viscoin(models, lpips, lparams, test_loader,
                           compute_fid=True, fid_detector=fid_detector,
                           verbose=False, mesh=mesh, step=eval_step)

    # --- ragged-tail exactness: evaluate a FRESHLY-initialized bundle (a
    # pure function of PRNGKey(0), reproducible by the single-process pytest
    # wrapper) over the padded sharded loader; the wrapper recomputes the
    # same eval unsharded/single-device and compares — proving the tail
    # samples are included and the metrics match the exact averages.
    models0 = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    models0 = init_models(models0, jax.random.PRNGKey(0), image_size=IMG)
    barrier("pre-eval0")
    eval0 = test_viscoin(models0, lpips, lparams, test_loader,
                         compute_fid=True, fid_detector=fid_detector,
                         verbose=False, mesh=mesh, step=eval_step)

    # --- the GAN trainer, multi-host: sharded loader slices reassemble via
    # global_shard_batch, state replicates, GSPMD all-reduces both nets'
    # gradients (losses replicated — compared across ranks by the wrapper).
    from viscoin_tpu.models.stylegan import Discriminator
    from viscoin_tpu.parallel.mesh import replicate
    from viscoin_tpu.train.gan import (
        GANTrainingParams,
        create_gan_train_state,
        make_gan_train_step,
    )

    g2 = Generator(z_dim=8, w_dim=16, img_resolution=16, channel_base=128,
                   channel_max=16, mapping_layers=1)
    d2 = Discriminator(img_resolution=16, channel_base=128, channel_max=16,
                       mbstd_group_size=2)
    gan_cfg = GANTrainingParams(iterations=2, batch_size=4, augment="none")
    gan_state, g_extras = create_gan_train_state(g2, d2, jax.random.PRNGKey(7),
                                                 gan_cfg, 16)
    gan_step = make_gan_train_step(g2, d2, gan_cfg, mesh=mesh)
    gan_state = replicate(mesh, gan_state)
    g_extras = replicate(mesh, g_extras)
    gan_ds = SyntheticDataset(n=8, n_classes=NC, image_size=16, mode="train")
    gan_loader = DataLoader(gan_ds, batch_size=4, num_threads=0, seed=9,
                            shard=(pid, 2))
    gan_metrics = {}
    for gi, (gimgs, _) in enumerate(gan_loader):
        if gi >= 2:
            break
        gimgs = global_shard_batch(mesh, np.asarray(gimgs))
        key = jax.random.fold_in(jax.random.PRNGKey(8), gi)
        if gi == 0:
            # Compile BEFORE the synchronized first dispatch: the first
            # dispatch of a new collective program creates its gloo context
            # (hard ~30s rendezvous), and compile-time skew between ranks
            # can exceed that. AOT-compile per rank, barrier, then dispatch.
            gan_step.lower(gan_state, g_extras, gimgs, key).compile()
            barrier("gan-compiled")
        gan_state, gan_metrics = gan_step(gan_state, g_extras, gimgs, key)
    gan_g = float(gan_metrics["g_loss"])
    gan_d = float(gan_metrics["d_loss"])
    assert np.isfinite(gan_g) and np.isfinite(gan_d)

    import logging

    logging.shutdown()
    wrote_ckpt = os.path.isdir(os.path.join(ckpt_dir, "train_state"))
    # Non-zero ranks never even open the jsonl path (configure_score_logging
    # attaches the file handler on process 0 only), so the file won't exist.
    n_log_lines = (sum(1 for line in open(log_path) if line.strip())
                   if os.path.exists(log_path) else 0)
    print("MULTIHOST_OK " + json.dumps({
        "rank": pid,
        "acc_loss": round(results.acc_loss, 6),
        "lp_loss": round(results.lp_loss, 6),
        "fid": round(results.fid_score, 6),
        "eval0_acc_loss": round(eval0.acc_loss, 6),
        "eval0_lp_loss": round(eval0.lp_loss, 6),
        "eval0_correct_preds": round(eval0.correct_preds, 6),
        "eval0_fid": round(eval0.fid_score, 6),
        "gan_g_loss": round(gan_g, 6),
        "gan_d_loss": round(gan_d, 6),
        "wrote_ckpt": wrote_ckpt,
        "n_log_lines": n_log_lines,
    }), flush=True)


if __name__ == "__main__":
    main()
