"""Tests for the evaluation layer: test_viscoin, amplification, concept
analytics, FID stats, classifier eval, cosine matching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viscoin_tpu.data.datasets import SyntheticDataset
from viscoin_tpu.data.loader import DataLoader
from viscoin_tpu.eval.classifiers import test_classifier as eval_classifier
from viscoin_tpu.eval.concept2clip import TensorLoader
from viscoin_tpu.eval.concept2clip import test_concept2clip as eval_concept2clip
from viscoin_tpu.eval.concepts import test_concepts as eval_concepts
from viscoin_tpu.eval.fid import FeatureStats, frechet_distance
from viscoin_tpu.eval.viscoin import amplify_concepts, make_amplify_fns
from viscoin_tpu.eval.viscoin import test_viscoin as eval_viscoin
from viscoin_tpu.models.bundle import VisCoINModels, init_models
from viscoin_tpu.models.concept2clip import Concept2CLIP
from viscoin_tpu.models.concept_extractor import ConceptExtractor
from viscoin_tpu.models.explainer import Explainer
from viscoin_tpu.models.lpips import LPIPS
from viscoin_tpu.models.resnet import Classifier
from viscoin_tpu.models.stylegan import GeneratorAdapted
from viscoin_tpu.utils.metrics import cosine_matching

IMG, NC, NK = 32, 5, 8


@pytest.fixture(scope="module")
def models():
    m = VisCoINModels(
        classifier=Classifier(output_classes=NC, embedding_size=8,
                              hidden_sizes=(8, 16, 32, 64), depths=(1, 1, 1, 1)),
        concept_extractor=ConceptExtractor(n_concepts=NK, latent_channels=8,
                                           input_channels1=16, input_channels2=32,
                                           input_channels3=64),
        explainer=Explainer(n_concepts=NK, n_classes=NC),
        gan=GeneratorAdapted(z_dim=NK, w_dim=32, img_resolution=IMG,
                             channel_base=256, channel_max=16),
    )
    return init_models(m, jax.random.PRNGKey(0), image_size=IMG)


@pytest.fixture(scope="module")
def loader():
    ds = SyntheticDataset(n=10, n_classes=NC, image_size=IMG, mode="test")
    return DataLoader(ds, batch_size=4, shuffle=False, num_threads=0)


def test_feature_stats_matches_numpy(rng):
    x = rng.standard_normal((100, 16))
    fs = FeatureStats()
    fs.append(x[:30])
    fs.append(x[30:])
    mu, cov = fs.get_mean_cov()
    np.testing.assert_allclose(mu, x.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-8, atol=1e-10)


def test_frechet_distance_identity(rng):
    x = rng.standard_normal((200, 8))
    fs = FeatureStats()
    fs.append(x)
    mu, cov = fs.get_mean_cov()
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6
    mu2 = mu + 1.0
    d = frechet_distance(mu, cov, mu2, cov)
    np.testing.assert_allclose(d, 8.0, rtol=1e-5)  # ||Δmu||² = 8


def test_test_viscoin_runs(models, loader):
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    results = eval_viscoin(models, lpips, lparams, loader)
    for f in ["acc_loss", "cr_loss", "of_loss", "lp_loss", "rec_loss_l1",
              "rec_loss_l2", "preds_overlap", "correct_preds", "correct_expl_preds"]:
        assert np.isfinite(getattr(results, f)), f
    assert results.fid_score is None


def test_test_viscoin_fid(models, loader):
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]

    def fake_detector(x):  # stand-in feature extractor
        return np.asarray(x).reshape(x.shape[0], -1)[:, :16]

    results = eval_viscoin(models, lpips, lparams, loader, compute_fid=True,
                           fid_detector=fake_detector)
    assert results.fid_score is not None and np.isfinite(results.fid_score)


def test_amplify_concepts(models, rng):
    img = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    from viscoin_tpu.data.transforms import device_preprocess

    x = np.asarray(device_preprocess(jnp.asarray(img[None])))[0]
    fns = make_amplify_fns(models)
    res = amplify_concepts(
        x, models, {"method": "threshold", "threshold": 0.2},
        [0.0, 1.0, 2.0, 4.0], rng=rng, fns=fns,
    )
    assert len(res.amplified_images) == 4
    assert len(res.best_concept_probas_best) == 4
    assert len(res.best_concept_probas_rand) == 4
    assert res.amplified_images[0].shape == (IMG, IMG, 3)
    assert res.default_probas.shape == (NC,)
    for p in res.best_concept_probas_best + res.best_concept_probas_rand:
        assert 0.0 <= p <= 1.0

    res2 = amplify_concepts(x, models, {"method": "top_k", "k": 2}, [1.0], rng=rng, fns=fns)
    assert len(res2.amplified_images) == 1
    # multiplier 1.0 with any selection = unmodified reconstruction
    np.testing.assert_allclose(res2.amplified_images[0],
                               res.amplified_images[1], rtol=1e-4, atol=1e-5)


def test_faithfulness_probe_matches_amplify(models, rng):
    """The batched faithfulness probe == the reference-shaped per-image
    amplify_concepts loop it replaces (train_viscoin's 25k-cadence probe):
    best_concept_probas_best[1] is the ×1 (identity-scale) reconstruction
    probability, independent of the concept selection, so the 200-dispatch
    loop collapses into fixed-shape batched programs. batch_size=2 over 5
    images also exercises the final-chunk padding."""
    from viscoin_tpu.data.transforms import device_preprocess
    from viscoin_tpu.eval.viscoin import faithfulness_probe

    images_u8 = rng.integers(0, 256, (5, IMG, IMG, 3), dtype=np.uint8)

    fns = make_amplify_fns(models)
    want = []
    for img in images_u8:  # the old probe loop, verbatim semantics
        x = device_preprocess(jnp.asarray(img[None]))[0]
        res = amplify_concepts(
            x, models, {"method": "threshold", "threshold": 0.2},
            [0.0, 1.0, 2.0, 4.0], rng=rng, fns=fns,
        )
        want.append(res.best_concept_probas_best[1])

    got = faithfulness_probe(models, images_u8, batch_size=2)
    assert got.shape == (5,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    # mesh form (explicit replicated shardings — what the training loop
    # builds on single-process multi-device runs, and what prewarm compiles)
    from viscoin_tpu.eval.viscoin import make_faithfulness_fn
    from viscoin_tpu.parallel.mesh import make_mesh

    fn_mesh = make_faithfulness_fn(models, mesh=make_mesh(8))
    got_mesh = faithfulness_probe(models, images_u8, batch_size=2, fn=fn_mesh)
    np.testing.assert_allclose(got_mesh, got, rtol=1e-5, atol=1e-7)


def test_test_concepts(models, loader):
    results = eval_concepts(models, loader, n_classes=NC)
    K = NK
    assert results.concept_correlations.shape == (K, K)
    assert results.class_concept_correlations.shape == (NC, K)
    assert results.concept_class_correlations.shape == (K, NC)
    assert results.concept_entropy.shape == (K,)
    assert 0 <= results.classifier_accuracy <= 1
    assert results.class_counts.sum() == 10


def test_eval_classifier(models, loader):
    acc, loss = eval_classifier(models.classifier, models.classifier_vars, loader)
    assert 0 <= acc <= 1 and np.isfinite(loss)


def test_cosine_matching_perfect_and_value_ties(rng):
    x = rng.standard_normal((6, 4)).astype(np.float32)
    assert cosine_matching(jnp.asarray(x), jnp.asarray(x)) == 1.0
    y = np.roll(x, 1, axis=0)
    assert cosine_matching(jnp.asarray(x), jnp.asarray(y)) < 1.0


def test_test_concept2clip(rng):
    model = Concept2CLIP(n_concepts=NK, clip_dim=12)
    phi = rng.standard_normal((20, 3, 3, NK)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(phi[:1]))["params"]
    emb = rng.standard_normal((20, 12)).astype(np.float32)
    loader = TensorLoader(phi, emb, batch_size=5)
    loss, match = eval_concept2clip(model, params, loader)
    assert np.isfinite(loss) and 0 <= match <= 1


def test_test_concept2clip_mesh_matches(rng):
    """Mesh-sharded concept2clip eval == single-device eval, including the
    ragged final batch (padded to the steady shape, sliced before metrics)."""
    from viscoin_tpu.parallel.mesh import make_mesh

    model = Concept2CLIP(n_concepts=NK, clip_dim=12)
    phi = rng.standard_normal((20, 3, 3, NK)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(phi[:1]))["params"]
    emb = rng.standard_normal((20, 12)).astype(np.float32)

    def run(mesh):  # batch 8 over n=20 → ragged final batch of 4
        loader = TensorLoader(phi, emb, batch_size=8, shuffle=False)
        return eval_concept2clip(model, params, loader, verbose=False, mesh=mesh)

    loss1, match1 = run(None)
    lossm, matchm = run(make_mesh())
    np.testing.assert_allclose(loss1, lossm, rtol=1e-6)
    np.testing.assert_allclose(match1, matchm, rtol=1e-6)


def test_test_concept2clip_mesh_refuses_indivisible_batch(rng):
    from viscoin_tpu.parallel.mesh import make_mesh

    model = Concept2CLIP(n_concepts=NK, clip_dim=12)
    phi = rng.standard_normal((6, 3, 3, NK)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(phi[:1]))["params"]
    emb = rng.standard_normal((6, 12)).astype(np.float32)
    loader = TensorLoader(phi, emb, batch_size=6, shuffle=False)
    with pytest.raises(ValueError, match="does not divide"):
        eval_concept2clip(model, params, loader, verbose=False, mesh=make_mesh())


def test_compute_spaces_shapes_cache_and_mesh(models, tmp_path):
    """compute_concept_space / compute_w_space: shapes, .npz cache hit, and
    mesh-DP parity (row-independent forward → identical results)."""
    from viscoin_tpu.eval.spaces import compute_concept_space, compute_w_space
    from viscoin_tpu.parallel.mesh import make_mesh

    train_ds = SyntheticDataset(n=10, n_classes=NC, image_size=IMG, mode="test")
    test_ds = SyntheticDataset(n=6, n_classes=NC, image_size=IMG, mode="test")

    tr, te = compute_concept_space(models, "syn", train_ds, test_ds,
                                   batch_size=8, cache_dir=str(tmp_path / "c1"))
    assert tr.shape == (10, 3, 3, NK) and te.shape == (6, 3, 3, NK)
    tr2, te2 = compute_concept_space(models, "syn", train_ds, test_ds,
                                     batch_size=8, cache_dir=str(tmp_path / "c1"))
    np.testing.assert_array_equal(tr, tr2)  # cache hit

    mesh = make_mesh()
    trm, tem = compute_concept_space(models, "syn", train_ds, test_ds,
                                     batch_size=8, cache_dir=str(tmp_path / "c2"),
                                     mesh=mesh)
    np.testing.assert_allclose(trm, tr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tem, te, rtol=1e-5, atol=1e-6)

    wtr, wte = compute_w_space(models, "syn", train_ds, test_ds, batch_size=8,
                               cache_dir=str(tmp_path / "w1"))
    assert wtr.shape == (10, models.gan.num_ws, models.gan.w_dim)
    assert wte.shape == (6, models.gan.num_ws, models.gan.w_dim)
    wtrm, _ = compute_w_space(models, "syn", train_ds, test_ds, batch_size=8,
                              cache_dir=str(tmp_path / "w2"), mesh=mesh)
    np.testing.assert_allclose(wtrm, wtr, rtol=1e-5, atol=1e-6)


def test_test_viscoin_batch_size_invariant(models):
    """Metrics are exact valid-sample averages: changing the batch size (and
    hence the final ragged batch) must not change any metric (divergence from
    the reference's per-batch-mean averaging, PARITY.md)."""
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    ds = SyntheticDataset(n=10, n_classes=NC, image_size=IMG, mode="test")
    r4 = eval_viscoin(models, lpips, lparams,
                      DataLoader(ds, batch_size=4, shuffle=False, num_threads=0))
    r3 = eval_viscoin(models, lpips, lparams,
                      DataLoader(ds, batch_size=3, shuffle=False, num_threads=0))
    for f in ["acc_loss", "cr_loss", "of_loss", "lp_loss", "rec_loss_l1",
              "rec_loss_l2", "preds_overlap", "correct_preds",
              "correct_expl_preds"]:
        np.testing.assert_allclose(getattr(r4, f), getattr(r3, f), rtol=1e-4,
                                   err_msg=f)


def test_normalize_constant_input():
    """Constant arrays normalize to 0, not NaN (reference bug, fixed here)."""
    from viscoin_tpu.utils.maths import normalize

    out = normalize(np.full((4, 4), 7.0))
    assert np.all(out == 0)
    x = np.stack([np.zeros(5), np.arange(5, dtype=float)])
    out = normalize(x, axis=1)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[1], np.arange(5) / 4)


def test_test_viscoin_mesh(models):
    """Data-parallel eval: the mesh-sharded test step matches the
    single-device metrics on the same loader."""
    from viscoin_tpu.parallel.mesh import make_mesh

    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    ds = SyntheticDataset(n=10, n_classes=NC, image_size=IMG, mode="test")
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_threads=0)
    r1 = eval_viscoin(models, lpips, lparams, loader)
    r8 = eval_viscoin(models, lpips, lparams, loader, mesh=make_mesh(8))
    for f in ["acc_loss", "lp_loss", "rec_loss_l1", "correct_preds",
              "preds_overlap"]:
        np.testing.assert_allclose(getattr(r8, f), getattr(r1, f), rtol=1e-4,
                                   err_msg=f)


def test_test_viscoin_mesh_2d(models):
    """Eval on a 2-D (data, model) mesh — images' H axis spatially sharded
    over 'model' like the train step — matches single-device metrics AND
    FID (the device-side moment reduction over spatially-sharded features)."""
    from viscoin_tpu.parallel.mesh import make_mesh_2d

    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)),
                         jnp.zeros((1, IMG, IMG, 3)))["params"]

    @jax.jit
    def fid_detector(images):  # tiny stand-in, as in tests/multihost_worker.py
        m = jnp.mean(images, axis=(1, 2))  # (B, 3)
        return jnp.concatenate([m, jnp.std(images, axis=(1, 2, 3))[:, None]],
                               axis=1)

    ds = SyntheticDataset(n=10, n_classes=NC, image_size=IMG, mode="test")
    loader = DataLoader(ds, batch_size=8, shuffle=False, num_threads=0)
    r1 = eval_viscoin(models, lpips, lparams, loader, compute_fid=True,
                      fid_detector=fid_detector)
    r2d = eval_viscoin(models, lpips, lparams, loader, compute_fid=True,
                       fid_detector=fid_detector, mesh=make_mesh_2d(2, 4))
    for f in ["acc_loss", "lp_loss", "rec_loss_l1", "correct_preds",
              "preds_overlap"]:
        np.testing.assert_allclose(getattr(r2d, f), getattr(r1, f), rtol=1e-4,
                                   err_msg=f)
    np.testing.assert_allclose(r2d.fid_score, r1.fid_score, rtol=1e-3)


def test_compute_spaces_path_dataset_cache_location(models, tmp_path):
    """Caches for directory-path datasets stay INSIDE cache_dir, keyed by
    basename (+ decode size when non-256): os.path.join with a raw absolute
    dataset path resolves to a file NEXT TO the dataset root, and a stale
    256² cache must not satisfy a different --image-size run (the cached
    arrays' shapes are resolution-independent)."""
    import os

    from viscoin_tpu.eval.spaces import compute_concept_space

    train_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG, mode="test")
    test_ds = SyntheticDataset(n=4, n_classes=NC, image_size=IMG, mode="test")
    cache_dir = tmp_path / "concepts"
    dataset_path = str(tmp_path / "data" / "celeba")  # path-style name

    compute_concept_space(models, dataset_path, train_ds, test_ds,
                          batch_size=4, cache_dir=str(cache_dir))
    # keyed by basename + the 32² decode size, inside cache_dir
    assert (cache_dir / f"celeba_{IMG}.npz").exists()
    assert sorted(os.listdir(cache_dir)) == [f"celeba_{IMG}.npz"]
    assert not (tmp_path / "data").exists()  # nothing near the dataset root


def test_kid_matches_naive_mmd_oracle(rng):
    """kernel_inception_distance == a from-scratch O(m²) pairwise MMD² sum
    (unbiased estimator, cubic kernel) on one full-set subset."""
    from viscoin_tpu.eval.fid import kernel_inception_distance

    m, d = 7, 5
    real = rng.standard_normal((m, d))
    fake = rng.standard_normal((m, d)) + 0.5

    def k(a, b):
        return (float(a @ b) / d + 1.0) ** 3

    # independent slow oracle: explicit pair loops
    xx = sum(k(fake[i], fake[j]) for i in range(m) for j in range(m) if i != j)
    yy = sum(k(real[i], real[j]) for i in range(m) for j in range(m) if i != j)
    xy = sum(k(fake[i], real[j]) for i in range(m) for j in range(m))
    oracle = (xx / (m - 1) + yy / (m - 1) - 2.0 * xy / m) / m

    got = kernel_inception_distance(real, fake, num_subsets=1,
                                    max_subset_size=m)
    np.testing.assert_allclose(got, oracle, rtol=1e-10)


def test_kid_zero_same_distribution_positive_shifted(rng):
    """KID ~ 0 (unbiased: may be slightly negative) for two samples of the
    same distribution; clearly positive for a mean-shifted one; deterministic
    in seed."""
    from viscoin_tpu.eval.fid import kernel_inception_distance

    a = rng.standard_normal((400, 16))
    b = rng.standard_normal((400, 16))
    same = kernel_inception_distance(a, b, num_subsets=20, max_subset_size=200)
    shifted = kernel_inception_distance(a, b + 1.0, num_subsets=20,
                                        max_subset_size=200)
    assert abs(same) < 0.05
    assert shifted > 10 * abs(same)
    again = kernel_inception_distance(a, b, num_subsets=20,
                                      max_subset_size=200)
    assert same == again  # seeded subset draws


def test_feature_stats_capture_all(rng):
    """capture_all retains raw rows (max_items-truncated, moments unchanged);
    get_all without capture_all refuses with a pointer."""
    from viscoin_tpu.eval.fid import FeatureStats

    x = rng.standard_normal((10, 4))
    s = FeatureStats(max_items=7, capture_all=True)
    s.append(x[:5])
    s.append(x[5:])
    np.testing.assert_array_equal(s.get_all(), x[:7].astype(np.float64))
    ref = FeatureStats(max_items=7)
    ref.append(x)
    np.testing.assert_allclose(s.get_mean_cov()[0], ref.get_mean_cov()[0])

    with pytest.raises(ValueError, match="capture_all"):
        FeatureStats().get_all()


def test_ppl_sampler_and_filter(rng):
    """PPL sampler: finite positive distances, deterministic in key, distinct
    across keys; the percentile filter matches a from-scratch oracle."""
    from viscoin_tpu.eval.ppl import (
        compute_ppl,
        make_ppl_sampler,
        ppl_from_distances,
    )
    from viscoin_tpu.models.lpips import LPIPS
    from viscoin_tpu.models.stylegan import Generator

    gen = Generator(z_dim=8, w_dim=16, img_resolution=32, mapping_layers=2,
                    channel_base=256, channel_max=16)
    gvars = gen.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8)),
                     noise_mode="const")
    lpips = LPIPS()
    lparams = lpips.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1, 32, 32, 3)))["params"]

    sampler = make_ppl_sampler(gen, lpips, batch_size=4)
    d1 = np.asarray(sampler(gvars, lparams, jax.random.PRNGKey(7)))
    d2 = np.asarray(sampler(gvars, lparams, jax.random.PRNGKey(7)))
    d3 = np.asarray(sampler(gvars, lparams, jax.random.PRNGKey(8)))
    # (no sign assertion: the test's LPIPS heads are random-init, which can
    # produce negative "distances" — real ported heads are non-negative)
    assert d1.shape == (4,) and np.isfinite(d1).all()
    np.testing.assert_array_equal(d1, d2)
    assert not np.array_equal(d1, d3)

    # percentile filter oracle (upstream's lower/higher rounding)
    dists = rng.standard_normal(500) ** 2
    lo = np.percentile(dists, 1, method="lower")
    hi = np.percentile(dists, 99, method="higher")
    oracle = dists[(dists >= lo) & (dists <= hi)].mean()
    np.testing.assert_allclose(ppl_from_distances(dists), oracle)

    # end to end: deterministic in seed
    p1 = compute_ppl(gen, gvars, lpips, lparams, n_samples=8, batch_size=4)
    p2 = compute_ppl(gen, gvars, lpips, lparams, n_samples=8, batch_size=4)
    assert np.isfinite(p1) and p1 == p2


def test_ppl_sampling_modes():
    """sampling='end' (the ppl2_wend default) measures the segment START:
    the first pair half IS the w0 synthesis (t=0), verified against an
    explicit w0 render; 'full' draws t~U(0,1) and differs. The z draws are
    identical between modes (same key split), and bad modes are refused."""
    import pytest

    from viscoin_tpu.eval.ppl import make_ppl_pair_fn
    from viscoin_tpu.models.stylegan import Generator

    gen = Generator(z_dim=8, w_dim=16, img_resolution=32, mapping_layers=2,
                    channel_base=256, channel_max=16)
    gvars = gen.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8)),
                     noise_mode="const")
    key = jax.random.PRNGKey(5)
    bs = 3

    end = np.asarray(make_ppl_pair_fn(gen, bs)(gvars, key))
    full = np.asarray(make_ppl_pair_fn(gen, bs, sampling="full")(gvars, key))
    assert not np.array_equal(end, full)

    # 'end' first half == the plain w0 synthesis of the same z0 draw
    kz0 = jax.random.split(key, 3)[0]
    z0 = jax.random.normal(kz0, (bs, gen.z_dim))
    w0 = gen.apply(gvars, z0, method=lambda m, z: m.mapping(z))
    img0 = gen.apply(gvars, w0,
                     method=lambda m, w: m.synthesis(w, noise_mode="const"))
    np.testing.assert_allclose(end[:bs], np.asarray(img0), atol=1e-5)

    with pytest.raises(ValueError, match="sampling"):
        make_ppl_pair_fn(gen, bs, sampling="mid")(gvars, key)


def test_precision_recall_oracle_and_extremes(rng):
    """precision_recall vs a naive all-pairs oracle on a tiny set; identical
    sets score (1, 1); far-apart clusters score (0, 0); blocked row batches
    don't change the result; too-few samples refused."""
    from viscoin_tpu.eval.fid import precision_recall

    real = rng.standard_normal((20, 6)).astype(np.float32)
    fake = rng.standard_normal((16, 6)).astype(np.float32) * 1.3

    # naive oracle: explicit pairwise distances + k-th NN radii
    def dmat(a, b):
        return np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))

    k = 3
    r_real = np.sort(dmat(real, real), axis=1)[:, k]  # col 0 is self
    r_fake = np.sort(dmat(fake, fake), axis=1)[:, k]
    prec = np.mean(np.any(dmat(fake, real) <= r_real[None, :], axis=1))
    rec = np.mean(np.any(dmat(real, fake) <= r_fake[None, :], axis=1))

    got_p, got_r = precision_recall(real, fake)
    np.testing.assert_allclose((got_p, got_r), (prec, rec), atol=1e-6)
    # blocking is an implementation detail
    np.testing.assert_allclose(
        precision_recall(real, fake, row_batch=5), (got_p, got_r), atol=1e-6)

    assert precision_recall(real, real) == (1.0, 1.0)
    p0, r0 = precision_recall(real, fake + 100.0)
    assert (p0, r0) == (0.0, 0.0)

    with pytest.raises(ValueError, match="nhood_size"):
        precision_recall(real[:3], fake)
