"""FID: streaming feature statistics + Fréchet distance.

Replaces the reference's use of the stylegan2-ada `FeatureStats` accumulator
and scipy sqrtm (viscoin/testing/viscoin.py:84-90,114-118,133-139). Feature
extraction is pluggable (see models/inception.py); the mean/cov accumulation
is streaming in float64 on host, and the matrix square root runs on host via
scipy (a 2048² sqrtm is not TPU work and must not stall the step pipeline).
"""

from __future__ import annotations

import numpy as np


class FeatureStats:
    """Streaming mean + covariance accumulator (reference: stylegan2_ada
    metrics/metric_utils.py::FeatureStats, capture_mean_cov path).

    ``capture_all=True`` additionally retains the raw feature rows (the
    upstream capture_all path) — required by KID, whose unbiased MMD
    estimator works on samples, not moments."""

    def __init__(self, max_items: int | None = None,
                 capture_all: bool = False):
        self.max_items = max_items
        self.num_items = 0
        self._sum = None
        self._outer = None
        self._all: list[np.ndarray] | None = [] if capture_all else None

    def append(self, features: np.ndarray):
        x = np.asarray(features, np.float64)
        assert x.ndim == 2
        if self.max_items is not None:
            remaining = self.max_items - self.num_items
            if remaining <= 0:
                return
            x = x[:remaining]
        if self._sum is None:
            dim = x.shape[1]
            self._sum = np.zeros(dim)
            self._outer = np.zeros((dim, dim))
        self.num_items += x.shape[0]
        self._sum += x.sum(axis=0)
        self._outer += x.T @ x
        if self._all is not None:
            self._all.append(x)

    def get_all(self) -> np.ndarray:
        """The captured (num_items, dim) feature matrix (capture_all only)."""
        if self._all is None:
            raise ValueError("FeatureStats was not built with capture_all "
                             "(KID needs raw features, not moments)")
        return np.concatenate(self._all, axis=0)

    def append_moments(self, sum_x: np.ndarray, outer: np.ndarray, n: float):
        """Accumulate precomputed per-batch moments (Σx, Σxxᵀ, count) —
        the device-side reduction path used on meshes/multi-host runs, where
        raw features are sharded across processes and only the (replicated)
        moment sums come back to host."""
        sum_x = np.asarray(sum_x, np.float64)
        outer = np.asarray(outer, np.float64)
        if self.max_items is not None and self.num_items + n > self.max_items:
            raise ValueError("append_moments cannot truncate to max_items")
        if self._sum is None:
            self._sum = np.zeros(sum_x.shape[0])
            self._outer = np.zeros(outer.shape)
        self.num_items += int(n)
        self._sum += sum_x
        self._outer += outer

    def get_mean_cov(self) -> tuple[np.ndarray, np.ndarray]:
        mean = self._sum / self.num_items
        cov = self._outer / self.num_items - np.outer(mean, mean)
        return mean, cov


def frechet_distance(mu_real, sigma_real, mu_fake, sigma_fake) -> float:
    """FID between two Gaussians (reference formula, testing/viscoin.py:133-139)."""
    from scipy.linalg import sqrtm

    m = np.square(mu_fake - mu_real).sum()
    s = sqrtm(np.dot(sigma_fake, sigma_real))
    if isinstance(s, tuple):  # older scipy returns (sqrtm, errest)
        s = s[0]
    return float(np.real(m + np.trace(sigma_fake + sigma_real - s * 2)))


def fid_from_stats(stats_real: FeatureStats, stats_fake: FeatureStats) -> float:
    mu_r, sig_r = stats_real.get_mean_cov()
    mu_f, sig_f = stats_fake.get_mean_cov()
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def kernel_inception_distance(real: np.ndarray, fake: np.ndarray,
                              num_subsets: int = 100,
                              max_subset_size: int = 1000,
                              seed: int = 0) -> float:
    """KID: unbiased MMD² with the cubic polynomial kernel
    k(x, y) = (xᵀy/d + 1)³ (Bińkowski et al., "Demystifying MMD GANs" —
    the stylegan2-ada ecosystem's kid50k_full metric, the small-dataset
    companion of FID: its estimator is UNBIASED at small sample counts,
    where FID's moment estimates are systematically high; CUB at ~6k images
    is exactly that regime). Averaged over ``num_subsets`` random
    without-replacement subsets of size min(len(real), len(fake),
    max_subset_size), matching the upstream estimator's defaults;
    deterministic in ``seed``. Can be slightly negative (unbiasedness)."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    assert real.ndim == 2 and fake.ndim == 2 and real.shape[1] == fake.shape[1]
    d = real.shape[1]
    m = min(real.shape[0], fake.shape[0], max_subset_size)
    if m < 2:
        raise ValueError(f"KID needs ≥2 samples per side, got {m}")
    rng = np.random.default_rng(seed)
    total = 0.0
    for _ in range(num_subsets):
        x = fake[rng.choice(fake.shape[0], m, replace=False)]
        y = real[rng.choice(real.shape[0], m, replace=False)]
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        # Unbiased estimator: within-set terms exclude the diagonal.
        total += ((kxx.sum() - np.trace(kxx)) / (m - 1)
                  + (kyy.sum() - np.trace(kyy)) / (m - 1)
                  - 2.0 * kxy.sum() / m)
    return float(total / num_subsets / m)


def kid_from_stats(stats_real: FeatureStats, stats_fake: FeatureStats,
                   num_subsets: int = 100, max_subset_size: int = 1000,
                   seed: int = 0) -> float:
    return kernel_inception_distance(stats_real.get_all(),
                                     stats_fake.get_all(),
                                     num_subsets, max_subset_size, seed)


def precision_recall(real: np.ndarray, fake: np.ndarray,
                     nhood_size: int = 3,
                     row_batch: int = 4096) -> tuple[float, float]:
    """Improved precision & recall (Kynkäänniemi et al. 2019 — the
    stylegan2-ada pr50k3 metric, nhood_size=3): each side's manifold is the
    union of balls around its samples with radius = the sample's
    ``nhood_size``-th-NN distance within its own set; precision = fraction
    of FAKE samples inside the real manifold (fidelity), recall = fraction
    of REAL samples inside the fake manifold (coverage). Deterministic (no
    sampling). Distances are L2 over the detector features, blocked
    ``row_batch`` rows at a time so 50k-scale feature sets never
    materialize an N² matrix."""
    real = np.asarray(real, np.float32)
    fake = np.asarray(fake, np.float32)
    assert real.ndim == 2 and fake.ndim == 2 and real.shape[1] == fake.shape[1]
    if min(real.shape[0], fake.shape[0]) <= nhood_size:
        raise ValueError(
            f"precision/recall needs > nhood_size={nhood_size} samples per "
            f"side, got {real.shape[0]} real / {fake.shape[0]} fake")

    def sq_dists(a, b):  # (m, d), (n, d) -> (m, n) squared L2
        d2 = (np.sum(a * a, axis=1)[:, None]
              + np.sum(b * b, axis=1)[None, :] - 2.0 * (a @ b.T))
        return np.maximum(d2, 0.0)

    def radii(x):
        """Per-sample manifold radius²: the (nhood_size+1)-th smallest
        within-set distance (self sits at 0, so this is the k-th NN)."""
        out = np.empty(x.shape[0], np.float32)
        for s in range(0, x.shape[0], row_batch):
            d2 = sq_dists(x[s : s + row_batch], x)
            out[s : s + row_batch] = np.partition(
                d2, nhood_size, axis=1)[:, nhood_size]
        return out

    def fraction_inside(probes, manifold, manifold_r2):
        hits = 0
        for s in range(0, probes.shape[0], row_batch):
            d2 = sq_dists(probes[s : s + row_batch], manifold)
            hits += int(np.any(d2 <= manifold_r2[None, :], axis=1).sum())
        return hits / probes.shape[0]

    precision = fraction_inside(fake, real, radii(real))
    recall = fraction_inside(real, fake, radii(fake))
    return float(precision), float(recall)


def pr_from_stats(stats_real: FeatureStats, stats_fake: FeatureStats,
                  nhood_size: int = 3) -> tuple[float, float]:
    return precision_recall(stats_real.get_all(), stats_fake.get_all(),
                            nhood_size)
