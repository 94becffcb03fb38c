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
    metrics/metric_utils.py::FeatureStats, capture_mean_cov path)."""

    def __init__(self, max_items: int | None = None):
        self.max_items = max_items
        self.num_items = 0
        self._sum = None
        self._outer = None

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
