"""A small mergeable t-digest-style quantile sketch (public algorithm:
Dunning & Ertl, "Computing extremely accurate quantiles using t-digests",
arXiv:1902.04023 — merging-digest variant with a linear scale function).

Used by the calibration aggregate (SURVEY.md §2.5 A1) as the at-scale
path: one partial sketch per block inside `map_batches`, merged in a tiny
second stage — the exact two-pass percentile stays the fixture-scale
parity path (numpy `linear` interpolation semantics, Home.py:340).

NaNs are skipped on ingest (np.nanpercentile semantics).
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: int = 256):
        self.compression = int(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # -- construction ------------------------------------------------------
    def add_values(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        v = np.sort(v)
        self._merge_sorted(v, np.ones(v.size, dtype=np.float64))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size:
            order = np.argsort(other.means, kind="stable")
            self._merge_sorted(other.means[order], other.weights[order])
        return self

    def _merge_sorted(self, means: np.ndarray, weights: np.ndarray) -> None:
        if self.means.size:
            am = np.concatenate([self.means, means])
            aw = np.concatenate([self.weights, weights])
            order = np.argsort(am, kind="stable")
            am, aw = am[order], aw[order]
        else:
            am, aw = means, weights
        total = aw.sum()
        if am.size <= self.compression:
            self.means, self.weights = am, aw
            return
        # linear (k0) scale: cap each cluster at total/compression weight
        cap = total / self.compression
        bins = np.minimum(
            (np.cumsum(aw) - aw * 0.5) // cap, self.compression - 1
        ).astype(np.int64)
        # segment-combine equal bins (weighted means)
        change = np.nonzero(np.diff(bins))[0] + 1
        starts = np.concatenate([[0], change])
        w = np.add.reduceat(aw, starts)
        m = np.add.reduceat(am * aw, starts) / w
        self.means, self.weights = m, w

    # -- queries -----------------------------------------------------------
    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cw = np.cumsum(self.weights) - self.weights * 0.5
        target = q * self.weights.sum()
        return float(np.interp(target, cw, self.means))

    # -- serialization (for shipping through Arrow/objects) ----------------
    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return self.means.copy(), self.weights.copy()

    @classmethod
    def from_arrays(cls, means: np.ndarray, weights: np.ndarray, compression: int = 256) -> "TDigest":
        td = cls(compression)
        td.means = np.asarray(means, dtype=np.float64)
        td.weights = np.asarray(weights, dtype=np.float64)
        return td
