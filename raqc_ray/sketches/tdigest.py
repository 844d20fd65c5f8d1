"""Vendored t-digest (merging variant, numpy-vectorized where possible).

Public algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles
Using t-Digests" (arXiv:1902.04023), k1 (arcsine) scale function.  The
reference computes exact percentiles on memory-resident arrays
(``[R] raqc/multi_array.py :: flag_blocks → np.nanpercentile (rec.)``); the
target spec mandates the sketch path with an exact oracle at fixture scale
(BASELINE.json:6, SURVEY.md §2.5 A2/A3/A8).

Determinism across partition orders (SURVEY.md §7 "hard parts"): merges
canonicalize by concatenating *all* centroid lists, sorting by
(mean, weight), and compressing once — so the result depends only on the
multiset of input centroids, not on merge order.
"""

from __future__ import annotations

import pickle

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf", "n", "min", "max",
                 "_compressed")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._compressed = True

    # -- update -----------------------------------------------------------
    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.n += v.size
        self._buf.append(v)
        self._compressed = False
        if sum(b.size for b in self._buf) > 16 * self.delta:
            self._compress()

    def _compress(self) -> None:
        # idempotent fast path: repeated quantile/cdf calls must not rerun
        # the greedy merge loop (measured ~175 µs/call × thousands of
        # verdict-stage calls at 512 partitions)
        if self._compressed and not self._buf:
            return
        if self._buf:
            bm = np.concatenate(self._buf)
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, np.ones(bm.size)])
            self._buf = []
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            self._compressed = True
            return
        order = np.lexsort((weights, means))
        means, weights = means[order], weights[order]
        total = weights.sum()
        # Greedy merge pass under the k1 scale-function size limit.
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        norm = self.delta / (2.0 * np.pi)
        for i in range(1, means.size):
            q0 = w_so_far / total
            q2 = (w_so_far + cur_w + weights[i]) / total
            k0 = norm * np.arcsin(2.0 * min(max(q0, 0.0), 1.0) - 1.0)
            k2 = norm * np.arcsin(2.0 * min(max(q2, 0.0), 1.0) - 1.0)
            if (k2 - k0) <= 1.0:
                cur_m += (means[i] - cur_m) * weights[i] / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        self._compressed = True

    # -- query ------------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        total = self.weights.sum()
        target = q * total
        # cumulative weight at centroid centers
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            # interpolate between min and first centroid
            frac = target / max(cum[0], 1e-12)
            return float(self.min + frac * (self.means[0] - self.min))
        if target >= cum[-1]:
            frac = (target - cum[-1]) / max(total - cum[-1], 1e-12)
            return float(self.means[-1] + frac * (self.max - self.means[-1]))
        idx = np.searchsorted(cum, target) - 1
        frac = (target - cum[idx]) / max(cum[idx + 1] - cum[idx], 1e-12)
        return float(self.means[idx] + frac * (self.means[idx + 1] - self.means[idx]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        """Approximate rank of x in [0, 1] (linear interpolation between
        centroid centers) — used for partition-vs-global outlier fractions."""
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if x <= self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if x <= self.means[0]:
            frac = (x - self.min) / max(self.means[0] - self.min, 1e-12)
            return float(frac * cum[0] / total)
        if x >= self.means[-1]:
            frac = (x - self.means[-1]) / max(self.max - self.means[-1], 1e-12)
            return float((cum[-1] + frac * (total - cum[-1])) / total)
        idx = int(np.searchsorted(self.means, x, side="right")) - 1
        idx = min(max(idx, 0), self.means.size - 2)
        span = max(self.means[idx + 1] - self.means[idx], 1e-12)
        frac = (x - self.means[idx]) / span
        return float((cum[idx] + frac * (cum[idx + 1] - cum[idx])) / total)

    # -- merge (order-canonicalized) --------------------------------------
    @classmethod
    def merge_all(cls, sketches: list["TDigest"]) -> "TDigest":
        out = cls(sketches[0].delta if sketches else 200)
        parts_m, parts_w = [], []
        for s in sketches:
            s._compress()
            parts_m.append(s.means)
            parts_w.append(s.weights)
            out.n += s.n
            out.min = min(out.min, s.min)
            out.max = max(out.max, s.max)
        if parts_m:
            m = np.concatenate(parts_m)
            w = np.concatenate(parts_w)
            order = np.lexsort((w, m))  # canonical order → order-insensitive result
            out.means, out.weights = m[order], w[order]
            out._compressed = False
            out._compress()
        return out

    # -- serde ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps(
            (self.delta, self.means, self.weights, self.n, self.min, self.max),
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, means, weights, n, mn, mx = pickle.loads(data)
        td = cls(delta)
        td.means, td.weights, td.n, td.min, td.max = means, weights, n, mn, mx
        td._compressed = True  # serialized digests are always compressed
        return td
