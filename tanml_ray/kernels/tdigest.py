"""Merging t-digest quantile sketch (Dunning & Ertl 2019, public alg).

Replaces the reference's exact ``Series.quantile(0.25/0.75)``
(/root/reference/tanml/ui/views/profiling.py:176-187) for streaming
quantiles: per-batch updates buffer raw values and compress into
centroids using the k1 scale function; merge concatenates centroid
lists and recompresses. Associative within documented tolerance
(relative quantile error ~ O(q(1-q)/delta)).
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    def __init__(self, delta: int = 256):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- updates ---------------------------------------------------------
    def update(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float64)
        x = x[np.isfinite(x)]
        if x.size == 0:
            return
        self._buf.append(x)
        self._buf_n += x.size
        if self._buf_n > 8 * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        xs = np.concatenate(self._buf)
        self._buf, self._buf_n = [], 0
        self._compress(np.concatenate([self.means, xs]),
                       np.concatenate([self.weights, np.ones(xs.size)]))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            return
        out_means: list[float] = []
        out_weights: list[float] = []
        # k1 scale function: k(q) = delta/(2π) · asin(2q−1)
        def k_fn(q: float) -> float:
            return self.delta / (2 * math.pi) * math.asin(2 * min(max(q, 0.0), 1.0) - 1)

        w_so_far = 0.0
        cur_w = weights[0]
        cur_sum = means[0] * weights[0]
        k_lo = k_fn(0.0)
        for i in range(1, means.size):
            q_hi = (w_so_far + cur_w + weights[i]) / total
            if k_fn(q_hi) - k_lo <= 1.0:
                cur_w += weights[i]
                cur_sum += means[i] * weights[i]
            else:
                out_means.append(cur_sum / cur_w)
                out_weights.append(cur_w)
                w_so_far += cur_w
                k_lo = k_fn(w_so_far / total)
                cur_w = weights[i]
                cur_sum = means[i] * weights[i]
        out_means.append(cur_sum / cur_w)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    def merge(self, other: "TDigest") -> "TDigest":
        self._flush()
        other._flush()
        if other.means.size:
            self._compress(np.concatenate([self.means, other.means]),
                           np.concatenate([self.weights, other.weights]))
        return self

    # -- queries ---------------------------------------------------------
    @property
    def n(self) -> float:
        return float(self.weights.sum()) + self._buf_n

    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoint cumulative positions
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def cdf(self, x: float) -> float:
        """Approximate P(X <= x) — used by the sketch-based KS check."""
        self._flush()
        if self.means.size == 0:
            return float("nan")
        w, m = self.weights, self.means
        total = w.sum()
        if x < m[0]:
            return 0.0
        if x >= m[-1]:
            return 1.0
        cum = np.cumsum(w) - w / 2.0
        i = int(np.searchsorted(m, x, side="right") - 1)
        if i + 1 >= m.size:
            return float(cum[-1] / total)
        span = m[i + 1] - m[i]
        frac = (x - m[i]) / span if span > 0 else 0.0
        return float((cum[i] + frac * (cum[i + 1] - cum[i])) / total)

    def to_state(self) -> tuple:
        self._flush()
        return (self.delta, self.means.copy(), self.weights.copy())

    @classmethod
    def from_state(cls, s: tuple) -> "TDigest":
        t = cls(delta=s[0])
        t.means = np.asarray(s[1], dtype=np.float64)
        t.weights = np.asarray(s[2], dtype=np.float64)
        return t
