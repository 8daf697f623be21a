"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
using t-digests") — north-rule extension (no counterpart in the reference C
library).

The buffer-and-merge variant: incoming values accumulate in a buffer; at
flush the buffer and existing centroids are sorted by mean and greedily
re-clustered under the k1 scale function

    k(q) = δ/(2π) · asin(2q − 1)

(a centroid may absorb mass while its k-span stays ≤ 1), which concentrates
resolution at the tails.  Quantile queries interpolate between centroid
means.  Merge = concatenate centroid lists + one re-cluster pass —
associative up to the published accuracy bound (like KLL, merged states are
not byte-identical across merge orders; the quantile-error bound is the
guarantee).

All state is (mean, weight) float64 pairs; min/max tracked exactly for the
q→0/1 tails.
"""

from __future__ import annotations

import math

import numpy as np

from sketchlib.specs import TDigestSpec

_BUFFER_FACTOR = 5


class TDigest:
    spec_cls = TDigestSpec

    def __init__(
        self,
        spec: TDigestSpec,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
        vmin: float = math.inf,
        vmax: float = -math.inf,
    ):
        self.spec = spec
        self.compression = spec.compression
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)
        self.min = vmin
        self.max = vmax
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + sum(float(b.size) for b in self._buf)

    # -- ingest -----------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not v.size:
            return
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n >= _BUFFER_FACTOR * self.compression:
            self._flush()

    def _flush(self) -> None:
        if not self._buf_n:
            return
        buf = np.concatenate(self._buf)
        self._buf = []
        self._buf_n = 0
        self.min = min(self.min, float(buf.min()))
        self.max = max(self.max, float(buf.max()))
        means = np.concatenate([self.means, buf])
        weights = np.concatenate([self.weights, np.ones(buf.size, dtype=np.float64)])
        self.means, self.weights = _cluster(means, weights, self.compression)

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible t-digests")
        self._flush()
        other._flush()
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _cluster(means, weights, self.compression)
        return self

    # -- queries ----------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._flush()
        m, w = self.means, self.weights
        if not m.size:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        total = w.sum()
        target = q * total
        # centroid centers at cumulative-weight midpoints
        cum = np.cumsum(w) - w / 2.0
        if target <= cum[0]:
            # interpolate min → first centroid
            t = target / cum[0] if cum[0] > 0 else 1.0
            return float(self.min + t * (m[0] - self.min))
        if target >= cum[-1]:
            denom = total - cum[-1]
            t = (target - cum[-1]) / denom if denom > 0 else 1.0
            return float(m[-1] + t * (self.max - m[-1]))
        idx = int(np.searchsorted(cum, target, side="right"))
        c0, c1 = cum[idx - 1], cum[idx]
        t = (target - c0) / (c1 - c0) if c1 > c0 else 0.0
        return float(m[idx - 1] + t * (m[idx] - m[idx - 1]))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        self._flush()
        m, w = self.means, self.weights
        if not m.size:
            return float("nan")
        total = w.sum()
        below = w[m < x].sum()
        eq = w[m == x].sum()
        return float((below + 0.5 * eq) / total)

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        import struct

        self._flush()
        head = struct.pack("<qdd", self.means.size, self.min, self.max)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, spec: TDigestSpec, blob: bytes) -> "TDigest":
        import struct

        nc, vmin, vmax = struct.unpack_from("<qdd", blob, 0)
        off = 24
        means = np.frombuffer(blob, dtype=np.float64, count=nc, offset=off).copy()
        weights = np.frombuffer(blob, dtype=np.float64, count=nc, offset=off + 8 * nc).copy()
        return cls(spec, means, weights, vmin, vmax)


def _k1(q: np.ndarray | float, compression: float):
    return compression / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


def _cluster(
    means: np.ndarray, weights: np.ndarray, compression: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right re-cluster under the k1 scale-function limit.

    Vectorized: the absorb condition ``k1(q_right) − k1(q_left) ≤ 1`` is
    monotone in the cumulative weight, so each cluster's right boundary is
    the last sorted point whose cumulative weight stays ≤ the k1-inverse
    limit ``total · q`` where ``k1(q) = k1(q_left) + 1`` — one searchsorted
    per OUTPUT centroid (O(δ) steps) instead of a Python loop per input
    point (the r5 shape cost ~1 s per 600 k ingested values; the flush is
    the t-digest hot path).  Same greedy clusters; centroid means are exact
    weighted means (float rounding may differ from the old incremental
    update by ~1 ulp, within the published rank-error bound either way)."""
    if not means.size:
        return means, weights
    order = np.argsort(means, kind="stable")
    means = means[order]
    weights = weights[order]
    total = float(weights.sum())
    csum = np.cumsum(weights)  # cumulative weight THROUGH each point
    k_max = _k1(1.0, compression)

    out_m: list[float] = []
    out_w: list[float] = []
    i = 0
    n = means.size
    w_so_far = 0.0
    while i < n:
        k_limit = _k1(w_so_far / total, compression) + 1.0
        if k_limit >= k_max:
            j = n - 1  # tail cluster absorbs everything left
        else:
            # k1 inverse: q = (sin(2π·k/δ) + 1) / 2
            w_max = total * 0.5 * (
                math.sin(2.0 * math.pi * k_limit / compression) + 1.0
            )
            # last point whose through-weight stays within the limit;
            # every cluster takes at least its first point
            j = max(int(np.searchsorted(csum, w_max, side="right")) - 1, i)
        seg_w = weights[i : j + 1]
        cw = float(seg_w.sum())
        out_m.append(float((means[i : j + 1] * seg_w).sum() / cw))
        out_w.append(cw)
        w_so_far += cw
        i = j + 1
    return np.asarray(out_m), np.asarray(out_w)
