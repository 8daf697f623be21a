"""KLL rank/quantile sketch (Karnin–Lang–Liberty, FOCS 2016) — north-rule
extension (no counterpart in the reference C library).

Standard compactor construction over float64 values: level ``i`` holds items
of weight ``2^i``; when a level exceeds its capacity ``max(ceil(k * c^(H-i)),
MIN_CAP)`` (c = 2/3) it is sorted and every other item — random parity — is
promoted.  Rank error ε ≈ O(1/k) with high probability; for k=200 roughly
1.65% at 99% confidence (matching the published bound quoted in SURVEY.md
§2.9).

Randomness: the compaction parity comes from a counter-keyed xorshift of
``spec.seed`` — deterministic for a fixed ingest/merge sequence (no
wall-clock entropy).  Unlike the linear sketches (bloom/CMS/HLL), merged
states are NOT byte-identical across merge orders; the ε bound is the
guarantee (documented, BASELINE.md).
"""

from __future__ import annotations

import numpy as np

from sketchlib.specs import KllSpec

_C = 2.0 / 3.0
_MIN_CAP = 8


class KllSketch:
    spec_cls = KllSpec

    def __init__(self, spec: KllSpec, levels: list[np.ndarray] | None = None, n: int = 0):
        self.spec = spec
        self.k = spec.k
        self.levels: list[np.ndarray] = levels if levels is not None else [
            np.empty(0, dtype=np.float64)
        ]
        self.n = n
        self._rng_counter = 0

    # -- capacity ---------------------------------------------------------
    def _cap(self, level: int) -> int:
        height = len(self.levels)
        return max(int(np.ceil(self.k * _C ** (height - 1 - level))), _MIN_CAP)

    def _coin(self) -> int:
        """Deterministic fair coin: counter-keyed xorshift64* of the seed."""
        self._rng_counter += 1
        x = (self.spec.seed * 0x9E3779B97F4A7C15 + self._rng_counter) & (2**64 - 1)
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        x ^= x >> 27
        return int(x & 1)

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if self.levels[i].size <= self._cap(i):
                i += 1
                continue
            buf = np.sort(self.levels[i])
            start = self._coin()
            promoted = buf[start::2]
            kept = np.empty(0, dtype=np.float64)
            self.levels[i] = kept
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            # capacities shrink when height grows; restart from this level
        # (single pass is fine: promotions only move mass upward)

    # -- ingest -----------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not v.size:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += v.size
        self._compact()

    def merge(self, other: "KllSketch") -> "KllSketch":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible KLL sketches")
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compact()
        return self

    # -- queries ----------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for i, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        """Value at rank ⌈q·n⌉."""
        it, w = self._weighted()
        if not it.size:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        idx = int(np.searchsorted(cw, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        it, w = self._weighted()
        if not it.size:
            return [float("nan")] * len(qs)
        cw = np.cumsum(w)
        out = []
        for q in qs:
            idx = int(np.searchsorted(cw, q * cw[-1], side="left"))
            out.append(float(it[min(idx, it.size - 1)]))
        return out

    def rank(self, x: float) -> float:
        """Estimated normalized rank of x (fraction of mass ≤ x)."""
        it, w = self._weighted()
        if not it.size:
            return float("nan")
        mask = it <= x
        return float(w[mask].sum() / w.sum())

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        import struct

        parts = [struct.pack("<qq", self.n, len(self.levels))]
        for lv in self.levels:
            parts.append(struct.pack("<q", lv.size))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, spec: KllSpec, blob: bytes) -> "KllSketch":
        import struct

        n, nlev = struct.unpack_from("<qq", blob, 0)
        off = 16
        levels = []
        for _ in range(nlev):
            (sz,) = struct.unpack_from("<q", blob, off)
            off += 8
            levels.append(np.frombuffer(blob, dtype=np.float64, count=sz, offset=off).copy())
            off += sz * 8
        return cls(spec, levels, n)
