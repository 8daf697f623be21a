"""Count-Min sketch kernel (Cormode–Muthukrishnan 2005).

North-rule extension: the reference README declares Count-Min "NOT
IMPLEMENTED YET" (README.md:80-90) but specifies its contract — never
undercounts, slight overcount — which is exactly the min-of-counters
estimator its counting bloom already uses (src/cbloom.c:257-274).  This
kernel is the standard d×w construction: d independent rows, row ``i`` uses
the Kirsch–Mitzenmacher hash ``h1 + i·h2`` (one mmh3_x64_128 pass per batch,
same double-hashing scheme as the bloom family, src/mmh3.c:308-315).

Guarantee: overcount ≤ εN with probability ≥ 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
Merge = element-wise matrix add (associative/commutative; uint64 rows, no
saturation concern at any realistic N).  Cross-checkable against Spark's
``F.count_min_sketch``.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import CmsSpec

U64 = np.uint64


class CountMinSketch:
    spec_cls = CmsSpec

    def __init__(self, spec: CmsSpec, table: np.ndarray | None = None):
        self.spec = spec
        self.d = spec.depth
        self.w = spec.width
        if table is None:
            table = np.zeros((self.d, self.w), dtype=np.uint64)
        assert table.shape == (self.d, self.w)
        self.table = table
        # every ingested element adds `amount` to one cell of EACH row, so the
        # stream length N is the table sum divided by depth
        self.total = int(table.sum()) // self.d

    def _positions(self, data, offsets) -> np.ndarray:
        """(n, d) column indices; row i uses hash (h1 + i*h2) % w."""
        return (
            mmh3.hash_batch(data, offsets, self.d, self.spec.seed) % U64(self.w)
        ).astype(np.int64)

    def update(self, data: np.ndarray, offsets: np.ndarray, amount: int = 1) -> None:
        self._add_pos(self._positions(data, offsets), amount)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, amount: int = 1) -> None:
        """Prehashed ingest (``spark/prehash.py``) — same d-row KM scheme
        over a caller-supplied 64-bit pair; spec.seed is ignored."""
        self._add_pos(mmh3.positions_from_hashes(h1, h2, self.d, self.w), amount)

    def _add_pos(self, pos: np.ndarray, amount: int = 1) -> None:
        n = pos.shape[0]
        for i in range(self.d):
            hist = np.bincount(pos[:, i], minlength=self.w)
            if amount != 1:
                hist *= amount
            self.table[i] += hist.astype(U64)
        self.total += n * amount

    def update_strings(self, keys, amount: int = 1) -> None:
        self.update(*mmh3.pack_strings(keys), amount=amount)

    def estimate(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Point-frequency estimates: min over the d rows. One-sided — never
        undercounts."""
        return self._estimate_pos(self._positions(data, offsets))

    def estimate_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Prehashed point estimates — pair with :meth:`update_hashes`."""
        return self._estimate_pos(mmh3.positions_from_hashes(h1, h2, self.d, self.w))

    def _estimate_pos(self, pos: np.ndarray) -> np.ndarray:
        ests = np.empty(pos.shape, dtype=np.uint64)
        for i in range(self.d):
            ests[:, i] = self.table[i, pos[:, i]]
        return ests.min(axis=1).astype(np.int64)

    def estimate_strings(self, keys) -> np.ndarray:
        return self.estimate(*mmh3.pack_strings(keys))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible CMS sketches")
        self.table += other.table
        self.total += other.total
        return self

    def error_bound(self) -> float:
        """εN: the additive overcount bound at the current stream length."""
        return (np.e / self.w) * self.total

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, spec: CmsSpec, blob: bytes) -> "CountMinSketch":
        table = (
            np.frombuffer(blob, dtype=np.uint64).reshape(spec.depth, spec.width).copy()
        )
        return cls(spec, table)
