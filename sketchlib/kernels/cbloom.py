"""Counting Bloom filter kernel — numpy rebuild of ``src/cbloom.c`` (1083 LoC).

Counter semantics match the reference: width-parametric counters (4-bit
nibble-packed per src/cbloom.c:81,:173-196, or 8/16/32/64-bit), saturating
increments (clamp at width max, src/cbloom.c:186-216), floor-at-zero
decrements, and the min-over-k point-count estimator (cbloom_count,
src/cbloom.c:257-274) — which is exactly the count-min estimator, one-sided:
never undercounts, overcount rate ≈ p (measured 0.0105 at p=0.01,
BASELINE.md).

Distributed merge (no counterpart in the C library, which is single-filter):
element-wise **saturating add** with a wider intermediate dtype, clamped after
each merge — ``min(cap, a+b)`` is associative, so any partition merge order
yields identical counters (north-rule requirement; SURVEY.md §7 hard-part 4).

In-memory state is always the unpacked dtype array; 4-bit specs pack nibbles
only at (de)serialization, so updates stay vectorized.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import CBloomSpec


def _scatter_sat_add(counters: np.ndarray, pos: np.ndarray, amount: int, cap: int) -> None:
    """Saturating scatter-increment of ``counters[pos] += amount`` with
    duplicate positions.  np.bincount + full-array clamp — ~25x faster than
    np.add.at / unique for batch-sized inputs (measured); falls back to the
    unique path when the batch is tiny relative to m."""
    m = counters.size
    if pos.size * 16 < m:
        up, cnt = np.unique(pos, return_counts=True)
        counters[up] = _sat_add(
            counters[up], cnt.astype(np.uint64) * np.uint64(amount), cap
        ).astype(counters.dtype)
        return
    hist = np.bincount(pos, minlength=m).astype(np.uint64)
    if amount != 1:
        # cnt*amount can wrap uint64 for huge amounts; anything that would
        # wrap is ≥ cap by construction
        limit = (2**64 - 1) // int(amount)
        over = hist > limit
        hist *= np.uint64(amount)
        hist[over] = np.uint64(cap)
    counters[:] = _sat_add(counters, hist, cap).astype(counters.dtype)


def _sat_add(a: np.ndarray, b: np.ndarray, cap: int) -> np.ndarray:
    """Saturating uint64 add with wrap detection (needed for 64-bit counters,
    where a wider accumulator doesn't exist).  min(cap, a+b) is associative,
    so clamp-on-merge keeps merge-order invariance."""
    aw = a.astype(np.uint64)
    bw = np.asarray(b, dtype=np.uint64)
    s = aw + bw
    wrapped = s < aw
    s = np.minimum(s, np.uint64(cap))
    s[wrapped] = np.uint64(cap)
    return s


class CountingBloomFilter:
    spec_cls = CBloomSpec

    def __init__(self, spec: CBloomSpec, counters: np.ndarray | None = None):
        self.spec = spec
        self.m = spec.m
        self.k = spec.k
        self.cap = spec.cap
        if counters is None:
            counters = np.zeros(spec.m, dtype=spec.dtype)
        assert counters.size == spec.m
        self.counters = counters

    # -- ingest -----------------------------------------------------------
    def _positions(self, data, offsets) -> np.ndarray:
        return mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)

    def update(self, data: np.ndarray, offsets: np.ndarray, amount: int = 1) -> None:
        """Saturating increment of the k counters per element (cbloom_add,
        src/cbloom.c:419-429). Batch-safe: within-batch duplicate positions
        are histogrammed first, then added with a wide dtype and clamped —
        identical to sequential saturating adds."""
        pos = self._positions(data, offsets).ravel()
        _scatter_sat_add(self.counters, pos, amount, self.cap)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, amount: int = 1) -> None:
        """Prehashed ingest (``spark/prehash.py``): caller-supplied KM pair,
        spec.seed ignored; not bit-compatible with mmh3-built states."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m).ravel()
        _scatter_sat_add(self.counters, pos, amount, self.cap)

    def update_strings(self, keys, amount: int = 1) -> None:
        self.update(*mmh3.pack_strings(keys), amount=amount)

    def remove(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Decrement the k counters of each element, only when all k are
        nonzero (cbloom_remove, src/cbloom.c:556-576). Sequential per
        element to honor the all-nonzero guard; returns removed? bools.
        Local-object op — not part of the distributed aggregate path."""
        pos = self._positions(data, offsets)
        out = np.empty(pos.shape[0], dtype=bool)
        for i in range(pos.shape[0]):
            cells = self.counters[pos[i]]
            ok = bool((cells > 0).all())
            out[i] = ok
            if ok:
                self.counters[pos[i]] = cells - 1
        return out

    def remove_strings(self, keys) -> np.ndarray:
        return self.remove(*mmh3.pack_strings(keys))

    def clear_element(self, data, offsets) -> None:
        """Zero the k cells of each element (cbloom_clear_element,
        src/cbloom.c:805-818)."""
        pos = self._positions(data, offsets)
        self.counters[pos.ravel()] = 0

    def lookup_or_add(self, data, offsets) -> np.ndarray:
        """Check-then-increment (cbloom_lookup_or_add, src/cbloom.c:506-524):
        returns was-present bools; every position is incremented regardless,
        and — as in the reference's sequential loop — a position's check sees
        increments made earlier in the same call.  Local-object maintenance
        op (the distributed path uses update + contains)."""
        pos = self._positions(data, offsets)
        out = np.empty(pos.shape[0], dtype=bool)
        cap = self.cap
        for i in range(pos.shape[0]):
            present = True
            for p in pos[i]:
                if self.counters[p] == 0:
                    present = False
                if int(self.counters[p]) < cap:
                    self.counters[p] += 1
            out[i] = present
        return out

    def lookup_or_add_strings(self, keys) -> np.ndarray:
        return self.lookup_or_add(*mmh3.pack_strings(keys))

    def clear_if_count_above(self, data, offsets, threshold: int) -> np.ndarray:
        """If ANY of an element's k counters exceeds ``threshold``, zero all
        k (cbloom_clear_if_count_above, src/cbloom.c:598-622 — marked
        'TODO: test' there).  Sequential per element as the reference; returns
        cleared? bools."""
        pos = self._positions(data, offsets)
        out = np.empty(pos.shape[0], dtype=bool)
        for i in range(pos.shape[0]):
            cells = self.counters[pos[i]]
            hit = bool((cells > threshold).any())
            out[i] = hit
            if hit:
                self.counters[pos[i]] = 0
        return out

    def clear_if_count_above_strings(self, keys, threshold: int) -> np.ndarray:
        return self.clear_if_count_above(*mmh3.pack_strings(keys), threshold=threshold)

    # -- probe ------------------------------------------------------------
    def count(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Min over the k counters — the CMS-style point estimate
        (cbloom_count, src/cbloom.c:257-274). Never undercounts."""
        pos = self._positions(data, offsets)
        mins = self.counters[pos].min(axis=1)
        # keep uint64 for 64-bit counters (cap doesn't fit int64)
        return mins if mins.dtype == np.uint64 else mins.astype(np.int64)

    def count_strings(self, keys) -> np.ndarray:
        return self.count(*mmh3.pack_strings(keys))

    def count_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Prehashed min-of-k point estimate — pairs with
        :meth:`update_hashes` builds."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m)
        mins = self.counters[pos].min(axis=1)
        return mins if mins.dtype == np.uint64 else mins.astype(np.int64)

    def contains(self, data, offsets) -> np.ndarray:
        """All k counters nonzero (cbloom_lookup, src/cbloom.c:372-387)."""
        pos = self._positions(data, offsets)
        return (self.counters[pos] > 0).all(axis=1)

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Prehashed membership — pairs with :meth:`update_hashes` builds."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m)
        return (self.counters[pos] > 0).all(axis=1)

    def contains_strings(self, keys) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys))

    # -- metrics / maintenance -------------------------------------------
    def count_elements_above_threshold(self, threshold: int) -> int:
        """Cells above t, divided by k — rough heavy-element count
        (src/cbloom.c:310-321)."""
        return int(np.count_nonzero(self.counters > threshold) // self.k)

    def get_average_count(self) -> float:
        """Mean of nonzero counters (src/cbloom.c:337-354)."""
        nz = self.counters[self.counters > 0]
        return float(nz.mean()) if nz.size else 0.0

    def saturation_count(self) -> int:
        return int(np.count_nonzero(self.counters))

    def saturation(self) -> float:
        return 100.0 * self.saturation_count() / self.m

    def clear(self) -> None:
        self.counters[:] = 0

    def decay_linear(self, delta: int) -> None:
        """Subtract delta from every nonzero counter, floor 0
        (cbloom_apply_linear_decay, src/cbloom.c:664-679)."""
        wide = self.counters.astype(np.int64) - int(delta)
        self.counters = np.maximum(wide, 0).astype(self.counters.dtype)

    def decay_exponential(self, factor: float) -> None:
        """Multiply counters by factor ∈ [0,1], truncate
        (cbloom_apply_exponential_decay, src/cbloom.c:703-718)."""
        if not (0.0 <= factor <= 1.0):
            raise ValueError("factor must be in [0, 1]")
        self.counters = (self.counters.astype(np.float64) * factor).astype(
            self.counters.dtype
        )

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible counting bloom filters")
        self.counters = _sat_add(self.counters, other.counters, self.cap).astype(
            self.counters.dtype
        )
        return self

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        if self.spec.counter_bits == 4:
            c = self.counters
            if c.size % 2:
                c = np.concatenate([c, np.zeros(1, dtype=c.dtype)])
            packed = (c[0::2] & 0xF) | ((c[1::2] & 0xF) << 4)
            return packed.astype(np.uint8).tobytes()
        return self.counters.tobytes()

    @classmethod
    def deserialize(cls, spec: CBloomSpec, blob: bytes) -> "CountingBloomFilter":
        if spec.counter_bits == 4:
            packed = np.frombuffer(blob, dtype=np.uint8)
            c = np.empty(packed.size * 2, dtype=np.uint8)
            c[0::2] = packed & 0xF
            c[1::2] = packed >> 4
            return cls(spec, c[: spec.m].copy())
        return cls(spec, np.frombuffer(blob, dtype=spec.dtype).copy())
