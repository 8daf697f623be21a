"""Classic Bloom filter kernel — batch-vectorized numpy rebuild of the
reference's ``src/bloom.c`` (837 LoC) semantics.

Bit addressing is identical to the reference: position ``h_i % m``, byte
``pos / 8``, bit ``pos % 8`` (src/bloom.c:228-231, :299), hashes from
Kirsch–Mitzenmacher double hashing over one mmh3 x64_128 pass
(src/mmh3.c:308-315).  The bitmap for the C unit-test insertion sequence
("asdf","bar","foo" into (15, 0.01)) is byte-identical to the reference's
hexdump (FIXTURES.md §5).

Merge is bitwise OR (src/bloom.c:770-795) — associative, commutative,
idempotent, so ANY partition merge order yields the identical state
(north-rule requirement).  Intersect is bitwise AND (src/bloom.c:812-837;
approximate — inflates FPR, documented there too).

One deliberate divergence: ``bloom_estimate_false_positive_rate``
(src/bloom.c:201-218) feeds the set-bit count into the element-count formula
and returns 0.68 where the empirical FPR is 0.0099 (measured, BASELINE.md);
we implement the standard fill-based estimator ``(s/m)^k`` instead.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import BloomSpec


class BloomFilter:
    """Mergeable Bloom filter state over byte-string elements."""

    spec_cls = BloomSpec

    def __init__(self, spec: BloomSpec, bits: np.ndarray | None = None):
        self.spec = spec
        self.m = spec.m
        self.k = spec.k
        if bits is None:
            bits = np.zeros(spec.nbytes, dtype=np.uint8)
        assert bits.size == spec.nbytes
        self.bits = bits

    # -- ingest -----------------------------------------------------------
    def update(self, data: np.ndarray, offsets: np.ndarray) -> None:
        """Set the k bits of every element in the batch (bloom_add,
        src/bloom.c:336-352, set-at-a-time)."""
        self._add_at(mmh3.positions(data, offsets, self.k, self.m, self.spec.seed))

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Prehashed ingest (JVM xxhash64 pair, ``spark/prehash.py``): same
        KM ladder, caller-supplied hash family — NOT bit-compatible with
        mmh3-built states; spec.seed is ignored."""
        self._add_at(mmh3.positions_from_hashes(h1, h2, self.k, self.m))

    def _add_at(self, pos: np.ndarray) -> None:
        byte = pos >> 3
        bit = (pos & 7).astype(np.uint8)
        np.bitwise_or.at(self.bits, byte.ravel(), np.left_shift(np.uint8(1), bit.ravel()))

    def update_strings(self, keys: list[bytes | str]) -> None:
        self.update(*mmh3.pack_strings(keys))

    # -- probe ------------------------------------------------------------
    def contains(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Vectorized membership: all k bits set (bloom_lookup,
        src/bloom.c:290-309). Returns bool array."""
        return self._contains_at(
            mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
        )

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Prehashed membership — pair with :meth:`update_hashes` builds."""
        return self._contains_at(mmh3.positions_from_hashes(h1, h2, self.k, self.m))

    def _contains_at(self, pos: np.ndarray) -> np.ndarray:
        byte = pos >> 3
        bit = (pos & 7).astype(np.uint8)
        hit = (self.bits[byte] >> bit) & np.uint8(1)
        return hit.all(axis=1)

    def contains_strings(self, keys: list[bytes | str]) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys))

    def lookup_or_add(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Sequential test-and-set semantics batched per element
        (bloom_lookup_or_add, src/bloom.c:378-403): returns, per element,
        whether it was already present *at its point in the sequence* —
        duplicates later in the batch see earlier ones. The streaming-dedup
        primitive (exact Spark analog: dropDuplicates)."""
        pos = mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
        byte = pos >> 3
        mask = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        n = pos.shape[0]
        out = np.empty(n, dtype=bool)
        # first pass: which elements are already fully present vs the batch-start state?
        present0 = ((self.bits[byte] & mask) == mask).all(axis=1)
        # Elements present at batch start stay True regardless of order; the
        # rest depend on duplicates within the batch → resolve those exactly
        # with a per-first-occurrence scan on the (rare) non-present set.
        out[:] = present0
        pending = np.nonzero(~present0)[0]
        if pending.size:
            # group identical keys among pending by their hash row
            rows = pos[pending]
            _, first_idx, inv = np.unique(
                rows, axis=0, return_index=True, return_inverse=True
            )
            out[pending] = first_idx[inv] != np.arange(pending.size)
            # bitwise_or.at, not fancy |=: an element's k positions can share
            # a byte, and duplicate fancy-index writes drop all but one
            np.bitwise_or.at(self.bits, byte[pending].ravel(), mask[pending].ravel())
        return out

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Bitmap OR (bloom_merge, src/bloom.c:770-795)."""
        self._check(other)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        """Bitmap AND (bloom_intersect, src/bloom.c:812-837). Approximate:
        may overstate the true intersection (inflated FPR)."""
        self._check(other)
        np.bitwise_and(self.bits, other.bits, out=self.bits)
        return self

    def jaccard(self, other: "BloomFilter") -> float:
        """Jaccard similarity × 100 via popcount(AND)/popcount(OR)
        (bloom_estimate_intersection, src/bloom.c:253-275); -1.0 if
        incompatible, as the reference returns."""
        if not self.spec.compatible(other.spec):
            return -1.0
        both = int(np.unpackbits(self.bits & other.bits).sum())
        either = int(np.unpackbits(self.bits | other.bits).sum())
        return 100.0 * both / either if either else 0.0

    # -- metrics ----------------------------------------------------------
    def saturation_count(self) -> int:
        """Popcount of the bitmap (src/bloom.c:125-133)."""
        return int(np.unpackbits(self.bits).sum())

    def saturation(self) -> float:
        """% of bits set (src/bloom.c:147-152)."""
        return 100.0 * self.saturation_count() / self.m

    def clear(self) -> None:
        self.bits[:] = 0

    def clear_if_saturation_exceeds(self, threshold_pct: float) -> bool:
        """(src/bloom.c:170-179)"""
        if self.saturation() > threshold_pct:
            self.clear()
            return True
        return False

    def estimate_false_positive_rate(self) -> float:
        """Fill-based estimator (s/m)^k.  Deliberately NOT the reference's
        formula (src/bloom.c:201-218), which is measurably wrong — see
        module docstring."""
        s = self.saturation_count()
        return float((s / self.m) ** self.k)

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def deserialize(cls, spec: BloomSpec, blob: bytes) -> "BloomFilter":
        return cls(spec, np.frombuffer(blob, dtype=np.uint8).copy())

    def _check(self, other: "BloomFilter") -> None:
        if not self.spec.compatible(other.spec):
            raise ValueError(
                f"incompatible bloom filters: {self.spec} vs {other.spec}"
            )
