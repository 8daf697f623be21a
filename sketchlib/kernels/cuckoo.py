"""Cuckoo filter kernel — corrected rebuild of ``src/cuckoo.c`` (301 LoC;
README.md:106-113 marks it "PARTIALLY IMPLEMENTED").

The reference's construction has four verified defects (SURVEY.md §2.6,
measured FPR 0.77 at 75% load instead of ≈2.4e-4):

1. fp and i1 both come from the low bits of one ``mmh3_32`` call
   (src/cuckoo.c:89-93) → correlated for power-of-two bucket counts.  Fixed:
   bucket index from the mmh3_128 ``h1`` lane, fingerprint from the high 16
   bits of the ``h2`` lane — independent.
2. Eviction re-index ``(index ^ fp) % buckets`` (src/cuckoo.c:117) disagrees
   with lookup's ``i1 ^ (fp>>1)`` (src/cuckoo.c:139) → unfindable relocated
   fingerprints.  Fixed: one partner function ``alt(i, fp) = i ^ H(fp)``
   (Fan et al., CoNEXT'14), involutive over a power-of-two bucket count
   (``num_buckets`` is rounded up internally).
3. Filter passed by value so insertion/eviction counters are lost
   (src/cuckoo.c:89). N/A in Python.
4. fp == 0 indistinguishable from an empty slot (src/cuckoo.c:78) → silent
   no-op inserts.  Fixed: remap fp 0 → 1.

The eviction PRNG is xorshift32 like the reference (src/cuckoo.c:31-39) but
seeded from ``spec.seed`` instead of the wall clock — deterministic, a
reproducibility requirement.

Acceptance: published bound FPR ≈ 2·bucket_size/2^fp_bits at moderate load
(≈1.2e-4 for 4×16-bit), zero false negatives for retained keys.

Distribution note: cuckoo filters do not merge by cell-wise algebra.  The
Spark layer prefers key-partitioned shards (probe routes by the same key
hash); ``merge`` here re-inserts the other filter's occupied slots and raises
if capacity overflows (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import CuckooSpec

U32 = np.uint32
U64 = np.uint64
_H_FP = np.uint64(0x5BD1E995)  # small multiplicative mix for alt-bucket hash


def _next_pow2(x: int) -> int:
    return 1 << (max(1, x) - 1).bit_length()


class CuckooFilter:
    spec_cls = CuckooSpec

    def __init__(self, spec: CuckooSpec, table: np.ndarray | None = None):
        self.spec = spec
        self.nb = _next_pow2(spec.num_buckets)
        self.bs = spec.bucket_size
        self.fp_mask = (1 << spec.fp_bits) - 1
        if table is None:
            table = np.zeros((self.nb, self.bs), dtype=np.uint16 if spec.fp_bits <= 16 else np.uint32)
        self.table = table
        self._prng = U32(spec.seed & 0xFFFFFFFF) or U32(0x9E3779B9)

    # -- hashing ----------------------------------------------------------
    def _index_fp(self, data, offsets) -> tuple[np.ndarray, np.ndarray]:
        h1, h2 = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        i1 = (h1 & U64(self.nb - 1)).astype(np.int64)
        fp = ((h2 >> U64(64 - self.spec.fp_bits)) & U64(self.fp_mask)).astype(np.int64)
        fp[fp == 0] = 1  # defect-4 fix
        return i1, fp

    def _alt(self, i: np.ndarray | int, fp: np.ndarray | int):
        """Partner bucket: i ^ H(fp), involutive over power-of-two nb."""
        return (np.int64(i) ^ ((np.int64(fp) * np.int64(_H_FP)) & np.int64(self.nb - 1))) & np.int64(
            self.nb - 1
        )

    def _rand(self) -> int:
        """xorshift32 (as the reference's eviction PRNG, src/cuckoo.c:31-39)."""
        x = int(self._prng)
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        self._prng = U32(x)
        return x

    # -- ingest -----------------------------------------------------------
    def update(self, data, offsets) -> np.ndarray:
        """Insert a batch; returns per-element success bools (False only on
        eviction-budget exhaustion — caller should treat as overflow)."""
        i1s, fps = self._index_fp(data, offsets)
        out = np.empty(i1s.size, dtype=bool)
        for j in range(i1s.size):
            out[j] = self._insert_one(int(i1s[j]), int(fps[j]))
        return out

    def update_strings(self, keys) -> np.ndarray:
        return self.update(*mmh3.pack_strings(keys))

    def _insert_one(self, i1: int, fp: int) -> bool:
        for i in (i1, int(self._alt(i1, fp))):
            row = self.table[i]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                return True
        # evict (src/cuckoo.c:106-122 loop shape, corrected partner function)
        i = i1
        for _ in range(self.spec.max_kicks):
            slot = self._rand() % self.bs
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(self._alt(i, fp))
            row = self.table[i]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                return True
        return False

    # -- probe ------------------------------------------------------------
    def contains(self, data, offsets) -> np.ndarray:
        """fp present in bucket i1 or i2 (cuckoo_lookup, src/cuckoo.c:132-152),
        fully vectorized."""
        i1s, fps = self._index_fp(data, offsets)
        i2s = self._alt(i1s, fps)
        fpcol = fps[:, None].astype(self.table.dtype)
        hit1 = (self.table[i1s] == fpcol).any(axis=1)
        hit2 = (self.table[i2s] == fpcol).any(axis=1)
        return hit1 | hit2

    def contains_strings(self, keys) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys))

    def remove(self, data, offsets) -> np.ndarray:
        """Zero the first matching fp in i1 else i2 (cuckoo_remove,
        src/cuckoo.c:178-193)."""
        i1s, fps = self._index_fp(data, offsets)
        out = np.empty(i1s.size, dtype=bool)
        for j in range(i1s.size):
            fp = self.table.dtype.type(fps[j])
            done = False
            for i in (int(i1s[j]), int(self._alt(int(i1s[j]), int(fps[j])))):
                hits = np.nonzero(self.table[i] == fp)[0]
                if hits.size:
                    self.table[i, hits[0]] = 0
                    done = True
                    break
            out[j] = done
        return out

    def remove_strings(self, keys) -> np.ndarray:
        return self.remove(*mmh3.pack_strings(keys))

    # -- metrics / algebra -------------------------------------------------
    def load_factor(self) -> float:
        """Occupancy % (cuckoo_load_factor, src/cuckoo.c:199-202 — which
        always prints 0 in the reference due to defect 3)."""
        return 100.0 * int(np.count_nonzero(self.table)) / self.table.size

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Re-insert the other filter's occupied (bucket, fp) slots.  A slot's
        stored bucket is one of the fp's two legal buckets, so re-inserting at
        that bucket (falling back to its partner / eviction) preserves
        membership.  Raises on overflow — at scale prefer key-partitioned
        shards (SURVEY.md §7 hard-part 3)."""
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible cuckoo filters")
        buckets, slots = np.nonzero(other.table)
        for b, s in zip(buckets.tolist(), slots.tolist()):
            if not self._insert_one(int(b), int(other.table[b, s])):
                raise OverflowError(
                    "cuckoo merge overflow — use key-partitioned shards"
                )
        return self

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, spec: CuckooSpec, blob: bytes) -> "CuckooFilter":
        nb = _next_pow2(spec.num_buckets)
        dt = np.uint16 if spec.fp_bits <= 16 else np.uint32
        table = np.frombuffer(blob, dtype=dt).reshape(nb, spec.bucket_size).copy()
        return cls(spec, table)
