"""Bottom-k (KMV, k-minimum-values) sketch — north-rule extension (no
reference counterpart; published construction: Bar-Yossef et al. 2002,
Beyer et al. SIGMOD'07).

Keeps the k smallest ``mmh3_64(key)`` values WITH their keys.  This buys
three things the training-data pipeline wants from one tiny state:

- a **deterministic uniform sample over DISTINCT keys** (hash order is a
  random permutation of the key space — the sample is reproducible across
  runs/partitionings, unlike reservoir sampling);
- a **cardinality estimate**: (k-1) * 2^64 / h_(k) with relative error
  ~ 1/sqrt(k-2);
- **set-overlap estimates** between two sketches (Jaccard from the shared
  bottom-k union, Beyer et al. §4) — the sample-based analog of
  bloom_estimate_intersection.

Unlike Misra–Gries, the merge here IS byte-identical under any merge order:
union of candidate sets → keep the k smallest (a deterministic function of
the union).  Serde is canonical (ascending hash).
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import BottomKSpec

U64 = np.uint64


class BottomK:
    spec_cls = BottomKSpec

    def __init__(self, spec: BottomKSpec, hashes: np.ndarray | None = None, keys: list | None = None):
        self.spec = spec
        self.k = int(spec.k)
        # ascending uint64 hashes + aligned key bytes; distinct hashes only
        self.hashes = hashes if hashes is not None else np.empty(0, dtype=U64)
        self.keys: list[bytes] = keys if keys is not None else []

    # -- ingest -----------------------------------------------------------
    def update(self, data: np.ndarray, offsets: np.ndarray) -> None:
        h = mmh3.mmh3_x64_64(data, offsets, self.spec.seed).astype(U64)
        uniq, first_idx = np.unique(h, return_index=True)
        if self.hashes.size:
            # drop hashes already tracked and those beyond the current k-th
            mask = ~np.isin(uniq, self.hashes)
            if self.hashes.size >= self.k:
                mask &= uniq < self.hashes[-1]
            uniq, first_idx = uniq[mask], first_idx[mask]
        if not uniq.size:
            return
        new_keys = [
            bytes(data[offsets[i]:offsets[i + 1]]) for i in first_idx.tolist()
        ]
        merged = np.concatenate([self.hashes, uniq])
        order = np.argsort(merged, kind="stable")[: self.k]
        all_keys = self.keys + new_keys
        self.hashes = merged[order]
        self.keys = [all_keys[i] for i in order.tolist()]

    def update_strings(self, keys) -> None:
        self.update(*mmh3.pack_strings(keys))

    # -- estimates ----------------------------------------------------------
    def distinct_estimate(self) -> float:
        """(k-1) * 2^64 / h_(k) (Beyer et al. unbiased KMV estimator); exact
        count when fewer than k distinct keys were seen."""
        if self.hashes.size < self.k:
            return float(self.hashes.size)
        return (self.k - 1) * 2.0**64 / float(self.hashes[-1] + 1)

    def sample(self) -> list[bytes]:
        """The deterministic distinct-key sample (ascending hash order)."""
        return list(self.keys)

    def contains_sample(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        h = mmh3.mmh3_x64_64(data, offsets, self.spec.seed).astype(U64)
        return np.isin(h, self.hashes)

    def jaccard(self, other: "BottomK") -> float:
        """Jaccard estimate from the bottom-k of the UNION (Beyer et al.
        §4.2): |both present in the union's bottom-k| / k."""
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible bottom-k sketches")
        union = np.union1d(self.hashes, other.hashes)[: self.k]
        if not union.size:
            return 0.0
        inter = np.isin(union, self.hashes) & np.isin(union, other.hashes)
        return float(inter.sum()) / float(union.size)

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "BottomK") -> "BottomK":
        """Union → keep k smallest: a deterministic function of the combined
        key set ⇒ byte-identical under any merge order."""
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible bottom-k sketches")
        if not other.hashes.size:
            return self
        merged = np.concatenate([self.hashes, other.hashes])
        all_keys = self.keys + other.keys
        order = np.argsort(merged, kind="stable")
        seen: set[int] = set()
        hs: list[int] = []
        ks: list[bytes] = []
        for i in order.tolist():
            hv = int(merged[i])
            if hv in seen:
                continue
            seen.add(hv)
            hs.append(hv)
            ks.append(all_keys[i])
            if len(hs) == self.k:
                break
        self.hashes = np.array(hs, dtype=U64)
        self.keys = ks
        return self

    # -- serde (canonical ascending-hash) -----------------------------------
    def serialize(self) -> bytes:
        n = self.hashes.size
        head = np.array([n], dtype=U64).tobytes()
        lens = np.array([len(k) for k in self.keys], dtype=np.uint32).tobytes()
        return head + self.hashes.tobytes() + lens + b"".join(self.keys)

    @classmethod
    def deserialize(cls, spec: BottomKSpec, blob: bytes) -> "BottomK":
        n = int(np.frombuffer(blob[:8], dtype=U64)[0])
        o = 8
        hashes = np.frombuffer(blob[o:o + 8 * n], dtype=U64).copy(); o += 8 * n
        lens = np.frombuffer(blob[o:o + 4 * n], dtype=np.uint32); o += 4 * n
        keys = []
        for ln in lens.tolist():
            keys.append(blob[o:o + ln]); o += ln
        return cls(spec, hashes, keys)
