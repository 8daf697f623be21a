"""Misra–Gries heavy-hitters summary — north-rule extension (no reference
counterpart; the reference's heavy-hitter answer is CMS point queries,
src/cbloom.c:257-274 semantics).

MG is the complementary guarantee to CMS: CMS never UNDERcounts (one-sided
overcount ≤ εN), MG never OVERcounts (one-sided undercount ≤ N/(k+1)), and
MG carries the keys themselves, so "top tools/roles" needs no candidate set.
Mergeable per Agarwal et al., "Mergeable Summaries" (PODS'12): merging two
summaries and re-trimming preserves the combined N/(k+1) bound.

IMPORTANT difference from every other kernel here: MG merge results are
bound-preserving but NOT byte-identical across merge orders (the trims
differ).  The one-sided bounds (never-overcount, undercount ≤ N_total/(k+1))
hold under ANY merge order — queries must check bounds, not exact state.

State: {mmh3_64(key): [count, key_bytes]} + the total trim offset (an upper
bound on any key's undercount).  Batch ingest is vectorized: hash → np.unique
counts; Python touches only the ≤(uniques-per-batch) summary mutations.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import MGSpec

U64 = np.uint64


class MisraGries:
    spec_cls = MGSpec

    def __init__(self, spec: MGSpec, entries: dict | None = None, offset_total: int = 0):
        self.spec = spec
        self.k = int(spec.k)
        # hash -> [count, key_bytes]
        self.entries: dict[int, list] = entries if entries is not None else {}
        # total amount trimmed away: >= any single key's undercount;
        # invariant: offset_total <= N_ingested / (k+1)
        self.offset_total = int(offset_total)

    # -- ingest -----------------------------------------------------------
    def update(self, data: np.ndarray, offsets: np.ndarray) -> None:
        h = mmh3.mmh3_x64_64(data, offsets, self.spec.seed).astype(np.uint64)
        uniq, first_idx, counts = np.unique(h, return_index=True, return_counts=True)
        ent = self.entries
        for hh, fi, c in zip(uniq.tolist(), first_idx.tolist(), counts.tolist()):
            e = ent.get(hh)
            if e is None:
                key = bytes(data[offsets[fi]:offsets[fi + 1]])
                ent[hh] = [int(c), key]
            else:
                e[0] += int(c)
        if len(ent) > self.k:
            self._trim()

    def update_strings(self, keys) -> None:
        self.update(*mmh3.pack_strings(keys))

    def _trim(self) -> None:
        """Subtract the (k+1)-th largest count from every entry and drop the
        non-positive — the batch form of MG's decrement-all step (Agarwal et
        al. §3.1); at most k entries survive."""
        counts = np.fromiter((e[0] for e in self.entries.values()), dtype=np.int64)
        if counts.size <= self.k:
            return
        thresh = int(np.partition(counts, counts.size - self.k - 1)[counts.size - self.k - 1])
        self.offset_total += thresh
        self.entries = {
            h: [c - thresh, key]
            for h, (c, key) in self.entries.items()
            if c - thresh > 0
        }

    # -- probe ------------------------------------------------------------
    def estimate(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Per-key count estimate: NEVER overcounts; undercount bounded by
        offset_total <= N/(k+1)."""
        h = mmh3.mmh3_x64_64(data, offsets, self.spec.seed).astype(np.uint64)
        ent = self.entries
        return np.fromiter(
            (ent.get(x, (0,))[0] for x in h.tolist()), dtype=np.int64, count=h.size
        )

    def estimate_strings(self, keys) -> np.ndarray:
        return self.estimate(*mmh3.pack_strings(keys))

    def heavy_hitters(self) -> list[tuple[bytes, int]]:
        """(key, estimate) sorted by count desc then key — every key with
        true count > N/(k+1) is guaranteed present."""
        return sorted(
            ((e[1], int(e[0])) for e in self.entries.values()),
            key=lambda t: (-t[1], t[0]),
        )

    def max_undercount(self) -> int:
        return self.offset_total

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible MG summaries")
        ent = self.entries
        for h, (c, key) in other.entries.items():
            e = ent.get(h)
            if e is None:
                ent[h] = [int(c), key]
            else:
                e[0] += int(c)
        self.offset_total += other.offset_total
        if len(ent) > self.k:
            self._trim()
        return self

    # -- serde (canonical: sorted by hash) ----------------------------------
    def serialize(self) -> bytes:
        hs = sorted(self.entries)
        n = len(hs)
        head = np.array([n, self.offset_total], dtype=np.uint64).tobytes()
        harr = np.array(hs, dtype=np.uint64).tobytes()
        carr = np.array([self.entries[h][0] for h in hs], dtype=np.int64).tobytes()
        keys = [self.entries[h][1] for h in hs]
        lens = np.array([len(k) for k in keys], dtype=np.uint32).tobytes()
        return head + harr + carr + lens + b"".join(keys)

    @classmethod
    def deserialize(cls, spec: MGSpec, blob: bytes) -> "MisraGries":
        n, offset_total = np.frombuffer(blob[:16], dtype=np.uint64)
        n = int(n)
        o = 16
        hs = np.frombuffer(blob[o:o + 8 * n], dtype=np.uint64); o += 8 * n
        cs = np.frombuffer(blob[o:o + 8 * n], dtype=np.int64); o += 8 * n
        ls = np.frombuffer(blob[o:o + 4 * n], dtype=np.uint32); o += 4 * n
        entries = {}
        for h, c, ln in zip(hs.tolist(), cs.tolist(), ls.tolist()):
            entries[h] = [int(c), blob[o:o + ln]]
            o += ln
        return cls(spec, entries, int(offset_total))
