"""Spectral Bloom filter kernel — the reference's declared-but-unimplemented
structure (``README.md:93-104``: "Spectral Bloom Filters — NOT IMPLEMENTED
YET ... remarkably similar to counting Bloom filters, but have different
logic for updating counters, querying the filter, removing/decreasing
elements, and methods of managing collisions").

Semantics follow the published algorithm (Cohen & Matias, "Spectral Bloom
Filters", SIGMOD 2003), the same way the Count-Min kernel follows
Cormode–Muthukrishnan for the reference's other declared-only structure:

- **Minimum Increase (MI) update** (§4.2): an insert of ``x`` increments only
  the counter(s) currently holding ``x``'s minimum.  MI is equivalent to the
  conservative-update heuristic (Estan & Varghese 2002) and dominates the
  plain counting-bloom update cell-wise: with identical geometry and seed,
  every SBF counter is ≤ the corresponding CountingBloomFilter counter after
  the same inserts, so point estimates are never looser.
- **Minimal Selection (MS) query** (§4.1): ``estimate(x) = min over x's k
  counters`` — one-sided, never undercounts.
- **Recurring Minimum (RM) collision management** (§4.3): items whose minimum
  is non-recurring (held by exactly one cell — the signature of a collision)
  are additionally tracked in a smaller secondary SBF hashed with an
  independent seed; ``estimate_rm`` consults it to shave collision-inflated
  estimates.
- **Deletion** (§4.2): the paper supports decrement only under the basic
  (non-MI) update, which in this library IS ``CountingBloomFilter.remove``;
  the MI filter cannot tell which cells to decrement, so ``remove`` raises
  with that pointer instead of corrupting state.

Batched vectorization (this library's Arrow-batch execution model): per
batch, duplicate keys are grouped by their full 128-bit hash (keys colliding
there are indistinguishable to the sketch anyway), each group's target is
computed from the pre-batch state as ``min + multiplicity``, and applied with
a max-scatter.  Every batch boundary is a valid MI linearization point, and
the one-sided guarantee is unconditional: after any batch, each of ``x``'s
cells ≥ pre-batch min + multiplicity ≥ total count of ``x``.

Distributed merge (no counterpart in the paper, which is single-filter):
element-wise **saturating add** of both counter arrays — associative and
commutative, so any merge ORDER of a fixed set of partials is
byte-identical, and the never-undercount bound is preserved
(``min_i(A_i+B_i) ≥ min_i A_i + min_i B_i ≥ count_A + count_B``).  Like
Misra–Gries (mg.py), the merged state is bound-preserving but NOT
byte-identical to a single sequential MI build — MI is placement-dependent.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.kernels.cbloom import _sat_add
from sketchlib.specs import SbfSpec

U64 = np.uint64


def _group_by_hash(h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group batch rows by full 128-bit hash: returns (uh1, uh2, counts)."""
    order = np.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    new = np.empty(h1s.size, dtype=bool)
    new[0] = True
    np.logical_or(h1s[1:] != h1s[:-1], h2s[1:] != h2s[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, h1s.size)).astype(np.uint64)
    return h1s[starts], h2s[starts], counts


class SpectralBloomFilter:
    spec_cls = SbfSpec

    def __init__(
        self,
        spec: SbfSpec,
        counters: np.ndarray | None = None,
        rm_counters: np.ndarray | None = None,
    ):
        self.spec = spec
        self.m = spec.m
        self.k = spec.k
        self.cap = spec.cap
        if counters is None:
            counters = np.zeros(spec.m, dtype=spec.dtype)
        if rm_counters is None:
            rm_counters = np.zeros(spec.rm_m, dtype=spec.dtype)
        assert counters.size == spec.m and rm_counters.size == spec.rm_m
        self.counters = counters
        self.rm_counters = rm_counters

    # -- ingest -----------------------------------------------------------
    def _pos(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return (mmh3.make_hashes(h1, h2, self.k) % U64(self.m)).astype(np.int64)

    def _rm_pos(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Secondary positions from the SAME 128-bit hash with the KM roles
        swapped (h2 + i·h1): an independent enough double-hash family for the
        collision-management sketch without a second hash pass over the
        batch (the paper only requires 'different hash functions')."""
        return (
            mmh3.make_hashes(h2, h1, self.spec.rm_k) % U64(self.spec.rm_m)
        ).astype(np.int64)

    def update(self, data: np.ndarray, offsets: np.ndarray, amount: int = 1) -> None:
        """Batched minimum-increase insert (Cohen–Matias §4.2; module
        docstring for the batch linearization argument)."""
        h1, h2 = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        self._update_from(h1, h2, amount)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, amount: int = 1) -> None:
        """Prehashed ingest (``spark/prehash.py``): caller-supplied 64-bit
        pair, spec.seed ignored; not bit-compatible with mmh3-built states."""
        self._update_from(mmh3.as_u64(h1), mmh3.as_u64(h2), amount)

    def _update_from(self, h1: np.ndarray, h2: np.ndarray, amount: int) -> None:
        if not h1.size:
            return
        uh1, uh2, counts = _group_by_hash(h1, h2)
        pos = self._pos(uh1, uh2)
        cur = self.counters[pos].astype(U64)
        rowmin = cur.min(axis=1)
        # rowmin + counts*amount can't wrap: counts*amount ≤ batch rows * amount
        inc = counts * U64(amount)
        target = np.minimum(rowmin + inc, U64(self.cap))
        target[target < rowmin] = U64(self.cap)  # wrap guard for 64-bit caps
        np.maximum.at(self.counters, pos, target[:, None].astype(self.counters.dtype))

        # RM maintenance: keys whose minimum is now non-recurring are echoed
        # into the secondary with their current (≥ true count) minimum.
        after = self.counters[pos]
        amin = after.min(axis=1)
        nonrec = (after == amin[:, None]).sum(axis=1) == 1
        if nonrec.any():
            rm_pos = self._rm_pos(uh1[nonrec], uh2[nonrec])
            np.maximum.at(
                self.rm_counters,
                rm_pos,
                amin[nonrec][:, None].astype(self.rm_counters.dtype),
            )

    def update_strings(self, keys, amount: int = 1) -> None:
        self.update(*mmh3.pack_strings(keys), amount=amount)

    def remove(self, *_args, **_kw):
        """Minimum-increase filters cannot decrement (Cohen–Matias §4.2: MI
        'does not handle deletions'); the basic-update spectral filter that
        does is exactly CountingBloomFilter.remove — use a CBloomSpec."""
        raise NotImplementedError(
            "MI spectral filters do not support deletion; use "
            "CountingBloomFilter (basic-update SBF) for remove/decrease"
        )

    # -- probe ------------------------------------------------------------
    def estimate(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Minimal-selection point estimate: min over the k counters
        (Cohen–Matias §4.1).  Never undercounts."""
        h1, h2 = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        mins = self.counters[self._pos(h1, h2)].min(axis=1)
        return mins if mins.dtype == U64 else mins.astype(np.int64)

    def estimate_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Prehashed MS point estimate — pairs with :meth:`update_hashes`."""
        pos = self._pos(mmh3.as_u64(h1), mmh3.as_u64(h2))
        mins = self.counters[pos].min(axis=1)
        return mins if mins.dtype == U64 else mins.astype(np.int64)

    # cbloom-compatible aliases so probe/query plumbing treats both alike
    count = estimate
    count_hashes = estimate_hashes

    def estimate_strings(self, keys) -> np.ndarray:
        return self.estimate(*mmh3.pack_strings(keys))

    count_strings = estimate_strings

    def estimate_rm(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Recurring-minimum estimate (Cohen–Matias §4.3): items with a
        recurring minimum answer from the primary; items whose minimum is
        non-recurring (collision signature) consult the secondary and take
        the smaller positive answer.  Errs strictly less often than MS on
        collision-heavy loads; under adversarial cross-partition interleaving
        the secondary can lag (module docstring), so the hard one-sided
        contract of this library is carried by :meth:`estimate`."""
        h1, h2 = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        cells = self.counters[self._pos(h1, h2)]
        amin = cells.min(axis=1)
        recurring = (cells == amin[:, None]).sum(axis=1) > 1
        sec = self.rm_counters[self._rm_pos(h1, h2)].min(axis=1)
        use_sec = (~recurring) & (sec > 0)
        out = np.where(use_sec, np.minimum(amin, sec), amin)
        return out if out.dtype == U64 else out.astype(np.int64)

    def estimate_rm_strings(self, keys) -> np.ndarray:
        return self.estimate_rm(*mmh3.pack_strings(keys))

    def contains(self, data, offsets) -> np.ndarray:
        h1, h2 = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        return (self.counters[self._pos(h1, h2)] > 0).all(axis=1)

    def contains_hashes(self, h1, h2) -> np.ndarray:
        """Prehashed membership — pairs with :meth:`update_hashes` builds."""
        pos = self._pos(mmh3.as_u64(h1), mmh3.as_u64(h2))
        return (self.counters[pos] > 0).all(axis=1)

    def contains_strings(self, keys) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys))

    # -- metrics ----------------------------------------------------------
    def saturation_count(self) -> int:
        return int(np.count_nonzero(self.counters))

    def saturation(self) -> float:
        return 100.0 * self.saturation_count() / self.m

    def clear(self) -> None:
        self.counters[:] = 0
        self.rm_counters[:] = 0

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "SpectralBloomFilter") -> "SpectralBloomFilter":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible spectral bloom filters")
        self.counters = _sat_add(self.counters, other.counters, self.cap).astype(
            self.counters.dtype
        )
        self.rm_counters = _sat_add(
            self.rm_counters, other.rm_counters, self.cap
        ).astype(self.rm_counters.dtype)
        return self

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        return self.counters.tobytes() + self.rm_counters.tobytes()

    @classmethod
    def deserialize(cls, spec: SbfSpec, blob: bytes) -> "SpectralBloomFilter":
        split = spec.m * spec.dtype.itemsize
        counters = np.frombuffer(blob[:split], dtype=spec.dtype).copy()
        rm = np.frombuffer(blob[split:], dtype=spec.dtype).copy()
        return cls(spec, counters, rm)
