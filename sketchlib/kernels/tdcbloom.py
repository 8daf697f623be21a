"""Time-decaying *counting* Bloom filter kernel — event-time rebuild of
``src/tdcbloom.c`` (954 LoC): the "how many times in the last W seconds"
sketch (recency-weighted membership + frequency, keyed on ``ts`` —
BASELINE.json north_star).

Reference layout is an array of packed (counter, timestamp) entries
(src/tdcbloom.h:79-91, entry arithmetic src/tdcbloom.c:552-555); we use SoA —
a counter array and a tick array — same semantics, vectorizable.  Counter
semantics are the counting bloom's (saturating inc, floor-0 dec,
min-over-k count); tick semantics are TdBloom's, with one unification: the
reference stamps tdcbloom cells with raw ``now % width_max`` instead of the
rebased tick it uses in tdbloom (src/tdcbloom.c:488-499 vs src/tdbloom.c:293
— inconsistent); we rebase both on ``spec.start_time`` (SURVEY.md §2.5).

Count estimate (tdcbloom_count, src/tdcbloom.c:775-806): min over the k
counters, 0 if any cell is zero or stale as-of T.

Merge = saturating-add counters + freshest-tick-wins — associative; a cell's
merged (count, tick) equals the sequential result.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.kernels.cbloom import _sat_add, _scatter_sat_add
from sketchlib.specs import TdCBloomSpec


class TdCBloomFilter:
    spec_cls = TdCBloomSpec

    def __init__(
        self,
        spec: TdCBloomSpec,
        counters: np.ndarray | None = None,
        ticks: np.ndarray | None = None,
    ):
        self.spec = spec
        self.m = spec.m
        self.k = spec.k
        self.cap = spec.cap
        if counters is None:
            counters = np.zeros(self.m, dtype=spec.counter_np_dtype)
        if ticks is None:
            ticks = np.zeros(self.m, dtype=np.int32)
        self.counters = counters
        self.ticks = ticks  # unwrapped 1-based; 0 = empty (as in TdBloom)

    def _positions(self, data, offsets) -> np.ndarray:
        return mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)

    def _rel(self, ts_sec) -> np.ndarray:
        r = np.asarray(ts_sec, dtype=np.int64) - np.int64(self.spec.start_time)
        if (r < 0).any():
            raise ValueError("ts earlier than spec.start_time")
        if r.size and int(r.max()) >= 2**31 - 1:
            raise ValueError("ts span exceeds int32 ticks (>68 years)")
        return r

    # -- ingest -----------------------------------------------------------
    def update(self, data, offsets, ts_sec) -> None:
        """Increment k counters (saturating) and stamp k cells with the
        freshest event tick (tdcbloom_add, src/tdcbloom.c:543-557)."""
        pos = self._positions(data, offsets).ravel()
        tick = np.repeat((self._rel(ts_sec) + 1).astype(np.int32), self.k)
        _scatter_sat_add(self.counters, pos, 1, self.cap)
        np.maximum.at(self.ticks, pos, tick)

    def update_hashes(self, h1, h2, ts_sec) -> None:
        """Prehashed ingest (``spark/prehash.py``): caller-supplied KM pair,
        spec.seed ignored; not bit-compatible with mmh3-built states."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m).ravel()
        tick = np.repeat((self._rel(ts_sec) + 1).astype(np.int32), self.k)
        _scatter_sat_add(self.counters, pos, 1, self.cap)
        np.maximum.at(self.ticks, pos, tick)

    def update_strings(self, keys, ts_sec) -> None:
        data, off = mmh3.pack_strings(keys)
        self.update(data, off, np.asarray(ts_sec, dtype=np.int64))

    def remove(self, data, offsets) -> np.ndarray:
        """Decrement k counters, floor 0 (tdcbloom_remove,
        src/tdcbloom.c:736-747). Local-object op, sequential."""
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

    # -- probe (as-of T) --------------------------------------------------
    def _fresh(self, cells_ticks: np.ndarray, as_of: int) -> np.ndarray:
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (cells_ticks - 1)
        return (cells_ticks > 0) & (age >= 0) & (age <= self.spec.timeout)

    def count(self, data, offsets, as_of: int) -> np.ndarray:
        """Min over k counters; 0 if any cell zero or stale
        (tdcbloom_count, src/tdcbloom.c:775-806)."""
        pos = self._positions(data, offsets)
        fresh_all = self._fresh(self.ticks[pos], as_of).all(axis=1)
        est = self.counters[pos].min(axis=1).astype(np.int64)
        return np.where(fresh_all, est, 0)

    def count_strings(self, keys, as_of: int) -> np.ndarray:
        return self.count(*mmh3.pack_strings(keys), as_of=as_of)

    def count_hashes(self, h1, h2, as_of: int) -> np.ndarray:
        """Prehashed windowed point estimate — pairs with
        :meth:`update_hashes` builds."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m)
        fresh_all = self._fresh(self.ticks[pos], as_of).all(axis=1)
        est = self.counters[pos].min(axis=1).astype(np.int64)
        return np.where(fresh_all, est, 0)

    def contains(self, data, offsets, as_of: int) -> np.ndarray:
        """All k counters nonzero and fresh (tdcbloom_lookup,
        src/tdcbloom.c:584-610)."""
        pos = self._positions(data, offsets)
        nonzero = (self.counters[pos] > 0).all(axis=1)
        fresh = self._fresh(self.ticks[pos], as_of).all(axis=1)
        return nonzero & fresh

    def contains_hashes(self, h1, h2, as_of: int) -> np.ndarray:
        """Prehashed membership — pairs with :meth:`update_hashes` builds."""
        pos = mmh3.positions_from_hashes(h1, h2, self.k, self.m)
        nonzero = (self.counters[pos] > 0).all(axis=1)
        fresh = self._fresh(self.ticks[pos], as_of).all(axis=1)
        return nonzero & fresh

    def contains_strings(self, keys, as_of: int) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys), as_of=as_of)

    def has_expired(self, data, offsets, as_of: int) -> np.ndarray:
        """(tdcbloom_has_expired, src/tdcbloom.c:642-668)"""
        pos = self._positions(data, offsets)
        nonzero = (self.counters[pos] > 0).all(axis=1)
        stale_any = (~self._fresh(self.ticks[pos], as_of) & (self.ticks[pos] > 0)).any(axis=1)
        return nonzero & stale_any

    # -- maintenance ------------------------------------------------------
    def reset_if_expired(self, data, offsets, as_of: int) -> np.ndarray:
        """has_expired → add at ``as_of`` (counter increment + fresh stamp),
        per tdcbloom_reset_if_expired, src/tdcbloom.c:694-700 ('TODO test' in
        C).  Returns was-reset bools."""
        exp = self.has_expired(data, offsets, as_of)
        if exp.any():
            pos = self._positions(data, offsets)
            rows = pos[exp].ravel()
            tick = np.int32(int(as_of) - self.spec.start_time + 1)
            _scatter_sat_add(self.counters, rows, 1, self.cap)
            np.maximum.at(self.ticks, rows, tick)
        return exp

    def reset_if_expired_strings(self, keys, as_of: int) -> np.ndarray:
        return self.reset_if_expired(*mmh3.pack_strings(keys), as_of=as_of)

    def adjust_timeout(self, new_timeout: int, as_of: int) -> int:
        """Change the decay window and reap entries expired under the NEW
        policy (tdcbloom_adjust_timeout, src/tdcbloom.c:303-320) — the reap
        step is what a spec rebuild would lose.  The reference's modular
        elapsed-time arithmetic reduces to ``age > new_timeout`` on our
        unwrapped ticks.  Returns the number of reaped cells.  Note: the new
        spec may auto-pick a different timer width for compact export; the
        in-memory int32 ticks are unaffected."""
        import dataclasses

        self.spec = dataclasses.replace(self.spec, timeout=int(new_timeout))
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks.astype(np.int64) - 1)
        stale = (self.ticks > 0) & ((age < 0) | (age > int(new_timeout)))
        n = int(np.count_nonzero(stale))
        self.counters[stale] = 0
        self.ticks[stale] = 0
        return n

    def age_element(self, data, offsets, age_amount: int) -> np.ndarray:
        """Subtract ``age_amount`` seconds from each of an element's k cell
        timers (tdcbloom_age_element, src/tdcbloom.c:843-873; 'TODO: test' in
        C).  Walks cells in hash order and stops at the first zero counter,
        returning False — cells already walked STAY aged, exactly as the
        reference's early return leaves them.  Timer floor is 0 (reference:
        'expired. reset timer')."""
        pos = self._positions(data, offsets)
        out = np.empty(pos.shape[0], dtype=bool)
        amt = int(age_amount)
        for i in range(pos.shape[0]):
            ok = True
            for p in pos[i]:
                if self.counters[p] == 0:
                    ok = False
                    break
                t = int(self.ticks[p])
                self.ticks[p] = np.int32(t - amt) if t > amt else np.int32(0)
            out[i] = ok
        return out

    def age_element_strings(self, keys, age_amount: int) -> np.ndarray:
        return self.age_element(*mmh3.pack_strings(keys), age_amount=age_amount)

    def age_and_remove(self, max_age: int, as_of: int) -> int:
        """Zero counter+timer of every occupied cell older than ``max_age``
        as-of T (tdcbloom_age_and_remove, src/tdcbloom.c:893-918; 'TODO test'
        in C).  A zeroed timer (from age_element) counts as ancient, as the
        reference's ``now - 0`` does.  Returns cells removed."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks.astype(np.int64) - 1)
        kill = (self.counters > 0) & ((self.ticks == 0) | (age > int(max_age)))
        n = int(np.count_nonzero(kill))
        self.counters[kill] = 0
        self.ticks[kill] = 0
        return n

    def clear_expired(self, as_of: int) -> int:
        """Zero counter+tick of stale cells (tdcbloom_clear_expired,
        src/tdcbloom.c:214-233)."""
        stale = (self.ticks > 0) & ~self._fresh(self.ticks, as_of)
        n = int(np.count_nonzero(stale))
        self.counters[stale] = 0
        self.ticks[stale] = 0
        return n

    def count_expired(self, as_of: int) -> int:
        return int(np.count_nonzero((self.ticks > 0) & ~self._fresh(self.ticks, as_of)))

    def saturation_count(self, as_of: int) -> int:
        """Live entries: counter nonzero and fresh (src/tdcbloom.c:355-416)."""
        return int(np.count_nonzero((self.counters > 0) & self._fresh(self.ticks, as_of)))

    def get_average_count(self) -> float:
        nz = self.counters[self.counters > 0]
        return float(nz.mean()) if nz.size else 0.0

    def clear(self) -> None:
        self.counters[:] = 0
        self.ticks[:] = 0

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "TdCBloomFilter") -> "TdCBloomFilter":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible tdcbloom filters")
        self.counters = _sat_add(self.counters, other.counters, self.cap).astype(
            self.counters.dtype
        )
        np.maximum(self.ticks, other.ticks, out=self.ticks)
        return self

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        return self.counters.tobytes() + self.ticks.tobytes()

    @classmethod
    def deserialize(cls, spec: TdCBloomSpec, blob: bytes) -> "TdCBloomFilter":
        csize = spec.m * spec.counter_np_dtype.itemsize
        counters = np.frombuffer(blob[:csize], dtype=spec.counter_np_dtype).copy()
        ticks = np.frombuffer(blob[csize:], dtype=np.int32).copy()
        return cls(spec, counters, ticks)
