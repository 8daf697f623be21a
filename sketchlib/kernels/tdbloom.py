"""Time-decaying Bloom filter kernel — event-time rebuild of ``src/tdbloom.c``
(735 LoC).

The reference stamps each element's k cells with a wall-clock tick relative
to filter creation (CLOCK_MONOTONIC, src/tdbloom.c:58-64), stored wrapped
1-based: ``tick = ((now - start) % max_time + max_time) % max_time + 1``
(src/tdbloom.c:293); lookup treats a cell fresh iff
``((now_tick - cell + max_time) % max_time) <= timeout`` (src/tdbloom.c:357-358)
with a whole-filter guard ``now - start > max_time → absent``
(src/tdbloom.c:342).

Deliberate deviation (SURVEY.md §7 hard-part 2): ticks come from the data's
``ts`` column (epoch seconds) relative to ``spec.start_time``, and probes take
an explicit as-of time ``T`` — results are a pure function of (data, spec, T),
deterministic and replayable on a cluster.  The same modular formulas are
reproduced on the wrapped export; in memory we keep the *unwrapped* relative
tick in int32 (0 = empty, else ``(ts - start_time) + 1``; spans up to 68
years), which makes

    merge = element-wise max  (freshest-tick-wins)

exactly associative/commutative — the C library has no tdbloom merge at all
(SURVEY.md §2.4 note), this is the distributed extension.  ``compact_state()``
exports the C-width wrapped array (1/2/4/8-byte cells per the reference's
width auto-pick, src/tdbloom.c:92-102) for parity checks and compact storage.

The reference's save/load are broken in C (header omits max_time/timeout and
the success path returns an error, src/tdbloom.c:556-560, :651-652 — verified
in SURVEY.md §2.4); we do not reproduce that.
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import TdBloomSpec


class TdBloomFilter:
    spec_cls = TdBloomSpec

    def __init__(self, spec: TdBloomSpec, ticks: np.ndarray | None = None):
        self.spec = spec
        self.m = spec.m
        self.k = spec.k
        if ticks is None:
            ticks = np.zeros(self.m, dtype=np.int32)
        assert ticks.size == self.m
        self.ticks = ticks  # unwrapped: 0 empty, else (ts - start_time) + 1

    # -- time helpers -----------------------------------------------------
    def _rel(self, ts_sec: np.ndarray) -> np.ndarray:
        r = np.asarray(ts_sec, dtype=np.int64) - np.int64(self.spec.start_time)
        if (r < 0).any():
            raise ValueError("ts earlier than spec.start_time")
        if r.size and int(r.max()) >= 2**31 - 1:
            raise ValueError("ts span exceeds int32 ticks (>68 years)")
        return r

    # -- ingest -----------------------------------------------------------
    def update(self, data: np.ndarray, offsets: np.ndarray, ts_sec: np.ndarray) -> None:
        """Stamp the k cells of each element with its event-time tick;
        freshest write wins per cell (tdbloom_add, src/tdbloom.c:289-306 —
        there last-writer-wins equals freshest because wall clock is
        monotone; with event time we take max explicitly)."""
        pos = mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
        self._stamp(pos, ts_sec)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, ts_sec: np.ndarray) -> None:
        """Prehashed ingest (``spark/prehash.py``): same stamping over a
        caller-supplied KM pair; spec.seed is ignored and the state is not
        bit-compatible with mmh3-built filters."""
        self._stamp(mmh3.positions_from_hashes(h1, h2, self.k, self.m), ts_sec)

    def _stamp(self, pos: np.ndarray, ts_sec: np.ndarray) -> None:
        tick = (self._rel(ts_sec) + 1).astype(np.int32)
        np.maximum.at(self.ticks, pos.ravel(), np.repeat(tick, self.k))

    def update_strings(self, keys, ts_sec) -> None:
        data, off = mmh3.pack_strings(keys)
        self.update(data, off, np.asarray(ts_sec, dtype=np.int64))

    # -- probe (as-of T) --------------------------------------------------
    def _cells(self, data, offsets) -> np.ndarray:
        pos = mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
        return self.ticks[pos]

    def contains(self, data, offsets, as_of: int) -> np.ndarray:
        """All k cells nonzero AND within ``timeout`` of ``as_of``
        (tdbloom_lookup, src/tdbloom.c:336-364). Mirrors the whole-filter
        age guard (:342): if as_of - start_time > max_time, everything is
        reported absent."""
        return self._contains_cells(
            len(offsets) - 1, lambda: self._cells(data, offsets), as_of
        )

    def contains_hashes(self, h1, h2, as_of: int) -> np.ndarray:
        """Prehashed membership — pair with :meth:`update_hashes` builds."""
        return self._contains_cells(
            len(np.asarray(h1)),
            lambda: self.ticks[mmh3.positions_from_hashes(h1, h2, self.k, self.m)],
            as_of,
        )

    def _contains_cells(self, n: int, cells_fn, as_of: int) -> np.ndarray:
        T = int(as_of) - self.spec.start_time
        if T > self.spec.max_time:
            return np.zeros(n, dtype=bool)
        cells = cells_fn()
        age = np.int64(T) - (cells - 1)
        fresh = (cells > 0) & (age >= 0) & (age <= self.spec.timeout)
        return fresh.all(axis=1)

    def contains_strings(self, keys, as_of: int) -> np.ndarray:
        return self.contains(*mmh3.pack_strings(keys), as_of=as_of)

    def has_expired(self, data, offsets, as_of: int) -> np.ndarray:
        """Element was present but is now stale: all k cells nonzero, any
        stale (tdbloom_has_expired, src/tdbloom.c:399-424)."""
        cells = self._cells(data, offsets)
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (cells - 1)
        nonzero = (cells > 0).all(axis=1)
        stale = ((age < 0) | (age > self.spec.timeout)) & (cells > 0)
        return nonzero & stale.any(axis=1)

    def last_access_time(self, data, offsets) -> np.ndarray:
        """Epoch seconds of the freshest consistent stamp: min over the k
        cells (an element's own stamp is the min; larger values are
        collisions from fresher elements).  Implements the reference's
        declared-but-never-defined ``tdbloom_get_last_access_time``
        (src/tdbloom.h:117-151).  Returns -1 where absent."""
        cells = self._cells(data, offsets)
        mn = cells.min(axis=1)
        out = np.where(mn > 0, mn - 1 + self.spec.start_time, -1)
        return out.astype(np.int64)

    def was_active_within(self, data, offsets, start: int, end: int) -> np.ndarray:
        """Declared-only in the reference header; natural here: last access
        ∈ [start, end]."""
        la = self.last_access_time(data, offsets)
        return (la >= start) & (la <= end)

    # -- declared-only reference TODOs, implemented as extensions ----------
    # (src/tdbloom.h declares lookup_or_add / adjust_timeout / age_element /
    # expire_older_than / get_average_lifetime but tdbloom.c never defines
    # them; semantics below follow the tdcbloom counterparts where those
    # exist.  expire_below_count / expire_by_frequency are ALSO declared but
    # require per-element counters a plain tdbloom does not store — the
    # counting variants live on TdCBloomFilter/CountingBloomFilter
    # (age_and_remove, clear_if_count_above).)

    def lookup_or_add(self, data, offsets, as_of: int) -> np.ndarray:
        """Fresh membership as-of T, stamping every probed element at T
        (declared-only tdbloom_lookup_or_add, src/tdbloom.h): returns
        WAS-ALREADY-PRESENT bools (True = the key read as fresh-present
        before this call); probed keys are (re)stamped regardless, like
        bloom_lookup_or_add's unconditional insert."""
        present = self.contains(data, offsets, as_of)
        self.update(
            data, offsets, np.full(len(offsets) - 1, int(as_of), dtype=np.int64)
        )
        return present

    def lookup_or_add_strings(self, keys, as_of: int) -> np.ndarray:
        return self.lookup_or_add(*mmh3.pack_strings(keys), as_of=as_of)

    def adjust_timeout(self, new_timeout: int, as_of: int) -> int:
        """Change the decay window and reap cells expired under the NEW
        policy (declared-only in tdbloom.h; semantics of the defined
        tdcbloom_adjust_timeout, src/tdcbloom.c:303-320).  Returns reaped
        cells."""
        import dataclasses

        self.spec = dataclasses.replace(self.spec, timeout=int(new_timeout))
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks.astype(np.int64) - 1)
        stale = (self.ticks > 0) & ((age < 0) | (age > int(new_timeout)))
        n = int(np.count_nonzero(stale))
        self.ticks[stale] = 0
        return n

    def age_element(self, data, offsets, age_amount: int) -> np.ndarray:
        """Subtract ``age_amount`` seconds from an element's k cell timers
        (declared-only; tdcbloom_age_element semantics minus counters):
        walks cells in hash order, stops at the first EMPTY cell returning
        False (walked cells stay aged), floors timers at 0."""
        pos = mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
        out = np.empty(pos.shape[0], dtype=bool)
        amt = int(age_amount)
        for i in range(pos.shape[0]):
            ok = True
            for p in pos[i]:
                t = int(self.ticks[p])
                if t == 0:
                    ok = False
                    break
                self.ticks[p] = np.int32(t - amt) if t > amt else np.int32(0)
            out[i] = ok
        return out

    def age_element_strings(self, keys, age_amount: int) -> np.ndarray:
        return self.age_element(*mmh3.pack_strings(keys), age_amount=age_amount)

    def expire_older_than(self, max_age: int, as_of: int) -> int:
        """Zero every occupied cell older than ``max_age`` as-of T
        (declared-only tdbloom_expire_older_than; the filter-wide analog of
        clear_expired with an explicit age bound).  Returns cells expired."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks.astype(np.int64) - 1)
        kill = (self.ticks > 0) & (age > int(max_age))
        n = int(np.count_nonzero(kill))
        self.ticks[kill] = 0
        return n

    def get_average_lifetime(self, as_of: int) -> float:
        """Mean age (seconds) of the LIVE cells as-of T (declared-only
        tdbloom_get_average_lifetime); 0.0 when nothing is live."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks.astype(np.int64) - 1)
        live = (self.ticks > 0) & (age >= 0) & (age <= self.spec.timeout)
        return float(age[live].mean()) if live.any() else 0.0

    # -- maintenance ------------------------------------------------------
    def reset_if_expired(self, data, offsets, as_of: int) -> np.ndarray:
        """Re-stamp expired elements at ``as_of`` (tdbloom_reset_if_expired,
        src/tdbloom.c:462-469: has_expired → add(now); 'TODO: test' in C).
        ``as_of`` plays the reference's wall-clock 'now' in the event-time
        model.  Returns was-reset bools."""
        exp = self.has_expired(data, offsets, as_of)
        if exp.any():
            pos = mmh3.positions(data, offsets, self.k, self.m, self.spec.seed)
            tick = np.int32(int(as_of) - self.spec.start_time + 1)
            np.maximum.at(self.ticks, pos[exp].ravel(), tick)
        return exp

    def reset_if_expired_strings(self, keys, as_of: int) -> np.ndarray:
        return self.reset_if_expired(*mmh3.pack_strings(keys), as_of=as_of)

    def count_expired(self, as_of: int) -> int:
        """Stale nonzero cells (tdbloom_count_expired, src/tdbloom.c:219-240)."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks - 1)
        return int(np.count_nonzero((self.ticks > 0) & ((age < 0) | (age > self.spec.timeout))))

    def clear_expired(self, as_of: int) -> int:
        """Zero stale cells, return reaped count (tdbloom_clear_expired,
        src/tdbloom.c:179-207). Run at checkpoint compaction."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks - 1)
        stale = (self.ticks > 0) & ((age < 0) | (age > self.spec.timeout))
        n = int(np.count_nonzero(stale))
        self.ticks[stale] = 0
        return n

    def saturation_count(self, as_of: int) -> int:
        """Number of live cells — nonzero and fresh as of ``as_of``
        (src/tdbloom.h:117: declared-only TODO in the reference; the count
        underlying the % variant at src/tdbloom.c:255-276)."""
        T = int(as_of) - self.spec.start_time
        age = np.int64(T) - (self.ticks - 1)
        live = (self.ticks > 0) & (age >= 0) & (age <= self.spec.timeout)
        return int(np.count_nonzero(live))

    def saturation(self, as_of: int) -> float:
        """% of cells live — nonzero and fresh (src/tdbloom.c:255-276)."""
        return 100.0 * self.saturation_count(as_of) / self.m

    def clear(self) -> None:
        self.ticks[:] = 0

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "TdBloomFilter") -> "TdBloomFilter":
        """Freshest-tick-wins: element-wise max on unwrapped ticks —
        associative/commutative by construction (SURVEY.md §2.4 note)."""
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible tdbloom filters")
        np.maximum(self.ticks, other.ticks, out=self.ticks)
        return self

    # -- serde ------------------------------------------------------------
    def serialize(self) -> bytes:
        return self.ticks.tobytes()

    @classmethod
    def deserialize(cls, spec: TdBloomSpec, blob: bytes) -> "TdBloomFilter":
        return cls(spec, np.frombuffer(blob, dtype=np.int32).copy())

    def compact_state(self) -> np.ndarray:
        """The C-parity wrapped array: dtype from the reference's width
        auto-pick, values ``((tick-1) % max_time) + 1`` (src/tdbloom.c:293),
        0 where empty."""
        wrapped = np.where(
            self.ticks > 0,
            ((self.ticks - 1) % np.int64(self.spec.max_time)) + 1,
            0,
        )
        return wrapped.astype(self.spec.dtype)
