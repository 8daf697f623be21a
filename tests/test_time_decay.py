"""Time-decaying filters: ported reference tests with wall-clock rewinds
replaced by explicit as-of times (FIXTURES.md §5 note), plus merge algebra.

The C tests simulate expiry by rewinding ``start_time`` (e.g.
``tf.start_time -= 3`` in tests/test_tdbloom_basic.c:51-66); the event-time
equivalent is probing with ``as_of = T + 3``."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import TdBloomFilter, TdCBloomFilter
from sketchlib.specs import TdBloomSpec, TdCBloomSpec


BASE = 1_700_000_000  # arbitrary epoch base


def test_tdbloom_expiry():
    """tests/test_tdbloom_basic.c:20-74: timeout=2; present at T, absent at
    T+3 (the C test rewinds start_time by 3); fresh re-add visible."""
    spec = TdBloomSpec(10, 0.01, timeout=2, start_time=BASE)
    tf = TdBloomFilter(spec)
    tf.update_strings(["a", "b"], [BASE + 1, BASE + 1])
    assert tf.contains_strings(["a", "b"], as_of=BASE + 1).all()
    assert tf.contains_strings(["a", "b"], as_of=BASE + 3).all()  # age 2 == timeout
    assert not tf.contains_strings(["a", "b"], as_of=BASE + 4).any()  # age 3 > 2
    # re-add after expiry
    tf.update_strings(["c"], [BASE + 4])
    assert tf.contains_strings(["c"], as_of=BASE + 4).all()
    assert tf.has_expired(*_pack(["a"]), as_of=BASE + 4).all()


def test_tdbloom_long_window():
    """tests/test_tdbloom_basic.c:76-96: timeout=200, rewind 270 → absent;
    restore → fresh adds visible.  timeout=200 picks the uint8 timer
    (max_time=255), so T=280 also trips the whole-filter age guard — exactly
    as the rewound C filter does; "restoring" start_time in event-time terms
    is re-basing the epoch."""
    spec = TdBloomSpec(10, 0.01, timeout=200, start_time=BASE)
    tf = TdBloomFilter(spec)
    tf.update_strings(["x"], [BASE + 10])
    assert tf.contains_strings(["x"], as_of=BASE + 100).all()
    assert not tf.contains_strings(["x"], as_of=BASE + 10 + 270).any()
    # restore: re-based epoch, fresh adds visible
    spec2 = TdBloomSpec(10, 0.01, timeout=200, start_time=BASE + 200)
    tf2 = TdBloomFilter(spec2)
    tf2.update_strings(["y"], [BASE + 300])
    assert tf2.contains_strings(["y"], as_of=BASE + 300).all()


def test_tdbloom_timer_width_pick():
    """Width auto-pick parity (src/tdbloom.c:92-102): strict < vs type max."""
    assert TdBloomSpec(10, 0.01, timeout=200).dtype == np.uint8
    assert TdBloomSpec(10, 0.01, timeout=255).dtype == np.uint16  # 255 !< 255
    assert TdBloomSpec(10, 0.01, timeout=65534).dtype == np.uint16
    assert TdBloomSpec(10, 0.01, timeout=65535).dtype == np.uint32
    assert TdBloomSpec(10, 0.01, timeout=2**32).dtype == np.uint64
    assert TdBloomSpec(10, 0.01, timeout=200).max_time == 255


def test_tdbloom_whole_filter_age_guard():
    """src/tdbloom.c:342: as_of - start_time > max_time ⇒ everything absent."""
    spec = TdBloomSpec(10, 0.01, timeout=2, start_time=BASE)  # max_time=255
    tf = TdBloomFilter(spec)
    tf.update_strings(["a"], [BASE + 1])
    assert not tf.contains_strings(["a"], as_of=BASE + 256).any()


def test_tdbloom_freshest_wins_and_merge():
    spec = TdBloomSpec(100, 0.01, timeout=50, start_time=BASE)
    a = TdBloomFilter(spec)
    b = TdBloomFilter(spec)
    a.update_strings(["k"], [BASE + 10])
    b.update_strings(["k"], [BASE + 90])
    a.merge(b)
    # freshest stamp (90) governs: alive at T=120 (age 30), dead at T=145
    assert a.contains_strings(["k"], as_of=BASE + 120).all()
    assert not a.contains_strings(["k"], as_of=BASE + 145).any()
    # merge is commutative: byte-identical either order
    a2 = TdBloomFilter(spec)
    b2 = TdBloomFilter(spec)
    a2.update_strings(["k"], [BASE + 10])
    b2.update_strings(["k"], [BASE + 90])
    b2.merge(a2)
    assert b2.serialize() == a.serialize()


def test_tdbloom_maintenance_and_compact():
    spec = TdBloomSpec(100, 0.01, timeout=10, start_time=BASE)
    tf = TdBloomFilter(spec)
    tf.update_strings(["a", "b", "c"], [BASE + 1, BASE + 5, BASE + 20])
    T = BASE + 20
    assert tf.count_expired(T) > 0
    n_live_before = tf.saturation(T)
    reaped = tf.clear_expired(T)
    assert reaped > 0 and tf.count_expired(T) == 0
    assert tf.saturation(T) == n_live_before  # reaping never kills live cells
    # compact export uses the C wrapped-tick formula
    compact = tf.compact_state()
    assert compact.dtype == spec.dtype
    nz = tf.ticks > 0
    expect = ((tf.ticks[nz] - 1) % spec.max_time) + 1
    assert (compact[nz] == expect.astype(spec.dtype)).all()


def test_tdbloom_last_access():
    spec = TdBloomSpec(50, 0.01, timeout=100, start_time=BASE)
    tf = TdBloomFilter(spec)
    tf.update_strings(["k"], [BASE + 42])
    la = tf.last_access_time(*_pack(["k"]))
    assert la[0] == BASE + 42
    assert tf.was_active_within(*_pack(["k"]), start=BASE + 40, end=BASE + 45).all()
    assert not tf.was_active_within(*_pack(["k"]), start=BASE, end=BASE + 41).any()
    assert tf.last_access_time(*_pack(["absent"]))[0] == -1


def test_tdcbloom_counts():
    """tests/test_tdcbloom_basic.c:92-118: counts 1 and 2; 0 after removes."""
    spec = TdCBloomSpec(10, 0.01, timeout=10, counter_bits=8, start_time=BASE)
    tc = TdCBloomFilter(spec)
    tc.update_strings(["go home, you're drunk"], [BASE + 1])
    tc.update_strings(
        ["You must defeat Sheng Long to stand a chance"] * 2, [BASE + 1, BASE + 2]
    )
    T = BASE + 3
    assert tc.count_strings(["go home, you're drunk"], as_of=T)[0] == 1
    assert tc.count_strings(["You must defeat Sheng Long to stand a chance"], as_of=T)[0] == 2
    assert tc.remove_strings(["You must defeat Sheng Long to stand a chance"]).all()
    assert tc.remove_strings(["You must defeat Sheng Long to stand a chance"]).all()
    assert tc.count_strings(["You must defeat Sheng Long to stand a chance"], as_of=T)[0] == 0


def test_tdcbloom_expiry_and_merge():
    spec = TdCBloomSpec(100, 0.01, timeout=10, counter_bits=8, start_time=BASE)
    a = TdCBloomFilter(spec)
    b = TdCBloomFilter(spec)
    a.update_strings(["k"] * 3, [BASE + 1] * 3)
    b.update_strings(["k"] * 2, [BASE + 8] * 2)
    a.merge(b)
    assert a.count_strings(["k"], as_of=BASE + 12)[0] == 5  # fresh via tick 8
    assert a.count_strings(["k"], as_of=BASE + 30)[0] == 0  # all stale
    # maintenance
    assert a.count_expired(BASE + 30) > 0
    a.clear_expired(BASE + 30)
    assert a.saturation_count(BASE + 30) == 0


def test_tdcbloom_serde():
    spec = TdCBloomSpec(50, 0.01, timeout=100, counter_bits=16, start_time=BASE)
    tc = TdCBloomFilter(spec)
    tc.update_strings(["a", "b"], [BASE + 1, BASE + 2])
    tc2 = TdCBloomFilter.deserialize(spec, tc.serialize())
    assert (tc2.counters == tc.counters).all()
    assert (tc2.ticks == tc.ticks).all()


def _pack(keys):
    from sketchlib import mmh3

    return mmh3.pack_strings(keys)


def test_tdbloom_reset_if_expired():
    """tdbloom_reset_if_expired (src/tdbloom.c:462-469): expired -> re-stamp
    at as_of and report True; fresh or absent -> False, untouched."""
    spec = TdBloomSpec(50, 0.01, timeout=10, start_time=BASE)
    f = TdBloomFilter(spec)
    f.update_strings(["old", "fresh"], [BASE + 1, BASE + 95])
    as_of = BASE + 100
    got = f.reset_if_expired_strings(["old", "fresh", "never"], as_of)
    assert list(got) == [True, False, False]
    # the expired element is fresh again as-of the reset time
    assert bool(f.contains_strings(["old"], as_of=as_of)[0])
    assert not bool(f.contains_strings(["never"], as_of=as_of)[0])


def test_tdcbloom_reset_if_expired():
    spec = TdCBloomSpec(50, 0.01, timeout=10, counter_bits=16, start_time=BASE)
    f = TdCBloomFilter(spec)
    f.update_strings(["old"] * 3, [BASE + 1] * 3)
    as_of = BASE + 100
    assert list(f.reset_if_expired_strings(["old", "never"], as_of)) == [True, False]
    # reference resets via tdcbloom_add: counter bumped 3 -> 4, stamp fresh
    assert int(f.count_strings(["old"], as_of=as_of)[0]) == 4


def test_tdcbloom_adjust_timeout_reaps():
    """tdcbloom_adjust_timeout (src/tdcbloom.c:303-320): shrinking the window
    reaps entries expired under the NEW policy."""
    spec = TdCBloomSpec(50, 0.01, timeout=100, counter_bits=16, start_time=BASE)
    f = TdCBloomFilter(spec)
    f.update_strings(["a"], [BASE + 10])
    f.update_strings(["b"], [BASE + 90])
    as_of = BASE + 95
    assert bool(f.contains_strings(["a"], as_of=as_of)[0])
    reaped = f.adjust_timeout(20, as_of=as_of)  # a is 85s old -> reaped
    assert reaped >= spec.k
    assert f.spec.timeout == 20
    assert not bool(f.contains_strings(["a"], as_of=as_of)[0])
    assert bool(f.contains_strings(["b"], as_of=as_of)[0])


def test_tdcbloom_age_element_and_age_and_remove():
    spec = TdCBloomSpec(50, 0.01, timeout=50, counter_bits=16, start_time=BASE)
    f = TdCBloomFilter(spec)
    f.update_strings(["x"], [BASE + 60])
    as_of = BASE + 70
    assert bool(f.contains_strings(["x"], as_of=as_of)[0])
    # age by 40s: now 50s old -> still inside timeout=50
    assert bool(f.age_element_strings(["x"], 40)[0])
    assert bool(f.contains_strings(["x"], as_of=as_of)[0])
    # absent element: not aged, returns False (src/tdcbloom.c:858-860)
    assert not bool(f.age_element_strings(["missing"], 5)[0])
    # age past the window, then reap cells older than 55s
    assert bool(f.age_element_strings(["x"], 30)[0])
    removed = f.age_and_remove(55, as_of=as_of)
    assert removed >= spec.k
    assert not bool(f.contains_strings(["x"], as_of=as_of)[0])
    assert int(f.counters.sum()) == 0


def test_tdbloom_declared_only_extensions():
    """The tdbloom.h declared-but-never-defined ops, as extensions:
    lookup_or_add / adjust_timeout / age_element / expire_older_than /
    get_average_lifetime."""
    spec = TdBloomSpec(50, 0.01, timeout=100, start_time=BASE)
    f = TdBloomFilter(spec)
    as_of = BASE + 50
    # lookup_or_add: absent -> False + stamped; present -> True
    got = f.lookup_or_add_strings(["a", "b"], as_of)
    assert list(got) == [False, False]
    assert list(f.lookup_or_add_strings(["a", "c"], as_of)) == [True, False]
    assert bool(f.contains_strings(["b"], as_of=as_of)[0])

    # get_average_lifetime: all stamped at as_of -> age 50 relative? no:
    # ticks are at as_of, so age as-of as_of is 0
    assert f.get_average_lifetime(as_of) == 0.0
    later = as_of + 30
    assert abs(f.get_average_lifetime(later) - 30.0) < 1e-9

    # age_element: age "a" by 80s -> age 110 as-of later, outside timeout=100
    assert bool(f.age_element_strings(["a"], 80)[0])
    assert not bool(f.contains_strings(["a"], as_of=later)[0])
    assert not bool(f.age_element_strings(["missing-key-xyz"], 5)[0])

    # expire_older_than: b/c cells (age 30 as-of later) reaped at bound 25
    n = f.expire_older_than(25, later)
    assert n >= spec.k
    assert not bool(f.contains_strings(["b"], as_of=later)[0])

    # adjust_timeout: fresh key at `later`, then shrink the window under its
    # age -> reaped under the NEW policy
    f2 = TdBloomFilter(TdBloomSpec(50, 0.01, timeout=100, start_time=BASE))
    f2.update_strings(["k"], [BASE + 10])
    probe_t = BASE + 60
    assert bool(f2.contains_strings(["k"], as_of=probe_t)[0])
    reaped = f2.adjust_timeout(20, probe_t)  # age 50 > 20
    assert reaped >= f2.spec.k
    assert f2.spec.timeout == 20
    assert not bool(f2.contains_strings(["k"], as_of=probe_t)[0])


def test_tdbloom_saturation_count_matches_percentage():
    """saturation_count (src/tdbloom.h:117, declared-only TODO in C): the
    live-cell integer count behind the % variant — exactly k cells per
    distinct fresh key minus collisions, 0 once everything expires."""
    BASE = 1_700_000_000
    spec = TdBloomSpec(100, 0.01, timeout=100, start_time=BASE)
    f = TdBloomFilter(spec)
    f.update_strings(["a", "b", "c"], [BASE + 10, BASE + 20, BASE + 30])
    now = BASE + 40
    sc = f.saturation_count(now)
    assert 0 < sc <= 3 * spec.k
    assert f.saturation(now) == pytest.approx(100.0 * sc / spec.m)
    # "a" (age 30+) expires first at BASE+10+101; all gone past BASE+30+100
    assert f.saturation_count(BASE + 131) == 0
    assert f.saturation(BASE + 131) == 0.0
