"""Counting-bloom kernel: ported reference unit tests
(tests/test_cbloom_basic.c) + the statistical acceptance band (min-count
never undercounts, overcount rate ≈ p — BASELINE.md measured 0.0105)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import CountingBloomFilter
from sketchlib.specs import CBloomSpec


def test_counts_basic():
    """test_cbloom_basic.c:29-87."""
    cbf = CountingBloomFilter(CBloomSpec(20, 0.01, counter_bits=8))
    cbf.update_strings(["foo", "bar", "multi", "multi"])
    assert cbf.count_strings(["multi"])[0] == 2
    assert cbf.count_strings(["fizzbuzz"])[0] == 0
    assert cbf.contains_strings(["foo", "bar", "multi"]).all()
    # remove semantics
    assert cbf.remove_strings(["bar"])[0]
    assert not cbf.contains_strings(["bar"])[0]
    assert cbf.remove_strings(["multi"])[0]
    assert cbf.count_strings(["multi"])[0] == 1
    assert cbf.contains_strings(["multi"])[0]


def test_stats():
    """test_cbloom_basic.c:215-250: count==5 after 5 adds;
    elements_above_threshold(1) == 2; average_count == 3.0."""
    cbf = CountingBloomFilter(CBloomSpec(20, 0.01, counter_bits=64))
    cbf.update_strings(["string"] * 5)
    cbf.update_strings(["another string"] * 3)
    cbf.update_strings(["one"])
    assert cbf.count_strings(["string"])[0] == 5
    assert cbf.count_elements_above_threshold(1) == 2
    assert cbf.get_average_count() == 3.0


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
def test_all_widths(bits):
    """All five counter widths constructible and saturating
    (test_cbloom_basic.c:120-213)."""
    spec = CBloomSpec(20, 0.01, counter_bits=bits)
    cbf = CountingBloomFilter(spec)
    # overshoot the cap in two saturating adds (amount-weighted)
    cbf.update_strings(["x"], amount=spec.cap)
    cbf.update_strings(["x"] * 5)
    assert cbf.count_strings(["x"])[0] == spec.cap  # saturated, no wrap
    # serde round-trip (4-bit packs nibbles)
    c2 = CountingBloomFilter.deserialize(spec, cbf.serialize())
    assert (c2.counters == cbf.counters).all()


def test_merge_saturating_add():
    spec = CBloomSpec(100, 0.01, counter_bits=8)
    a = CountingBloomFilter(spec)
    b = CountingBloomFilter(spec)
    a.update_strings(["k"] * 200)
    b.update_strings(["k"] * 100)
    a.merge(b)
    assert a.count_strings(["k"])[0] == 255  # clamped after summing partials


def test_decay():
    spec = CBloomSpec(100, 0.01, counter_bits=16)
    c = CountingBloomFilter(spec)
    c.update_strings(["a"] * 10, amount=1)
    c.decay_linear(4)
    assert c.count_strings(["a"])[0] == 6
    c.decay_exponential(0.5)
    assert c.count_strings(["a"])[0] == 3


def test_min_count_statistical():
    """FIXTURES.md §6: 100k keys × (1 + i mod 5) reps, 16-bit: zero
    undercounts; overcount rate ≤ 1.5·p."""
    n = 100_000
    spec = CBloomSpec(n, 0.01, counter_bits=16)
    cbf = CountingBloomFilter(spec)
    keys = ["key-%06d" % i for i in range(n)]
    truth = np.array([1 + (i % 5) for i in range(n)])
    batch = []
    for k, t in zip(keys, truth):
        batch.extend([k] * int(t))
    cbf.update_strings(batch)
    est = cbf.count_strings(keys)
    assert (est >= truth).all(), "min-count must never undercount"
    overcount_rate = (est > truth).mean()
    assert overcount_rate <= 0.015, overcount_rate


def test_lookup_or_add():
    """cbloom_lookup_or_add (src/cbloom.c:506-524): absent -> False + insert;
    present -> True + counters still bumped."""
    cbf = CountingBloomFilter(CBloomSpec(50, 0.01, counter_bits=16))
    first = cbf.lookup_or_add_strings(["a", "b"])
    assert list(first) == [False, False]
    again = cbf.lookup_or_add_strings(["a", "b", "c"])
    assert list(again) == [True, True, False]
    # two lookup_or_adds counted both times (increment happens regardless)
    assert list(cbf.count_strings(["a", "b"])) == [2, 2]


def test_clear_if_count_above():
    """cbloom_clear_if_count_above (src/cbloom.c:598-622): any counter above
    threshold -> all k zeroed; below -> untouched."""
    cbf = CountingBloomFilter(CBloomSpec(50, 0.01, counter_bits=16))
    cbf.update_strings(["hot"] * 5 + ["cold"])
    assert list(cbf.clear_if_count_above_strings(["cold"], 10)) == [False]
    assert cbf.count_strings(["cold"])[0] >= 1  # untouched
    assert list(cbf.clear_if_count_above_strings(["hot"], 3)) == [True]
    assert cbf.count_strings(["hot"])[0] == 0
