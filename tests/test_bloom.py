"""Bloom kernel parity with the C reference: geometry goldens, bitmap
hexdump, ported unit-test asserts (reference tests/test_bloom_basic.c), and
the statistical acceptance bands of FIXTURES.md §6 / BASELINE.md."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import BloomFilter
from sketchlib.specs import BloomSpec, CBloomSpec, ideal_size


GEOMETRY_GOLDENS = [
    # (n, p) -> (m, k, c_bytes) from FIXTURES.md §4
    (15, 0.01, 143, 6, 17),
    (20, 0.01, 191, 6, 23),
    (25, 0.01, 239, 6, 29),
    (1000, 0.01, 9585, 6, 1198),
    (100000, 0.01, 958505, 6, 119813),
    (1000000, 0.001, 14377587, 9, 1797198),
]


@pytest.mark.parametrize("n,p,m,k,cbytes", GEOMETRY_GOLDENS)
def test_geometry_goldens(n, p, m, k, cbytes):
    spec = BloomSpec(n, p)
    assert spec.m == m
    assert spec.k == k
    assert spec.nbytes == cbytes + (1 if m % 8 else 0)  # ceil vs C trunc


def test_cbloom_hashcount_rounds():
    # cbloom rounds k (+0.5): (1e6, 0.001) -> k=10 where bloom gets 9
    assert CBloomSpec(1000000, 0.001).k == 10
    assert BloomSpec(1000000, 0.001).k == 9


def test_bitmap_hexdump_parity():
    """Reference tests/test_bloom_basic.c:37-92: "asdf","bar","foo" into
    (15, 0.01) produce a byte-identical bitmap (first 17 bytes; our 18th
    byte may carry in-range bits 136-142 the C build drops)."""
    bf = BloomFilter(BloomSpec(15, 0.01))
    bf.update_strings(["asdf", "bar", "foo"])
    # the C test then runs lookup_or_add("asdf") (no-op) and
    # lookup_or_add("asdfasdf") (inserts) before its hexdump
    assert bf.lookup_or_add(*_pack(["asdf"]))[0]
    assert not bf.lookup_or_add(*_pack(["asdfasdf"]))[0]
    expected = bytes.fromhex("401005051801c008480040200002808040")
    assert bf.serialize()[:17] == expected


def test_membership_basic():
    bf = BloomFilter(BloomSpec(15, 0.01))
    bf.update_strings(["asdf", "bar", "foo"])
    assert bf.contains_strings(["foo", "bar", "asdf"]).all()
    assert not bf.contains_strings(["baz"]).any()


def test_lookup_or_add():
    """Reference tests/test_bloom_basic.c:74-85."""
    bf = BloomFilter(BloomSpec(15, 0.01))
    assert not bf.lookup_or_add(*_pack(["qwerty"]))[0]
    assert bf.lookup_or_add(*_pack(["qwerty"]))[0]
    # batch with duplicates: first occurrence False, second True
    out = bf.lookup_or_add(*_pack(["zxcv", "zxcv"]))
    assert out.tolist() == [False, True]


def test_saturation_after_one_insert():
    """popcount == hashcount after one insert (test_bloom_basic.c:188-195)."""
    bf = BloomFilter(BloomSpec(15, 0.01))
    bf.update_strings(["foo"])
    assert bf.saturation_count() == bf.k


def test_saturation_bands():
    """The C test's rate is ``2 * popcount / m`` (test_bloom_basic.c:204-227):
    half-fill ∈ (0.40, 0.55), full-fill ∈ (0.80, 0.90).  C's popcount scans
    only its truncated m/8-byte bitmap (positions ≥ 8*(m/8) are out-of-bounds
    writes there, SURVEY.md §1.1) — compare over the C-visible prefix.
    Verified against the compiled reference: half 33 bits, full 61 bits."""
    n = 15
    bf = BloomFilter(BloomSpec(n, 0.01))
    c_bytes = bf.m // 8

    def c_popcount():
        return int(np.unpackbits(bf.bits[:c_bytes]).sum())

    bf.update_strings([str(i) for i in range(n // 2)])
    assert c_popcount() == 33  # compiled reference prints this exact count
    assert 0.40 < 2 * c_popcount() / bf.m < 0.55
    # C's second loop adds another n/2 keys ("7".."13") — 14 total, not 15
    bf.update_strings([str(i + n // 2) for i in range(n // 2)])
    assert c_popcount() == 61
    assert 0.80 < 2 * c_popcount() / bf.m < 0.90


def test_merge_and_incompatible():
    """test_bloom_basic.c:243-288."""
    spec = BloomSpec(20, 0.01)
    m1 = BloomFilter(spec)
    m1.update_strings(["one", "three"])
    m2 = BloomFilter(spec)
    m2.update_strings(["two", "four"])
    merged = BloomFilter(spec)
    merged.merge(m1).merge(m2)
    assert merged.contains_strings(["one", "two", "three", "four"]).all()
    assert not merged.contains_strings(["seven"]).any()
    with pytest.raises(ValueError):
        merged.merge(BloomFilter(BloomSpec(30, 0.1)))


def test_intersect_and_jaccard():
    """test_bloom_basic.c:291-345: Jaccard ∈ (30, 40)%."""
    spec = BloomSpec(25, 0.01)
    i1 = BloomFilter(spec)
    i1.update_strings(["common", "uncommon"])
    i2 = BloomFilter(spec)
    i2.update_strings(["common", "strange"])
    j = i1.jaccard(i2)
    assert 30.0 < j < 40.0
    inter = BloomFilter(spec, i1.bits.copy())
    inter.intersect(i2)
    assert inter.contains_strings(["common"]).all()
    assert not inter.contains_strings(["strange"]).any()
    assert i1.jaccard(BloomFilter(BloomSpec(30, 0.1))) == -1.0


def test_clear_if_saturation_exceeds():
    bf = BloomFilter(BloomSpec(15, 0.01))
    bf.update_strings([str(i) for i in range(15)])
    assert not bf.clear_if_saturation_exceeds(95.0)
    assert bf.clear_if_saturation_exceeds(10.0)
    assert bf.saturation_count() == 0


def test_fpr_statistical():
    """FIXTURES.md §6: 100k members at (100000, 0.01) → zero false negatives,
    FPR ≤ 0.015 (reference measured 0.00994)."""
    n = 100_000
    bf = BloomFilter(BloomSpec(n, 0.01))
    members = ["member-%06d" % i for i in range(n)]
    bf.update_strings(members)
    assert bf.contains_strings(members).all(), "bloom must never false-negative"
    probes = ["absent-%06d" % i for i in range(n)]
    fpr = bf.contains_strings(probes).mean()
    assert 0.0 < fpr <= 0.015, fpr
    # saturation near theory: 1 - e^(-kn/m) ≈ 46.5%
    assert 44.0 < bf.saturation() < 49.0
    # corrected FPR estimator tracks the empirical rate (reference's is 0.68)
    assert abs(bf.estimate_false_positive_rate() - fpr) < 0.005


def test_serde_roundtrip():
    spec = BloomSpec(1000, 0.01)
    bf = BloomFilter(spec)
    bf.update_strings(["a", "b", "c"])
    bf2 = BloomFilter.deserialize(spec, bf.serialize())
    assert (bf2.bits == bf.bits).all()


def _pack(keys):
    from sketchlib import mmh3

    return mmh3.pack_strings(keys)
