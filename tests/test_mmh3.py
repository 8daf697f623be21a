"""M0 gate: bit-exact parity of the vectorized hash kernels with the compiled
C reference (golden vectors recorded in FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib import mmh3

GOLDEN_128 = {
    # key: (h1, h2, mmh3_32) at seed 0 — FIXTURES.md §3
    b"": (0x0000000000000000, 0x0000000000000000, 0x00000000),
    b"a": (0x85555565F6597889, 0xE6B53A48510E895A, 0x3C2569B2),
    b"foo": (0xE271865701F54561, 0x7EAF87E42BBA7D87, 0xF6A5C420),
    b"bar": (0x923658DBFD3AE604, 0x244FD74548BC56C0, 0x450E998D),
    b"hello world": (0x533F6046EB7F610E, 0xAB97467D60EB63B1, 0x5E928F0F),
    b"conv-000042/turn-7": (0x521BEF8D171E0B93, 0x70AD9F6AF7D89DC1, 0x2DCE8517),
    b"The quick brown fox jumps over the lazy dog": (
        0xE34BBC7BBC071B6C,
        0x7A433CA9C49A9347,
        0x2E4FF723,
    ),
}

GOLDEN_MAKE_HASHES = {
    b"foo": [
        16316970633193145697,
        6998890943242814184,
        16127555327002034287,
        6809475637051702774,
    ],
    b"bar": [
        10535706080149431812,
        13152252681247997124,
        15768799282346562436,
        18385345883445127748,
    ],
    b"hello world": [
        5998619086395760910,
        18363047892675642559,
        12280732625245972592,
        6198417357816302625,
    ],
    b"conv-000042/turn-7": [
        5916585924738550675,
        14035906909730941268,
        3708483821013780245,
        11827804806006170838,
    ],
}


def test_mmh3_128_golden():
    keys = list(GOLDEN_128)
    data, off = mmh3.pack_strings(keys)
    h1, h2 = mmh3.mmh3_x64_128(data, off)
    for i, k in enumerate(keys):
        assert int(h1[i]) == GOLDEN_128[k][0], k
        assert int(h2[i]) == GOLDEN_128[k][1], k


def test_mmh3_32_golden():
    keys = list(GOLDEN_128)
    data, off = mmh3.pack_strings(keys)
    h = mmh3.mmh3_x86_32(data, off)
    for i, k in enumerate(keys):
        assert int(h[i]) == GOLDEN_128[k][2], k


def test_make_hashes_golden():
    keys = list(GOLDEN_MAKE_HASHES)
    data, off = mmh3.pack_strings(keys)
    h = mmh3.hash_batch(data, off, k=4)
    for i, k in enumerate(keys):
        assert [int(x) for x in h[i]] == GOLDEN_MAKE_HASHES[k], k


def test_batch_order_independence():
    """The sorted-prefix block loop must not leak across rows: hashing a batch
    equals hashing each key alone, for mixed lengths around block boundaries."""
    keys = [b"x" * n for n in (0, 1, 7, 8, 15, 16, 17, 31, 32, 33, 100, 1000)]
    keys += [b"abc", b"The quick brown fox jumps over the lazy dog", b"\x00\x01\xff" * 11]
    data, off = mmh3.pack_strings(keys)
    h1, h2 = mmh3.mmh3_x64_128(data, off, seed=123)
    for i, k in enumerate(keys):
        d1, o1 = mmh3.pack_strings([k])
        s1, s2 = mmh3.mmh3_x64_128(d1, o1, seed=123)
        assert (int(h1[i]), int(h2[i])) == (int(s1[0]), int(s2[0])), (i, k)


def test_mmh3_64_fold():
    data, off = mmh3.pack_strings([b"foo", b"bar"])
    h1, h2 = mmh3.mmh3_x64_128(data, off)
    h64 = mmh3.mmh3_x64_64(data, off)
    assert (h64 == (h1 ^ h2)).all()


def test_arrow_string_buffers_matches_pack():
    pa = pytest.importorskip("pyarrow")
    keys = ["", "foo", "hello world", "conv-000042/turn-7", "x" * 50]
    arr = pa.array(keys, type=pa.string())
    d1, o1 = mmh3.arrow_string_buffers(arr)
    d2, o2 = mmh3.pack_strings(keys)
    a = mmh3.mmh3_x64_64(d1, o1)
    b = mmh3.mmh3_x64_64(d2, o2)
    assert (a == b).all()
    # sliced arrays (non-zero arr.offset)
    sl = arr.slice(2, 3)
    d3, o3 = mmh3.arrow_string_buffers(sl)
    c = mmh3.mmh3_x64_64(d3, o3)
    assert (c == b[2:5]).all()


def test_distribution_uniformity():
    """Port of reference tests/test_mmh3_basic.c:46-67 — 100k random strings
    into 1000 buckets; bucket-count variance within 10% of Poisson expectation."""
    rng = np.random.default_rng(42)
    n, buckets = 100_000, 1000
    keys = [("k%d-%d" % (i, rng.integers(1 << 30))).encode() for i in range(n)]
    data, off = mmh3.pack_strings(keys)
    h = mmh3.mmh3_x64_64(data, off)
    counts = np.bincount((h % np.uint64(buckets)).astype(np.int64), minlength=buckets)
    expected = n / buckets
    var = counts.var()
    assert abs(var - expected) / expected < 0.1


def test_empty_batch():
    data, off = mmh3.pack_strings([])
    h1, h2 = mmh3.mmh3_x64_128(data, off)
    assert h1.size == 0 and h2.size == 0
    assert mmh3.mmh3_x86_32(data, off).size == 0
