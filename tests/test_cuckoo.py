"""Cuckoo filter: ported reference tests (tests/test_cuckoo_basic.c) + the
published-bound acceptance replacing the reference's defective FPR
(SURVEY.md §2.6: reference measures 0.77; corrected target ≈ 2·b/2^16)."""

from __future__ import annotations

import numpy as np

from sketchlib.kernels import CuckooFilter
from sketchlib.specs import CuckooSpec


def test_basic_membership():
    """tests/test_cuckoo_basic.c:14-46."""
    cf = CuckooFilter(CuckooSpec(1000, bucket_size=4, max_kicks=500))
    assert cf.update_strings(["foo", "bar"]).all()
    assert cf.contains_strings(["foo", "bar"]).all()
    assert not cf.contains_strings(["baz"]).any()
    assert cf.remove_strings(["foo"]).all()
    assert not cf.contains_strings(["foo"]).any()
    assert cf.contains_strings(["bar"]).all()


def test_serde_roundtrip():
    spec = CuckooSpec(1000)
    cf = CuckooFilter(spec)
    cf.update_strings(["a", "b", "c"])
    cf2 = CuckooFilter.deserialize(spec, cf.serialize())
    assert (cf2.table == cf.table).all()
    assert cf2.contains_strings(["a", "b", "c"]).all()


def test_fpr_and_no_false_negatives():
    """FIXTURES.md §6: 100k keys at ≤ 80% load → FPR ≤ 1e-3, zero false
    negatives. (The reference's defective construction measures 0.77.)"""
    n = 100_000
    cf = CuckooFilter(CuckooSpec(32768, bucket_size=4, max_kicks=500, seed=1))
    members = ["m-%06d" % i for i in range(n)]
    ok = cf.update_strings(members)
    assert ok.mean() > 0.999, f"insert failures at {100*(1-ok.mean()):.3f}%"
    retained = [m for m, o in zip(members, ok) if o]
    assert cf.contains_strings(retained).all(), "no false negatives for retained keys"
    probes = ["p-%06d" % i for i in range(n)]
    fpr = cf.contains_strings(probes).mean()
    assert fpr <= 1e-3, fpr
    assert 70.0 < cf.load_factor() <= 80.0


def test_load_factor_counts():
    cf = CuckooFilter(CuckooSpec(64, bucket_size=4))
    cf.update_strings([str(i) for i in range(32)])
    # defect-3 regression: reference always reports 0
    assert cf.load_factor() > 0.0


def test_merge_reinsertion():
    spec = CuckooSpec(4096, bucket_size=4, seed=3)
    a, b, u = CuckooFilter(spec), CuckooFilter(spec), CuckooFilter(spec)
    ka = ["a-%d" % i for i in range(2000)]
    kb = ["b-%d" % i for i in range(2000)]
    a.update_strings(ka)
    b.update_strings(kb)
    u.update_strings(ka + kb)
    a.merge(b)
    assert a.contains_strings(ka + kb).all()


def test_deterministic():
    """Same seed ⇒ byte-identical tables (the reference seeds its eviction
    PRNG from the wall clock — irreproducible; we don't)."""
    spec = CuckooSpec(256, bucket_size=2, max_kicks=50, seed=9)
    keys = ["k-%d" % i for i in range(900)]
    t1 = CuckooFilter(spec)
    t1.update_strings(keys)
    t2 = CuckooFilter(spec)
    t2.update_strings(keys)
    assert (t1.table == t2.table).all()
