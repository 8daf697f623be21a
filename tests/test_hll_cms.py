"""HLL and CMS statistical acceptance (FIXTURES.md §6, BASELINE.md budgets)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import CountMinSketch, HyperLogLog
from sketchlib.specs import CmsSpec, HllSpec


@pytest.mark.parametrize("true_card", [1_000, 100_000, 1_000_000])
def test_hll_error_bound(true_card):
    """|est−true|/true ≤ 3·1.04/√m per trial (m=2^14 ⇒ 2.44%); tighter on
    average (checked in test_hll_mean_error)."""
    hll = HyperLogLog(HllSpec(p=14))
    # feed via pre-hashed path to keep the test fast at 1e6
    rng = np.random.default_rng(true_card)
    hashes = rng.integers(0, 2**64, size=true_card, dtype=np.uint64)
    hll.update_hashes(hashes)
    est = hll.estimate()
    rel = abs(est - true_card) / true_card
    assert rel <= 3 * 1.04 / np.sqrt(16384), (true_card, est, rel)


def test_hll_mean_error():
    """20 seeds at 1e5 true: mean relative error ≤ 2% (BASELINE.json budget)."""
    errs = []
    for seed in range(20):
        hll = HyperLogLog(HllSpec(p=14))
        rng = np.random.default_rng(seed)
        hashes = rng.integers(0, 2**64, size=100_000, dtype=np.uint64)
        hll.update_hashes(hashes)
        errs.append(abs(hll.estimate() - 100_000) / 100_000)
    assert float(np.mean(errs)) <= 0.02, np.mean(errs)


def test_hll_string_path_and_duplicates():
    hll = HyperLogLog(HllSpec(p=12))
    keys = ["user-%05d" % (i % 5000) for i in range(50_000)]  # 10× duplication
    hll.update_strings(keys)
    est = hll.estimate()
    assert abs(est - 5000) / 5000 < 0.05


def test_hll_merge_equals_union():
    spec = HllSpec(p=14)
    a, b, u = HyperLogLog(spec), HyperLogLog(spec), HyperLogLog(spec)
    ka = ["a-%d" % i for i in range(20_000)]
    kb = ["b-%d" % i for i in range(20_000)]
    a.update_strings(ka)
    b.update_strings(kb)
    u.update_strings(ka + kb)
    a.merge(b)
    assert (a.registers == u.registers).all(), "merge must equal single-pass build"


def test_hll_small_range_linear_counting():
    hll = HyperLogLog(HllSpec(p=14))
    hll.update_strings([str(i) for i in range(100)])
    assert abs(hll.estimate() - 100) < 5


def test_cms_never_undercounts_zipf():
    """Zipf stream: est ≥ truth always; overcount ≤ εN for ≥ (1-δ) of keys."""
    rng = np.random.default_rng(7)
    n = 200_000
    zipf = rng.zipf(1.3, size=n)
    keys = ["tool-%02d" % min(int(z), 50) for z in zipf]
    spec = CmsSpec(epsilon=0.0005, delta=0.01)
    cms = CountMinSketch(spec)
    cms.update_strings(keys)
    uniq, truth = np.unique(keys, return_counts=True)
    est = cms.estimate_strings(list(uniq))
    assert (est >= truth).all(), "CMS must never undercount"
    eps_n = np.e / spec.width * n
    frac_over = ((est - truth) > eps_n).mean()
    assert frac_over <= spec.delta, (frac_over, eps_n)


def test_cms_merge_equals_single_pass():
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    a, b, u = CountMinSketch(spec), CountMinSketch(spec), CountMinSketch(spec)
    ka = ["x-%d" % (i % 100) for i in range(10_000)]
    kb = ["y-%d" % (i % 50) for i in range(5_000)]
    a.update_strings(ka)
    b.update_strings(kb)
    u.update_strings(ka + kb)
    a.merge(b)
    assert (a.table == u.table).all()
    assert a.total == u.total == 15_000


def test_cms_serde():
    spec = CmsSpec(epsilon=0.01, delta=0.05)
    c = CountMinSketch(spec)
    c.update_strings(["a", "b", "a"])
    c2 = CountMinSketch.deserialize(spec, c.serialize())
    assert (c2.table == c.table).all() and c2.total == 3


def test_hll_serde():
    spec = HllSpec(p=10)
    h = HyperLogLog(spec)
    h.update_strings(["a", "b", "c"])
    h2 = HyperLogLog.deserialize(spec, h.serialize())
    assert (h2.registers == h.registers).all()
