"""KLL and t-digest: rank/quantile error vs exact, merge error preservation
(FIXTURES.md §6; published bounds per SURVEY.md §2.9)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import KllSketch, TDigest
from sketchlib.specs import KllSpec, TDigestSpec

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(srt: np.ndarray, value: float, q: float) -> float:
    """Distance from q to the value's true rank *interval* — with heavy ties
    (e.g. Zipf mass at 1.0) a single-point rank overstates the error for any
    correct answer inside the tie run."""
    lo = np.searchsorted(srt, value, side="left") / srt.size
    hi = np.searchsorted(srt, value, side="right") / srt.size
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


def _dists():
    rng = np.random.default_rng(11)
    return {
        "uniform": rng.uniform(0, 1000, 100_000),
        "normal": rng.normal(100, 15, 100_000),
        "lognormal": rng.lognormal(3, 1, 100_000),
        "zipf-ish": rng.zipf(1.5, 100_000).astype(np.float64),
    }


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal", "zipf-ish"])
def test_kll_rank_error(dist):
    data = _dists()[dist]
    kll = KllSketch(KllSpec(k=200))
    for chunk in np.array_split(data, 10):
        kll.update(chunk)
    assert kll.n == data.size
    srt = np.sort(data)
    for q in QS:
        est = kll.quantile(q)
        assert _rank_err(srt, est, q) <= 0.03, (q, est)


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
def test_tdigest_rank_error(dist):
    data = _dists()[dist]
    td = TDigest(TDigestSpec(compression=200))
    for chunk in np.array_split(data, 10):
        td.update(chunk)
    srt = np.sort(data)
    for q in QS:
        est = td.quantile(q)
        true_rank = np.searchsorted(srt, est, side="right") / data.size
        # t-digest is tightest at the tails
        tol = 0.005 if q <= 0.01 or q >= 0.99 else 0.02
        assert abs(true_rank - q) <= tol, (q, est, true_rank)


def test_kll_merge_preserves_error():
    data = _dists()["normal"]
    parts = np.array_split(data, 7)
    sketches = []
    for part in parts:
        s = KllSketch(KllSpec(k=200))
        s.update(part)
        sketches.append(s)
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge(s)
    assert merged.n == data.size
    srt = np.sort(data)
    for q in QS:
        est = merged.quantile(q)
        true_rank = np.searchsorted(srt, est, side="right") / data.size
        assert abs(true_rank - q) <= 0.04, (q, est, true_rank)


def test_tdigest_merge_preserves_error():
    data = _dists()["lognormal"]
    parts = np.array_split(data, 7)
    sketches = []
    for part in parts:
        s = TDigest(TDigestSpec(compression=200))
        s.update(part)
        sketches.append(s)
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge(s)
    srt = np.sort(data)
    for q in QS:
        est = merged.quantile(q)
        true_rank = np.searchsorted(srt, est, side="right") / data.size
        assert abs(true_rank - q) <= 0.03, (q, est, true_rank)


def test_tdigest_extremes_exact():
    data = _dists()["uniform"]
    td = TDigest(TDigestSpec(compression=100))
    td.update(data)
    assert td.quantile(0.0) == data.min()
    assert td.quantile(1.0) == data.max()


def test_kll_serde():
    s = KllSketch(KllSpec(k=128))
    s.update(np.arange(10_000, dtype=np.float64))
    s2 = KllSketch.deserialize(s.spec, s.serialize())
    assert s2.n == s.n
    assert s2.quantile(0.5) == s.quantile(0.5)


def test_tdigest_serde():
    t = TDigest(TDigestSpec(compression=100))
    t.update(np.arange(10_000, dtype=np.float64))
    t2 = TDigest.deserialize(t.spec, t.serialize())
    assert t2.quantile(0.5) == t.quantile(0.5)
    assert t2.min == t.min and t2.max == t.max


def test_nan_handling():
    s = KllSketch(KllSpec())
    s.update(np.array([1.0, np.nan, 3.0]))
    assert s.n == 2
    t = TDigest(TDigestSpec())
    t.update(np.array([np.nan, np.nan]))
    assert t.n == 0
