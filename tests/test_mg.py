"""Misra-Gries heavy-hitters summary: one-sided bounds, merge bound
preservation, serde, distributed build."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import MisraGries
from sketchlib.specs import MGSpec


def _zipf_keys(n, n_keys, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n) % n_keys
    return [f"key{r}" for r in ranks]


def test_exact_when_under_capacity():
    mg = MisraGries(MGSpec(k=64))
    keys = ["a"] * 10 + ["b"] * 5 + ["c"]
    mg.update_strings(keys)
    assert list(mg.estimate_strings(["a", "b", "c", "missing"])) == [10, 5, 1, 0]
    assert mg.max_undercount() == 0
    hh = mg.heavy_hitters()
    assert hh[0] == (b"a", 10) and hh[1] == (b"b", 5)


def test_one_sided_bounds_under_trimming():
    k = 16
    mg = MisraGries(MGSpec(k=k))
    keys = _zipf_keys(50_000, 500, seed=3)
    mg.update_strings(keys)
    from collections import Counter

    true = Counter(keys)
    n = len(keys)
    assert mg.max_undercount() <= n // (k + 1)
    uniq = list(true)
    est = mg.estimate_strings(uniq)
    for key, e in zip(uniq, est):
        assert e <= true[key], "MG must never overcount"
        assert true[key] - e <= n // (k + 1) + 1, "undercount bound violated"
    # every key above the guarantee threshold is present
    present = {key for key, _ in mg.heavy_hitters()}
    for key, c in true.items():
        if c > n // (k + 1):
            assert key.encode() in present


def test_merge_preserves_bounds():
    k = 16
    keys = _zipf_keys(40_000, 300, seed=5)
    halves = (keys[:20_000], keys[20_000:])
    parts = []
    for h in halves:
        m = MisraGries(MGSpec(k=k))
        m.update_strings(h)
        parts.append(m)
    merged = parts[0].merge(parts[1])
    from collections import Counter

    true = Counter(keys)
    n = len(keys)
    assert merged.max_undercount() <= n // (k + 1)
    est = merged.estimate_strings(list(true))
    for key, e in zip(true, est):
        assert e <= true[key]
        assert true[key] - e <= n // (k + 1) + 1


def test_serde_roundtrip():
    mg = MisraGries(MGSpec(k=8))
    mg.update_strings(_zipf_keys(5_000, 100, seed=7))
    blob = mg.serialize()
    back = MisraGries.deserialize(MGSpec(k=8), blob)
    assert back.serialize() == blob
    assert back.max_undercount() == mg.max_undercount()
    assert back.heavy_hitters() == mg.heavy_hitters()


def test_distributed_build_bounds():
    from sketchlib.spark import build_sketch, get_spark
    from pyspark.sql import functions as F

    spark = get_spark("mg-tests", cpus=4, shuffle_partitions=4)
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    k = 32
    kernel, total = build_sketch(events, MGSpec(k=k), key="event_type")
    exact = {r["event_type"]: r["count"] for r in events.groupBy("event_type").count().collect()}
    est = kernel.estimate_strings(list(exact))
    for key, e in zip(exact, est):
        assert e <= exact[key]
        assert exact[key] - e <= total // (k + 1) + 1


def test_mg_empty_and_incompatible():
    mg = MisraGries(MGSpec(k=4))
    assert list(mg.estimate_strings(["nope"])) == [0]
    assert mg.heavy_hitters() == []
    blob = mg.serialize()
    back = MisraGries.deserialize(MGSpec(k=4), blob)
    assert back.heavy_hitters() == []
    with pytest.raises(ValueError):
        mg.merge(MisraGries(MGSpec(k=5)))
