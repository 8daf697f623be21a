"""Bottom-k / KMV sketch: deterministic distinct sample, cardinality bound,
byte-identical merges, Jaccard, distributed build."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.kernels import BottomK
from sketchlib.specs import BottomKSpec


def test_exact_under_k():
    bk = BottomK(BottomKSpec(k=64))
    bk.update_strings([f"x{i}" for i in range(10)] * 3)  # dup updates no-op
    assert bk.distinct_estimate() == 10.0
    assert len(bk.sample()) == 10


def test_cardinality_bound():
    k = 256
    bk = BottomK(BottomKSpec(k=k))
    n = 50_000
    bk.update_strings([f"user-{i}" for i in range(n)])
    est = bk.distinct_estimate()
    # rel err ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - n) / n <= 4 / np.sqrt(k - 2)


def test_merge_byte_identical_any_order():
    spec = BottomKSpec(k=128)
    keys = [f"k{i}" for i in range(5_000)]
    chunks = [keys[i::5] for i in range(5)]
    import itertools
    import random

    def build(order):
        parts = []
        for c in order:
            b = BottomK(spec)
            b.update_strings(c)
            parts.append(b)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        return acc.serialize()

    base = build(chunks)
    rng = random.Random(7)
    for _ in range(4):
        o = chunks[:]
        rng.shuffle(o)
        assert build(o) == base
    # and equals the single-pass build
    one = BottomK(spec)
    one.update_strings(keys)
    assert one.serialize() == base


def test_sample_is_deterministic_distinct_subset():
    spec = BottomKSpec(k=32)
    a = BottomK(spec); a.update_strings([f"d{i}" for i in range(1000)])
    b = BottomK(spec); b.update_strings([f"d{i}" for i in reversed(range(1000))])
    assert a.serialize() == b.serialize()  # order-of-ingest invariant
    assert len(set(a.sample())) == 32


def test_jaccard_estimate():
    spec = BottomKSpec(k=512)
    a = BottomK(spec); a.update_strings([f"j{i}" for i in range(0, 3000)])
    b = BottomK(spec); b.update_strings([f"j{i}" for i in range(1500, 4500)])
    true_j = 1500 / 4500
    assert abs(a.jaccard(b) - true_j) <= 0.08


def test_serde_roundtrip():
    bk = BottomK(BottomKSpec(k=16))
    bk.update_strings([f"s{i}" for i in range(100)])
    blob = bk.serialize()
    back = BottomK.deserialize(BottomKSpec(k=16), blob)
    assert back.serialize() == blob
    assert back.sample() == bk.sample()


def test_distributed_build_matches_local():
    from pyspark.sql import functions as F

    from sketchlib.spark import build_sketch, get_spark

    spark = get_spark("bottomk-tests", cpus=4, shuffle_partitions=4)
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    spec = BottomKSpec(k=128)
    kernel, _ = build_sketch(events, spec, key="user_id")
    local = BottomK(spec)
    local.update_strings(
        [str(r[0]) for r in events.select("user_id").collect()]
    )
    assert kernel.serialize() == local.serialize()
    true_d = events.select(F.countDistinct("user_id")).first()[0]
    if true_d < 128:
        assert kernel.distinct_estimate() == float(true_d)


def test_empty_and_incompatible():
    spec = BottomKSpec(k=8)
    a = BottomK(spec)
    assert a.distinct_estimate() == 0.0 and a.sample() == []
    b = BottomK(spec); b.update_strings(["x"])
    a.merge(b)
    assert a.sample() == [b"x"]
    with pytest.raises(ValueError):
        a.merge(BottomK(BottomKSpec(k=9)))
    blob = BottomK(spec).serialize()
    assert BottomK.deserialize(spec, blob).sample() == []
