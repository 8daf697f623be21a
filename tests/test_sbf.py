"""Spectral Bloom filter (Cohen–Matias MI/MS/RM): one-sided bounds, MI
dominance over the plain counting-bloom update, merge algebra, serde,
distributed build."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketchlib.kernels import CountingBloomFilter, SpectralBloomFilter
from sketchlib.specs import CBloomSpec, SbfSpec


def _zipf_keys(n, n_keys, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n) % n_keys
    return [f"key{r}".encode() for r in ranks]


def _build(spec, keys, batch=8192):
    f = SpectralBloomFilter(spec)
    for i in range(0, len(keys), batch):
        f.update_strings(keys[i : i + batch])
    return f


def test_never_undercounts_and_mi_dominates_cbf():
    keys = _zipf_keys(50_000, 2_000, seed=7)
    true = Counter(keys)
    spec = SbfSpec(2_000, 0.01)
    sbf = _build(spec, keys)
    cbf = CountingBloomFilter(CBloomSpec(2_000, 0.01, counter_bits=16))
    for i in range(0, len(keys), 8192):
        cbf.update_strings(keys[i : i + 8192])

    uniq = list(true)
    tv = np.array([true[k] for k in uniq])
    ms = sbf.estimate_strings(uniq)
    rm = sbf.estimate_rm_strings(uniq)
    cb = cbf.count_strings(uniq)
    assert (ms >= tv).all(), "MS estimate must never undercount"
    assert (rm >= tv).all(), "RM estimate must never undercount here"
    # MI (= conservative update) dominates the basic counting-bloom update
    # cell-wise, so point estimates are never looser and usually tighter
    assert (ms <= cb).all()
    assert (ms - tv).mean() < (cb - tv).mean()
    # RM only ever shaves collision inflation off MS
    assert (rm <= ms).all()
    # membership agrees with count > 0
    assert (sbf.contains_strings(uniq) == (ms > 0)).all()
    assert not sbf.contains_strings([b"certainly-absent-key-xyz"])[0]


def test_exact_on_tiny_fixture():
    # the style of the reference's cbloom unit test (count 2/5 after adds)
    f = SpectralBloomFilter(SbfSpec(100, 0.001))
    f.update_strings([b"multi", b"multi"])
    f.update_strings([b"multi"] * 3 + [b"single"])
    assert int(f.estimate_strings([b"multi"])[0]) == 5
    assert int(f.estimate_strings([b"single"])[0]) == 1
    assert int(f.estimate_strings([b"absent"])[0]) == 0
    assert int(f.estimate_rm_strings([b"multi"])[0]) == 5


def test_saturating_cap_and_clear():
    spec = SbfSpec(50, 0.01, counter_bits=8)
    f = SpectralBloomFilter(spec)
    f.update_strings([b"x"] * 300)  # cap at 255
    assert int(f.estimate_strings([b"x"])[0]) == 255
    g = SpectralBloomFilter(spec)
    g.update_strings([b"x"] * 10)
    f.merge(g)  # saturating: stays at cap
    assert int(f.estimate_strings([b"x"])[0]) == 255
    f.clear()
    assert int(f.estimate_strings([b"x"])[0]) == 0
    assert f.saturation_count() == 0


def test_remove_unsupported_under_mi():
    f = SpectralBloomFilter(SbfSpec(100, 0.01))
    with pytest.raises(NotImplementedError):
        f.remove(None, None)


def test_merge_preserves_bound_and_incompatible_raises():
    keys = _zipf_keys(40_000, 1_000, seed=11)
    true = Counter(keys)
    spec = SbfSpec(1_000, 0.01)
    quarters = [keys[i::4] for i in range(4)]
    parts = [_build(spec, q) for q in quarters]
    merged = SpectralBloomFilter.deserialize(spec, parts[0].serialize())
    for p in parts[1:]:
        merged.merge(p)
    uniq = list(true)
    tv = np.array([true[k] for k in uniq])
    assert (merged.estimate_strings(uniq) >= tv).all()
    with pytest.raises(ValueError):
        merged.merge(SpectralBloomFilter(SbfSpec(1_001, 0.01)))


@settings(max_examples=20, deadline=None)
@given(st.permutations(list(range(5))))
def test_merge_order_byte_identical(order):
    """For a FIXED partitioning, any merge order of the partials yields a
    byte-identical state (saturating add is associative+commutative).  The
    partitioning itself may change the state — MI is placement-dependent,
    like Misra-Gries (module docstring)."""
    keys = _zipf_keys(5_000, 300, seed=13)
    spec = SbfSpec(300, 0.01, counter_bits=16)
    parts = [_build(spec, keys[i::5]) for i in range(5)]
    ref = SpectralBloomFilter.deserialize(spec, parts[0].serialize())
    for p in parts[1:]:
        ref.merge(p)
    acc = SpectralBloomFilter.deserialize(spec, parts[order[0]].serialize())
    for i in order[1:]:
        acc.merge(parts[i])
    assert acc.serialize() == ref.serialize()


def test_serde_roundtrip_includes_secondary():
    spec = SbfSpec(500, 0.01)
    f = _build(spec, _zipf_keys(10_000, 400, seed=17))
    blob = f.serialize()
    assert len(blob) == (spec.m + spec.rm_m) * spec.dtype.itemsize
    back = SpectralBloomFilter.deserialize(spec, blob)
    assert back.serialize() == blob
    assert (back.rm_counters == f.rm_counters).all()


def test_rm_tightens_on_colliding_load():
    """Overload a small filter so MS suffers collisions: RM must be ≤ MS
    everywhere and strictly tighter somewhere, and still one-sided on the
    whole-stream build (single-filter setting of the paper)."""
    keys = _zipf_keys(30_000, 5_000, seed=23)
    true = Counter(keys)
    spec = SbfSpec(500, 0.05)  # ~10x overloaded
    f = _build(spec, keys)
    uniq = list(true)
    tv = np.array([true[k] for k in uniq])
    ms = f.estimate_strings(uniq)
    rm = f.estimate_rm_strings(uniq)
    assert (rm <= ms).all()
    assert (rm < ms).any(), "RM should shave some collision inflation"
    assert (ms >= tv).all()


def test_distributed_build_probe_and_store_roundtrip(tmp_path):
    from pyspark.sql import functions as F

    from sketchlib.spark import build_sketch, get_spark, probe

    spark = get_spark("sbf-tests", cpus=4, shuffle_partitions=4)
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    spec = SbfSpec(1_000, 0.001, counter_bits=32)
    kernel, _ = build_sketch(events, spec, key="event_type")
    exact = {
        r["event_type"]: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    est = kernel.estimate_strings(list(exact))
    for key, e in zip(exact, est):
        assert e >= exact[key]
    # broadcast probe UDFs work for the sbf kind (membership + count)
    probed = (
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            probe.probe_column(spark, kernel, "event_type").alias("hit"),
            probe.count_udf(spark, kernel)(F.col("event_type")).alias("est"),
        )
        .collect()
    )
    for r in probed:
        assert r["hit"] and r["est"] >= exact[r["event_type"]]
    # checkpoint store round-trip preserves both arrays
    from sketchlib.store import SketchStore

    store = SketchStore(str(tmp_path / "store"))
    store.save_kernel("sbf_types", kernel)
    back, _metrics = store.load_kernel("sbf_types")
    assert back.serialize() == kernel.serialize()
    assert back.spec == spec
