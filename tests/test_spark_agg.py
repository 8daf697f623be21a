"""End-to-end Spark layer: distributed build (mapInArrow partials + merge)
must agree exactly with a single-process kernel build (SURVEY.md §5.2 item 2),
and probes must match their exact relational oracles at sf0.01."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.kernels import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
)
from sketchlib.spark import build_sketch, get_spark, probe
from sketchlib.spark.agg import sketch_partials, tree_merge
from sketchlib.specs import (
    BloomSpec,
    CBloomSpec,
    CmsSpec,
    HllSpec,
    KllSpec,
    TdBloomSpec,
    TDigestSpec,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sketchlib-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_hll_distinct_matches_exact(spark, events):
    kernel, rows = build_sketch(events, HllSpec(p=14), key="user_id")
    true = events.select(F.countDistinct("user_id")).first()[0]
    assert rows == events.count()
    assert abs(kernel.estimate() - true) / true <= 0.02


def test_distributed_equals_local_build(spark, events):
    """The north-rule core: Spark partitioned build ⇒ byte-identical state to
    a sequential local build, for every linear sketch kind."""
    keys = [str(r[0]) for r in events.select("user_id").collect()]

    spec = BloomSpec(20_000, 0.01)
    k_spark, _ = build_sketch(events.repartition(7), spec, key="user_id")
    k_local = BloomFilter(spec)
    k_local.update_strings(keys)
    assert k_spark.serialize() == k_local.serialize()

    hspec = HllSpec(p=12)
    h_spark, _ = build_sketch(events.repartition(5), hspec, key="user_id")
    h_local = HyperLogLog(hspec)
    h_local.update_strings(keys)
    assert h_spark.serialize() == h_local.serialize()

    cspec = CmsSpec(epsilon=0.001, delta=0.01)
    c_spark, _ = build_sketch(events.repartition(3), cspec, key="event_type")
    c_local = CountMinSketch(cspec)
    c_local.update_strings([str(r[0]) for r in events.select("event_type").collect()])
    assert c_spark.serialize() == c_local.serialize()


def test_bloom_probe_matches_semijoin(spark, events):
    """Membership probe vs exact left-semi join. p=1e-6 at sf0.01 scale ⇒
    expected false positives ≈ 0.01 over the probe set — deterministic data,
    verified exact here."""
    members = events.filter(F.col("event_type") == "purchase")
    kernel, _ = build_sketch(members, BloomSpec(10_000, 1e-6), key="user_id")
    flagged = (
        events.withColumn("hit", probe.probe_column(spark, kernel, "user_id"))
        .filter("hit")
        .select("user_id")
        .distinct()
    )
    exact = (
        events.join(members.select("user_id").distinct(), "user_id", "left_semi")
        .select("user_id")
        .distinct()
    )
    got = {r[0] for r in flagged.collect()}
    want = {r[0] for r in exact.collect()}
    assert want <= got, "bloom must never miss a member"
    assert got == want, f"false positives at p=1e-6: {got - want}"


def test_cms_estimates_vs_exact_counts(spark, events):
    kernel, _ = build_sketch(events, CmsSpec(epsilon=0.0005, delta=0.01), key="event_type")
    exact = dict(events.groupBy("event_type").count().collect())
    est = kernel.estimate_strings(list(exact))
    n = sum(exact.values())
    for (k, true), e in zip(exact.items(), est):
        assert e >= true
        assert e - true <= np.e / kernel.spec.width * n


def test_tdbloom_recency_probe(spark, events):
    bounds = events.select(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    t0, t1 = int(bounds[0]), int(bounds[1])
    window = (t1 - t0) // 3
    spec = TdBloomSpec(20_000, 0.001, timeout=window, start_time=t0)
    kernel, _ = build_sketch(events, spec, key="user_id", ts="ts")
    # exact recent users
    recent = {
        str(r[0])
        for r in events.filter(F.unix_timestamp("ts") >= t1 - window)
        .select("user_id")
        .distinct()
        .collect()
    }
    allu = [str(r[0]) for r in events.select("user_id").distinct().collect()]
    got = kernel.contains_strings(allu, as_of=t1)
    for u, g in zip(allu, got):
        if u in recent:
            assert g, f"recent user {u} missed"


def test_kll_tdigest_quantiles(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    kll, rows = build_sketch(li, KllSpec(k=200), values="l_extendedprice")
    td, _ = build_sketch(li, TDigestSpec(compression=200), values="l_extendedprice")
    assert rows == li.count()
    exact = li.selectExpr(
        "percentile(l_extendedprice, array(0.1, 0.5, 0.9)) as p"
    ).first()["p"]
    vals = np.array([r[0] for r in li.select("l_extendedprice").collect()])
    srt = np.sort(vals)
    for q, true in zip([0.1, 0.5, 0.9], exact):
        for est in (kll.quantile(q), td.quantile(q)):
            rank = np.searchsorted(srt, est) / srt.size
            assert abs(rank - q) <= 0.03, (q, est, true, rank)


def test_probe_udfs(spark, events):
    """count / as-of probe UDF paths (bloom path covered elsewhere)."""
    from sketchlib.specs import TdCBloomSpec

    cms, total = build_sketch(events, CmsSpec(epsilon=0.001, delta=0.01), key="event_type")
    est = events.select(
        "event_type", probe.count_udf(spark, cms)(F.col("event_type")).alias("est")
    ).distinct()
    exact = dict(events.groupBy("event_type").count().collect())
    for r in est.collect():
        assert r["est"] >= exact[r["event_type"]]

    bounds = events.select(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    t0, t1 = int(bounds[0]), int(bounds[1])
    w = (t1 - t0) // 2
    tdc, _ = build_sketch(
        events,
        TdCBloomSpec(100_000, 0.001, timeout=w, counter_bits=32, start_time=t0),
        key="user_id",
        ts="ts",
    )
    got = events.select(
        "user_id",
        probe.count_asof_udf(spark, tdc, t1)(F.col("user_id").cast("string")).alias("c"),
        probe.contains_asof_udf(spark, tdc, t1)(F.col("user_id").cast("string")).alias("hit"),
    ).distinct()
    recent = dict(
        events.filter(F.unix_timestamp("ts") >= t1 - w)
        .groupBy("user_id")
        .count()
        .collect()
    )
    for r in got.collect():
        if r["user_id"] in recent:
            assert r["hit"] and r["c"] >= recent[r["user_id"]]


def test_tree_merge_matches_flat(spark, events):
    spec = BloomSpec(20_000, 0.01)
    partials = sketch_partials(events.repartition(16), spec, key="user_id")
    merged_df = tree_merge(partials, spec, n_buckets=4)
    rows = merged_df.collect()
    assert len(rows) <= 4
    from sketchlib.spark.agg import _merge_blobs

    k_tree = _merge_blobs(spec.to_json(), [r["state"] for r in rows])
    k_flat, _ = build_sketch(events, spec, key="user_id")
    assert k_tree.serialize() == k_flat.serialize()
    assert sum(r["rows"] for r in rows) == events.count()


def test_build_sketch_tree_levels_end_to_end(spark, events):
    """fanin < partial count drives the Spark-side combine loop (with the
    spark_partition_id bucketing — even bucket counts used to collapse to
    one task); result byte-identical to the flat build."""
    spec = BloomSpec(20_000, 0.01)
    k_tree, n1 = build_sketch(
        events.repartition(16), spec, key="user_id", parallelism=16, fanin=4
    )
    k_flat, n2 = build_sketch(events, spec, key="user_id")
    assert n1 == n2 == events.count()
    assert k_tree.serialize() == k_flat.serialize()


def test_build_many_tree_levels_end_to_end(spark, events):
    """build_many with fanin < partial count runs the multi-state Spark-side
    combine (_tree_merge_many); every sketch byte-identical to the flat
    (driver-fold) build and to build_sketch."""
    from sketchlib.spark.agg import SketchJob, build_many
    from sketchlib.specs import CmsSpec, HllSpec

    jobs = [
        SketchJob("b", BloomSpec(20_000, 0.01), key="user_id"),
        SketchJob("h", HllSpec(p=12), key="user_id"),
        SketchJob("c", CmsSpec(epsilon=0.01, delta=0.01), key="event_type"),
    ]
    tree = build_many(events.repartition(16), jobs, parallelism=16, fanin=4)
    flat = build_many(events.repartition(16), jobs, parallelism=16)
    single, n_single = build_sketch(events, BloomSpec(20_000, 0.01), key="user_id")
    n = events.count()
    for name in ("b", "h", "c"):
        assert tree[name][1] == flat[name][1] == n
        assert tree[name][0].serialize() == flat[name][0].serialize()
    assert tree["b"][0].serialize() == single.serialize()
    assert n_single == n


def test_target_partials_heuristic(spark, events, tmp_path):
    """State-size-aware sizing: big state + small input -> floor(8);
    explicit parallelism wins; in-memory input falls back to the cap."""
    from sketchlib.spark.agg import _fresh_state_bytes, _target_partials

    big_state = 20 * 1024 * 1024
    path = str(tmp_path / "ev.parquet")
    events.write.parquet(path)
    on_disk = spark.read.parquet(path).repartition(16)
    # cap depends on the (shared, order-dependent) pytest session's cores
    cap = min(spark.sparkContext.defaultParallelism, 16)
    floor = min(8, cap)
    assert _target_partials(on_disk, big_state, None) == floor
    assert _target_partials(on_disk, big_state, 12) == 12
    # tiny state: the input-bytes budget allows fan-out up to the cap
    assert _target_partials(on_disk, 1, None) == cap
    # unknown input size (in-memory) -> session cap
    mem = events.repartition(16)
    assert _target_partials(mem, big_state, None) == cap
