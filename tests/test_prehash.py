"""JVM-prehash fast path (spark/prehash.py): xxhash64 pairs computed in
whole-stage codegen, kernels ingest hashes instead of strings.

Contract under test:
- estimates keep their published bounds (HLL ±2%, bloom FPR ≤ ~1.5p with no
  false negatives, CMS never undercounts) under the xxhash64 family;
- build and probe share ONE hash expression (prehash_pair), so a prehashed
  probe over a prehashed build has zero false negatives;
- states stay merge-order-invariant (byte-identical across parallelism);
- null keys are dropped on build and probe False on probe;
- kinds without update_hashes are rejected up front.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.kernels import BloomFilter, CountMinSketch, HyperLogLog
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.spark import build_sketch, get_spark, probe
from sketchlib.spark.agg import SketchJob, build_many
from sketchlib.specs import BloomSpec, CmsSpec, HllSpec, KllSpec, TdBloomSpec


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-prehash-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def df(spark):
    """50k rows, 5k distinct users, zipfy tools, event times over 10 days,
    1k null keys."""
    base = spark.range(50_000).select(
        F.when(F.col("id") % 50 != 0, F.concat(F.lit("user_"), (F.col("id") % 5000).cast("string"))).alias("user"),
        F.concat(F.lit("tool_"), (F.pmod(F.col("id") * F.col("id"), F.lit(97))).cast("string")).alias("tool"),
        (F.lit(1_700_000_000) + (F.col("id") % 864_000)).alias("epoch"),
    )
    return base.withColumn("ts", F.col("epoch").cast("timestamp")).cache()


# ---------------------------------------------------------------- kernel level


def test_kernel_prehashed_membership_and_fpr():
    rng = np.random.default_rng(7)
    h1 = rng.integers(0, 2**63, 20_000, dtype=np.int64)
    h2 = rng.integers(0, 2**63, 20_000, dtype=np.int64)
    bf = BloomFilter(BloomSpec(20_000, 0.01))
    bf.update_hashes(h1, h2)
    assert bf.contains_hashes(h1, h2).all()  # no false negatives
    f1 = rng.integers(0, 2**63, 50_000, dtype=np.int64)
    f2 = rng.integers(0, 2**63, 50_000, dtype=np.int64)
    fpr = bf.contains_hashes(f1, f2).mean()
    assert fpr <= 0.015


def test_kernel_prehashed_hll_accuracy():
    rng = np.random.default_rng(11)
    # 100k distinct uniform 64-bit hashes ~ 100k distinct keys (full 64-bit
    # span, as xxhash64 produces — the top bits feed the register index)
    h = rng.integers(0, 2**64, 100_000, dtype=np.uint64).view(np.int64)
    hll = HyperLogLog(HllSpec(p=14))
    hll.update_hashes(h)
    est = hll.estimate()
    assert abs(est - 100_000) / 100_000 <= 0.02


def test_kernel_prehashed_cms_never_undercounts():
    rng = np.random.default_rng(3)
    n_keys = 500
    reps = rng.integers(1, 50, n_keys)
    h1 = np.repeat(rng.integers(0, 2**63, n_keys, dtype=np.int64), reps)
    h2 = np.repeat(rng.integers(0, 2**63, n_keys, dtype=np.int64), reps)
    cms = CountMinSketch(CmsSpec(epsilon=0.001, delta=0.01))
    cms.update_hashes(h1, h2)
    u1 = h1[np.unique(h1, return_index=True)[1]]
    u2 = h2[np.unique(h1, return_index=True)[1]]
    est = cms.estimate_hashes(u1, u2)
    exact = np.array([int((h1 == k).sum()) for k in u1])
    assert (est >= exact).all()
    assert (est - exact).max() <= cms.error_bound()


def test_kernel_prehashed_counting_kinds():
    """cbloom / tdcbloom / sbf prehashed ingest+probe: never undercount,
    no false negatives, freshness window honored."""
    from sketchlib.kernels.cbloom import CountingBloomFilter
    from sketchlib.kernels.sbf import SpectralBloomFilter
    from sketchlib.kernels.tdcbloom import TdCBloomFilter
    from sketchlib.specs import CBloomSpec, SbfSpec, TdCBloomSpec

    rng = np.random.default_rng(13)
    n_keys = 300
    reps = rng.integers(1, 20, n_keys)
    k1 = rng.integers(0, 2**63, n_keys, dtype=np.int64)
    k2 = rng.integers(0, 2**63, n_keys, dtype=np.int64)
    h1, h2 = np.repeat(k1, reps), np.repeat(k2, reps)

    cb = CountingBloomFilter(CBloomSpec(5_000, 0.01, counter_bits=16))
    cb.update_hashes(h1, h2)
    assert cb.contains_hashes(k1, k2).all()
    assert (cb.count_hashes(k1, k2) >= reps).all()

    sbf = SpectralBloomFilter(SbfSpec(5_000, 0.01, counter_bits=16))
    sbf.update_hashes(h1, h2)
    assert sbf.contains_hashes(k1, k2).all()
    assert (sbf.estimate_hashes(k1, k2) >= reps).all()

    t0 = 1_700_000_000
    td = TdCBloomFilter(
        TdCBloomSpec(5_000, 0.01, timeout=100, start_time=t0, counter_bits=16)
    )
    ts = np.full(h1.size, t0 + 10, dtype=np.int64)
    td.update_hashes(h1, h2, ts)
    assert td.contains_hashes(k1, k2, as_of=t0 + 50).all()
    assert (td.count_hashes(k1, k2, as_of=t0 + 50) >= reps).all()
    assert (td.count_hashes(k1, k2, as_of=t0 + 500) == 0).all()


def test_kernel_prehashed_tdbloom_asof():
    t0 = 1_700_000_000
    td = TdBloomFilter(TdBloomSpec(1000, 0.001, timeout=100, start_time=t0))
    rng = np.random.default_rng(5)
    h1 = rng.integers(0, 2**63, 200, dtype=np.int64)
    h2 = rng.integers(0, 2**63, 200, dtype=np.int64)
    ts = np.full(200, t0 + 10, dtype=np.int64)
    td.update_hashes(h1, h2, ts)
    assert td.contains_hashes(h1, h2, as_of=t0 + 50).all()
    assert not td.contains_hashes(h1, h2, as_of=t0 + 500).any()


# ------------------------------------------------------------------ spark path


def test_build_many_prehash_estimates(spark, df):
    n = df.count()
    jobs = [
        SketchJob("hll_user", HllSpec(p=14), key="user", prehash=True),
        SketchJob("bloom_user", BloomSpec(60_000, 0.01), key="user", prehash=True),
        SketchJob("cms_tool", CmsSpec(epsilon=0.001, delta=0.01), key="tool", prehash=True),
        SketchJob(
            "td_user",
            TdBloomSpec(60_000, 0.001, timeout=20 * 86400, start_time=1_700_000_000),
            key="user",
            ts="ts",
            prehash=True,
        ),
    ]
    out = build_many(df, jobs)
    assert out["hll_user"][1] == n  # total rows, before per-key null drops

    hll = out["hll_user"][0]
    true = df.filter(F.col("user").isNotNull()).select(F.countDistinct("user")).first()[0]
    assert abs(hll.estimate() - true) / true <= 0.02

    # CMS point estimates never undercount the exact tool counts
    cms = out["cms_tool"][0]
    exact = dict(df.groupBy("tool").count().collect())
    probe_df = df.select("tool").distinct()
    est_rows = probe_df.withColumn(
        "est",
        probe.count_hashes_column(spark, cms, F.col("tool")),
    ).collect()
    for r in est_rows:
        assert r["est"] >= exact[r["tool"]]


def test_prehash_probe_no_false_negatives_and_null_false(spark, df):
    spec = BloomSpec(60_000, 0.01)
    kernel, _ = build_sketch(df, spec, key="user", prehash=True)
    probed = df.withColumn(
        "hit", probe.probe_column(spark, kernel, "user", prehash=True)
    )
    # every non-null inserted key probes True; every null key probes False
    agg = probed.agg(
        F.sum(F.when(F.col("user").isNotNull() & ~F.col("hit"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(F.col("user").isNull() & F.col("hit"), 1).otherwise(0)).alias("nullhits"),
    ).first()
    assert agg["fn"] == 0
    assert agg["nullhits"] == 0

    # fresh keys: FPR within budget
    fresh = spark.range(20_000).select(
        F.concat(F.lit("ghost_"), F.col("id").cast("string")).alias("user")
    )
    fpr = (
        fresh.withColumn("hit", probe.probe_column(spark, kernel, "user", prehash=True))
        .agg(F.avg(F.col("hit").cast("double")))
        .first()[0]
    )
    assert fpr <= 0.015


def test_prehash_tdbloom_probe_asof(spark, df):
    t0 = 1_700_000_000
    spec = TdBloomSpec(60_000, 0.001, timeout=86_400, start_time=t0)
    kernel, _ = build_sketch(df, spec, key="user", ts="ts", prehash=True)
    # every user seen within the last day of the data is fresh as-of max ts
    tmax = int(df.agg(F.max("epoch")).first()[0])
    recent = (
        df.filter(F.col("user").isNotNull() & (F.col("epoch") >= tmax - 86_400))
        .select("user")
        .distinct()
    )
    misses = (
        recent.withColumn(
            "hit", probe.probe_column(spark, kernel, "user", as_of=tmax, prehash=True)
        )
        .filter(~F.col("hit"))
        .count()
    )
    assert misses == 0


def test_prehash_merge_order_invariance(spark, df):
    """Byte-identical states regardless of partial count — associativity
    holds for the prehashed family exactly as for mmh3."""
    spec = BloomSpec(60_000, 0.01)
    a, _ = build_sketch(df.repartition(7), spec, key="user", prehash=True)
    b, _ = build_sketch(df.repartition(3), spec, key="user", prehash=True)
    assert a.serialize() == b.serialize()

    hspec = HllSpec(p=12)
    ha, _ = build_sketch(df.repartition(5), hspec, key="user", prehash=True)
    hb, _ = build_sketch(df.coalesce(1), hspec, key="user", prehash=True)
    assert ha.serialize() == hb.serialize()


def test_prehash_rejects_unsupported_kind(spark, df):
    with pytest.raises(ValueError, match="prehash"):
        build_sketch(df, KllSpec(k=200), key="user", prehash=True)


def test_prehash_differs_from_mmh3_state(spark, df):
    """Documented: the prehashed family is NOT bit-compatible with mmh3."""
    spec = BloomSpec(60_000, 0.01)
    pre, _ = build_sketch(df, spec, key="user", prehash=True)
    par, _ = build_sketch(df, spec, key="user")
    assert pre.serialize() != par.serialize()


def test_count_hashes_column_as_of_validation(spark):
    """Timed-ness comes from the kernel KIND: a tdcbloom probe without
    as_of (or a cms probe with one) fails loudly at the driver, not with an
    opaque executor-side TypeError inside the pandas UDF."""
    from sketchlib.kernels import CountMinSketch, TdCBloomFilter
    from sketchlib.specs import CmsSpec, TdCBloomSpec

    cms = CountMinSketch(CmsSpec(epsilon=0.01, delta=0.1))
    with pytest.raises(ValueError, match="not time-decaying"):
        probe.count_hashes_column(spark, cms, F.col("x"), as_of=123)
    td = TdCBloomFilter(TdCBloomSpec(100, 0.01, timeout=60, start_time=0))
    with pytest.raises(ValueError, match="need as_of"):
        probe.count_hashes_column(spark, td, F.col("x"))


def test_prehash_lane_sql_matches_prehash_pair(spark):
    """The SQL-text lanes hash identically to prehash_pair over a
    non-string column — the cross-path merge-compatibility contract."""
    from sketchlib.spark.prehash import prehash_lane_sql, prehash_pair

    df = spark.range(100).select(F.col("id").alias("user_id"))
    l1, l2 = prehash_lane_sql("user_id")
    h1, h2 = prehash_pair("user_id")
    got = df.select(
        F.expr(l1).alias("a1"), F.expr(l2).alias("a2"),
        h1.alias("b1"), h2.alias("b2"),
    ).collect()
    assert all(r["a1"] == r["b1"] and r["a2"] == r["b2"] for r in got)
