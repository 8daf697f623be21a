"""SQL-surface sketch aggregates (spark/sql_udaf.py): grouped sketch states
from spark.sql / DataFrame agg, re-aggregation, estimates within bounds."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.kernels import BloomFilter, HyperLogLog
from sketchlib.spark import get_spark
from sketchlib.spark.agg import _unpack_state, build_sketch
from sketchlib.spark.prehash import PREHASH_SALT, prehash_pair
from sketchlib.spark.sql_udaf import (
    hll_estimate_udf,
    register_sql_udafs,
    saturation_udf,
    sketch_state_agg,
    state_merge_agg,
)
from sketchlib.specs import BloomSpec, HllSpec, KllSpec, TdBloomSpec


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-sql-udaf-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def df(spark):
    """40k rows over 10 days; per-day distinct users differ by day."""
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 10).alias("day"),
            F.concat(F.lit("u"), (F.col("id") % ((F.col("id") % 10 + 1) * 400)).cast("string")).alias("user"),
            (F.lit(1_700_000_000) + F.col("id")).alias("epoch"),
        )
        .cache()
    )


def test_sql_hll_per_group_estimates(spark, df):
    df.createOrReplaceTempView("t_udaf")
    spec = HllSpec(p=14)
    register_sql_udafs(spark, spec, "hll14")
    rows = spark.sql(
        """
        SELECT day, hll14_estimate(hll14_state(xxhash64(user))) AS est
        FROM t_udaf WHERE user IS NOT NULL GROUP BY day
        """
    ).collect()
    exact = dict(
        df.groupBy("day").agg(F.countDistinct("user").alias("d")).collect()
    )
    assert len(rows) == 10
    for r in rows:
        true = exact[r["day"]]
        assert abs(r["est"] - true) / true <= 0.03


def test_sql_merge_reaggregation_matches_direct(spark, df):
    """Day states merged in SQL == one direct build (byte-identical)."""
    spec = HllSpec(p=12)
    agg = sketch_state_agg(spec)
    merge = state_merge_agg(spec)
    h1, _ = prehash_pair(F.col("user"))
    day_states = df.groupBy("day").agg(agg(h1).alias("state"))
    merged_blob = bytes(
        day_states.agg(merge(F.col("state")).alias("s")).first()["s"]
    )
    direct, _ = build_sketch(df, spec, key="user", prehash=True)
    assert _unpack_state(merged_blob) == direct.serialize()


def test_sql_bloom_two_lane_state(spark, df):
    """A bloom state aggregated per group answers membership for that
    group's keys (deserialize and probe kernel-side)."""
    spec = BloomSpec(10_000, 0.001)
    agg = sketch_state_agg(spec)
    h1, h2 = prehash_pair(F.col("user"))
    one = (
        df.filter(F.col("day") == 3)
        .agg(agg(h1, h2).alias("state"))
        .first()["state"]
    )
    kernel = BloomFilter.deserialize(spec, _unpack_state(bytes(one)))
    # probe with the same JVM hash pair, collected for the kernel check
    probes = (
        df.filter(F.col("day") == 3)
        .select(h1.alias("a"), h2.alias("b"))
        .distinct()
        .collect()
    )
    a = np.array([r["a"] for r in probes], dtype=np.int64)
    b = np.array([r["b"] for r in probes], dtype=np.int64)
    assert kernel.contains_hashes(a, b).all()


def test_sql_tdbloom_ts_lane(spark, df):
    spec = TdBloomSpec(10_000, 0.001, timeout=1000, start_time=1_700_000_000)
    agg = sketch_state_agg(spec)
    h1, h2 = prehash_pair(F.col("user"))
    blob = (
        df.filter(F.col("epoch") < 1_700_000_500)
        .agg(agg(h1, h2, F.col("epoch")).alias("s"))
        .first()["s"]
    )
    from sketchlib.kernels.tdbloom import TdBloomFilter

    k = TdBloomFilter.deserialize(spec, _unpack_state(bytes(blob)))
    probes = (
        df.filter(F.col("epoch") < 1_700_000_500)
        .select(h1.alias("a"), h2.alias("b"))
        .distinct()
        .collect()
    )
    a = np.array([r["a"] for r in probes], dtype=np.int64)
    b = np.array([r["b"] for r in probes], dtype=np.int64)
    assert k.contains_hashes(a, b, as_of=1_700_000_600).all()


def test_sql_kll_values_lane(spark):
    spec = KllSpec(k=200)
    agg = sketch_state_agg(spec)
    vals = spark.range(100_000).select((F.col("id") / 1000.0).alias("v"))
    blob = vals.agg(agg(F.col("v")).alias("s")).first()["s"]
    from sketchlib.kernels.kll import KllSketch

    k = KllSketch.deserialize(spec, _unpack_state(bytes(blob)))
    med = k.quantile(0.5)
    assert abs(med - 50.0) / 50.0 <= 0.05


def test_sql_quantile_udf_per_group(spark):
    """Per-group t-digest states read by a registered quantile UDF."""
    from sketchlib.spark.sql_udaf import quantile_udf
    from sketchlib.specs import TDigestSpec

    spec = TDigestSpec()
    agg = sketch_state_agg(spec)
    p50 = quantile_udf(spec, 0.5)
    vals = spark.range(60_000).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") % 3 + 1) * (F.col("id") % 1000) / 1.0).alias("v"),
    )
    rows = vals.groupBy("g").agg(p50(agg(F.col("v"))).alias("med")).collect()
    for r in rows:
        true_med = (r["g"] + 1) * 999 / 2.0
        assert abs(r["med"] - true_med) / true_med <= 0.05


def test_sql_float_lane_rejected(spark, df):
    """A lane with nulls arrives as float — must fail loudly, not corrupt."""
    spec = HllSpec(p=12)
    agg = sketch_state_agg(spec)
    h1, _ = prehash_pair(F.when(F.col("day") != 0, F.col("user")))
    with pytest.raises(Exception, match="integer|lane"):
        df.agg(agg(h1).alias("s")).collect()


def test_sql_saturation_udf(spark, df):
    spec = BloomSpec(10_000, 0.01)
    agg = sketch_state_agg(spec)
    sat = saturation_udf(spec)
    h1, h2 = prehash_pair(F.col("user"))
    row = df.agg(sat(agg(h1, h2)).alias("pct")).first()
    assert 0.0 < row["pct"] < 100.0
