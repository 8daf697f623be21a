"""Pure-Catalyst HLL build (spark/hll_sql.py): byte-identity with the
kernel path, estimate bounds, null handling, merge compatibility."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.kernels import HyperLogLog
from sketchlib.spark import build_sketch, get_spark
from sketchlib.spark.hll_sql import build_hll_sql, hll_register_rows
from sketchlib.specs import HllSpec


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-hll-sql-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(60_000).select(
        F.when(F.col("id") % 40 != 0, F.concat(F.lit("k"), (F.col("id") % 7000).cast("string"))).alias("key"),
        (F.col("id") % 5).alias("g"),
    ).cache()


def test_sql_build_byte_identical_to_prehash_kernel(spark, df):
    spec = HllSpec(p=14)
    k_sql = build_hll_sql(df, spec, "key")
    k_ker, _ = build_sketch(df, spec, key="key", prehash=True)
    assert k_sql.serialize() == k_ker.serialize()


def test_sql_build_estimate_bound(spark, df):
    spec = HllSpec(p=14)
    k = build_hll_sql(df, spec, "key")
    true = df.filter(F.col("key").isNotNull()).select(F.countDistinct("key")).first()[0]
    assert abs(k.estimate() - true) / true <= 0.02


def test_sql_build_empty_and_null_only(spark):
    spec = HllSpec(p=12)
    empty = spark.range(0).select(F.col("id").cast("string").alias("key"))
    k = build_hll_sql(empty, spec, "key")
    assert k.estimate() == 0.0
    nulls = spark.range(100).select(F.lit(None).cast("string").alias("key"))
    k2 = build_hll_sql(nulls, spec, "key")
    assert k2.estimate() == 0.0


def test_sql_build_merges_with_prehash_kernel(spark, df):
    """SQL-built and kernel-built halves merge to the same state as one
    build over the union (same xxhash64 family)."""
    spec = HllSpec(p=12)
    lo = df.filter(F.col("g") < 2)
    hi = df.filter(F.col("g") >= 2)
    a = build_hll_sql(lo, spec, "key")
    b, _ = build_sketch(hi, spec, key="key", prehash=True)
    merged = a.merge(b)
    full = build_hll_sql(df, spec, "key")
    assert merged.serialize() == full.serialize()


def test_sql_rollup_day_states(spark):
    """SQL-grouped rollup: per-day states equal independent per-day SQL
    builds byte-for-byte; merge_range over the frame answers the
    whole-window distinct within bounds."""
    from sketchlib.spark.hll_sql import hll_sql_rollup
    from sketchlib.spark.rollup import merge_range

    spec = HllSpec(p=12)
    df = spark.range(30_000).select(
        F.concat(F.lit("u"), (F.col("id") % 4000).cast("string")).alias("key"),
        (F.lit(1_700_000_000) + (F.col("id") % 3) * 86_400).cast("timestamp").alias("ts"),
    )
    roll = hll_sql_rollup(df, spec, "key").cache()
    assert roll.count() == 3
    from sketchlib.spark.agg import _unpack_state

    for r in roll.collect():
        day_df = df.filter(F.to_date("ts") == r["bucket"])
        direct = build_hll_sql(day_df, spec, "key")
        assert _unpack_state(bytes(r["state"])) == direct.serialize()
        assert r["rows"] == day_df.count()
    kernel, total = merge_range(roll, spec)
    true = df.select(F.countDistinct("key")).first()[0]
    assert total == df.count()
    assert abs(kernel.estimate() - true) / true <= 0.03


def test_register_rows_bounded(spark, df):
    spec = HllSpec(p=10)
    rows = hll_register_rows(df, spec, "key")
    cnt = rows.count()
    assert cnt <= spec.m
    mx = rows.agg(F.max("rho")).first()[0]
    assert mx <= 64 - spec.p + 1
