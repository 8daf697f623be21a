"""Day-partitioned sketch rollups: per-bucket states, range merges, pruned
reads (sketchlib/spark/rollup.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.agg import build_sketch
from sketchlib.spark.rollup import merge_range, read_rollup, sketch_rollup, write_rollup
from sketchlib.specs import BloomSpec, HllSpec, TdBloomSpec

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("rollup-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_rollup_full_merge_equals_direct_build(spark, events):
    """Merging ALL day states must be byte-identical to one direct build
    (associativity is the whole point)."""
    spec = HllSpec(p=12)
    rollup = sketch_rollup(events, spec, key="user_id")
    merged, n = merge_range(rollup, spec)
    direct, n2 = build_sketch(events, spec, key="user_id")
    assert merged.serialize() == direct.serialize()
    assert n == n2


def test_rollup_range_query_matches_filtered_build(spark, events):
    """A [d1, d2] range merge equals building directly over the filtered
    rows — for bloom (OR merge) byte-identical."""
    days = [r[0] for r in events.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()]
    assert len(days) >= 3
    d1, d2 = days[1], days[min(len(days) - 1, 3)]
    spec = BloomSpec(50_000, 0.001)
    rollup = sketch_rollup(events, spec, key="user_id")
    merged, n = merge_range(rollup, spec, start=d1, end=d2)
    subset = events.filter((F.to_date("ts") >= F.lit(d1)) & (F.to_date("ts") <= F.lit(d2)))
    direct, n2 = build_sketch(subset, spec, key="user_id")
    assert merged.serialize() == direct.serialize()
    assert n == n2


def test_rollup_tdbloom_event_time(spark, events):
    """Time-decaying kernels roll up too (ts column threaded through)."""
    t0 = int(events.select(F.min(F.unix_timestamp("ts"))).first()[0])
    t1 = int(events.select(F.max(F.unix_timestamp("ts"))).first()[0])
    spec = TdBloomSpec(50_000, 0.001, timeout=max((t1 - t0) // 2, 1), start_time=t0)
    rollup = sketch_rollup(events, spec, key="user_id", ts="ts")
    merged, _ = merge_range(rollup, spec)
    direct, _ = build_sketch(events, spec, key="user_id", ts="ts")
    assert merged.serialize() == direct.serialize()


def test_rollup_persist_and_pruned_read(spark, events, tmp_path):
    spec = HllSpec(p=12)
    rollup = sketch_rollup(events, spec, key="user_id")
    path = str(tmp_path / "rollup")
    write_rollup(rollup, path)
    days = sorted(r[0] for r in rollup.select("bucket").collect())
    mid = days[len(days) // 2]
    pruned = read_rollup(spark, path, start=mid)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:600]
    # merge over the persisted, pruned read equals merge over the in-memory df
    k1, n1 = merge_range(pruned, spec)
    k2, n2 = merge_range(rollup, spec, start=mid)
    assert k1.serialize() == k2.serialize() and n1 == n2


def test_rollup_empty_and_null_ts(spark):
    """Empty input -> empty rollup; null-ts rows dropped, not crashed."""
    spec = HllSpec(p=12)
    empty = spark.createDataFrame([], "user_id string, ts timestamp")
    assert sketch_rollup(empty, spec, key="user_id").count() == 0
    mixed = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00"), ("u2", None)],
        "user_id string, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    roll = sketch_rollup(mixed, spec, key="user_id")
    rows = roll.collect()
    assert len(rows) == 1 and rows[0]["rows"] == 1
    merged, n = merge_range(roll, spec)
    assert n == 1 and round(merged.estimate()) == 1
