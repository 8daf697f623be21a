"""KLL-driven range partitioning: bucket balance, monotonicity, stability."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.partitioning import (
    quantile_cuts,
    range_bucket,
    repartition_by_quantiles,
)
from sketchlib.specs import KllSpec

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("partitioning-tests", cpus=4, shuffle_partitions=4)


def test_buckets_are_monotone_and_balanced(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    n = 8
    bucketed = repartition_by_quantiles(events, "value", n)
    rows = (
        bucketed.groupBy("__bucket")
        .agg(F.count("*").alias("c"), F.min("value").alias("lo"), F.max("value").alias("hi"))
        .orderBy("__bucket")
        .collect()
    )
    total = sum(r["c"] for r in rows)
    assert len(rows) == n
    # balance: every bucket within 2x of ideal (KLL k=200 → ~1% rank error)
    for r in rows:
        assert r["c"] <= 2 * total / n, (r["__bucket"], r["c"], total)
    # monotone ranges: bucket i's max ≤ bucket i+1's min (ties allowed)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9
    # each bucket occupies exactly one partition id
    pids = (
        bucketed.withColumn("pid", F.spark_partition_id())
        .groupBy("__bucket")
        .agg(F.countDistinct("pid").alias("np"))
        .collect()
    )
    assert all(r["np"] == 1 for r in pids)


def test_stable_boundaries_from_stored_kernel(spark):
    """Reusing one kernel across two 'daily' jobs buckets identically —
    the property repartitionByRange cannot give."""
    from sketchlib.spark.agg import build_sketch

    events = spark.read.parquet(f"{SF}/events.parquet")
    kernel, _ = build_sketch(events, KllSpec(k=200), values="value")
    cuts1 = quantile_cuts(kernel, 16)
    cuts2 = quantile_cuts(kernel, 16)
    assert cuts1 == cuts2
    half = events.filter(F.col("event_id") % 2 == 0)
    a = half.withColumn("b", range_bucket("value", cuts1))
    b = half.withColumn("b", range_bucket("value", cuts2))
    assert a.select(F.sum(F.hash("event_id", "b")).alias("h")).first()["h"] == \
        b.select(F.sum(F.hash("event_id", "b")).alias("h")).first()["h"]


def test_null_values_bucket_zero(spark):
    df = spark.createDataFrame([(None,), (0.5,), (99.0,)], "value double")
    got = {r["value"]: r["b"] for r in df.withColumn("b", range_bucket("value", [1.0, 50.0])).collect()}
    assert got[None] == 0 and got[0.5] == 0 and got[99.0] == 2
