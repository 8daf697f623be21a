"""Distributed (key-sharded) cuckoo filter: build via groupBy(shard) ->
applyInArrow, probe via routed broadcast UDF (SURVEY.md §7 hard part 3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.cuckoo_dist import build_sharded_cuckoo, cuckoo_probe_column
from sketchlib.specs import CuckooSpec

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("cuckoo-dist-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )


def test_sharded_no_false_negatives(spark, docs):
    members = docs.filter(F.col("id") % 3 == 0)
    spec = CuckooSpec(2048, bucket_size=4, seed=1)
    sh = build_sharded_cuckoo(members, "id", spec, n_shards=4)
    hits = members.withColumn("hit", cuckoo_probe_column(spark, sh, "id"))
    assert hits.filter(~F.col("hit")).count() == 0


def test_sharded_fpr_bounded(spark, docs):
    members = docs.filter(F.col("id") % 3 == 0)
    non = docs.filter(F.col("id") % 3 != 0)
    spec = CuckooSpec(2048, bucket_size=4, seed=1)
    sh = build_sharded_cuckoo(members, "id", spec, n_shards=4)
    fp = non.withColumn("hit", cuckoo_probe_column(spark, sh, "id")).filter("hit").count()
    # published bound ~ 2*bs/2^16 ~ 1.2e-4; give 100x slack on small n
    assert fp / max(non.count(), 1) <= 0.01


def test_sharded_remove_via_ops(spark, docs):
    """op column: insert evens, remove multiples of 10 in the same pass."""
    ins = docs.filter(F.col("id") % 2 == 0).select("id", F.lit(1).alias("op"))
    rem = docs.filter(F.col("id") % 10 == 0).select("id", F.lit(-1).alias("op"))
    spec = CuckooSpec(2048, bucket_size=4, seed=1)
    sh = build_sharded_cuckoo(ins.unionByName(rem), "id", spec, n_shards=4, op="op")
    kept = docs.filter((F.col("id") % 2 == 0) & (F.col("id") % 10 != 0))
    hits = kept.withColumn("hit", cuckoo_probe_column(spark, sh, "id"))
    assert hits.filter(~F.col("hit")).count() == 0


def test_shard_routing_matches_build(spark, docs):
    """Keys must probe the shard they were built into — same JVM hash both
    sides; a routing mismatch would show up as mass false negatives."""
    spec = CuckooSpec(1024, bucket_size=4, seed=1)
    sh = build_sharded_cuckoo(docs, "id", spec, n_shards=7)  # odd shard count
    assert len(sh.blobs) == 7
    hits = docs.withColumn("hit", cuckoo_probe_column(spark, sh, "id"))
    assert hits.filter(~F.col("hit")).count() == 0
    assert 0.0 < sh.load_factor() < 100.0


def test_overflow_raises(spark):
    tiny = CuckooSpec(2, bucket_size=1, max_kicks=3, seed=1)
    big = spark.range(5000).select(F.col("id"))
    with pytest.raises(RuntimeError, match="overflow"):
        build_sharded_cuckoo(big, "id", tiny, n_shards=2)


def test_probe_null_keys(spark, docs):
    """A nullable probe column must not crash the routed probe UDF (null
    routes to a NaN shard); null keys simply probe False."""
    spec = CuckooSpec(2048, bucket_size=4, seed=1)
    sh = build_sharded_cuckoo(docs, "id", spec, n_shards=4)
    with_nulls = docs.unionByName(
        spark.range(5).select(F.lit(None).cast("long").alias("id"))
    )
    hits = with_nulls.withColumn("hit", cuckoo_probe_column(spark, sh, "id"))
    assert hits.filter(F.col("id").isNull() & F.col("hit")).count() == 0
    assert hits.filter(F.col("id").isNotNull() & ~F.col("hit")).count() == 0
