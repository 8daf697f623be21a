"""Table layer + physical-plan assertions: partition pruning, predicate
pushdown, and column pruning must actually reach the scan (.explain is the
contract, not a vibe — SURVEY.md §4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sketchlib.io import TranscriptsTable, iceberg_available
from sketchlib.spark import get_spark
from sketchlib.spark.agg import SketchJob, build_many, build_sketch
from sketchlib.specs import HllSpec
from sketchlib.testdata import generate_transcripts


@pytest.fixture(scope="module")
def spark():
    yield get_spark("io-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("tbl") / "transcripts")
    pdf = generate_transcripts(300, seed=42)
    df = spark.createDataFrame(pdf)
    t = TranscriptsTable(spark, loc, n_buckets=4)
    t.write(df)
    return t


def test_roundtrip_per_turn_invariant(spark, table):
    """input_hint per-row invariant: text equality under stable
    (conv_id, turn_idx) ordering after the write/read pass."""
    pdf = generate_transcripts(300, seed=42)
    got = (
        table.read()
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = pdf[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert (got["text"] == want["text"]).all()
    assert len(got) == len(want)


def test_day_partition_pruning(spark, table):
    df = table.read_days("2026-01-02", "2026-01-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # day is a partition column → a NON-EMPTY PartitionFilters mentioning day
    # (the round-1 test matched "PartitionFilters: []" too — vacuous)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan[:800]
    assert "day" in m.group(1), m.group(0)
    assert m.group(1).strip(), "PartitionFilters is empty — day pruning regressed"
    assert df.count() > 0
    # the pruned read returns exactly the rows whose ts falls in the range
    full = table.read()
    want = full.filter(
        (F.to_date("ts") >= F.lit("2026-01-02")) & (F.to_date("ts") <= F.lit("2026-01-03"))
    ).count()
    assert df.count() == want


def test_bucket_routing_prunes(spark, table):
    df = table.read_bucket_of("conv-00000007")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan and "PartitionFilters" in plan
    rows = df.select("conv_id").distinct().collect()
    assert [r[0] for r in rows] == ["conv-00000007"]


def test_build_scan_prunes_columns(spark, table):
    """The sketch build must read ONLY the key column (ReadSchema check)."""
    partials = build_many(
        table.read(), [SketchJob("h", HllSpec(p=12), key="conv_id")]
    )
    # inspect the plan of an equivalent projected build input
    proj = table.read().select(F.col("conv_id").cast("string"))
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<conv_id:string>" in plan, plan[:500]


def test_filter_pushdown_reaches_scan(spark, table):
    df = table.read().filter(F.col("role") == "assistant").select("conv_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,assistant)]" in plan, plan[:800]


def test_iceberg_detection(spark):
    # sandbox has no Iceberg jar — the abstraction must fall back to parquet
    assert iceberg_available(spark) is False


def test_skewed_write_then_sketch_identical(spark, table, tmp_path):
    """Salted repartition on write must not change any sketch result."""
    pdf = generate_transcripts(300, seed=42)
    df = spark.createDataFrame(pdf)
    k_direct, n1 = build_sketch(df, HllSpec(p=12), key="conv_id")
    k_table, n2 = build_sketch(table.read(), HllSpec(p=12), key="conv_id")
    assert n1 == n2
    assert k_direct.serialize() == k_table.serialize()


def test_recent_window_filter_is_pushed(spark):
    """The time-decay carriers' recency filter must reach the parquet scan
    as a PushedFilter (row-group skipping at scale) — not stay a post-scan
    unix_timestamp DataFilter."""
    from sketchlib.spark.queries import q_tdbloom_recent_users

    df = q_tdbloom_recent_users(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PushedFilters" in l and "GreaterThanOrEqual(ts" in l
        for l in plan.splitlines()
    ), plan[:900]


class _RecordingWriter:
    """Stand-in for DataFrameWriterV2 so the Iceberg write branch
    (io.py write()/read()/read_days 'use_iceberg' paths) executes without a
    runtime jar; records the partition transforms it was given."""

    def __init__(self, log):
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", [str(c) for c in cols]))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


def test_iceberg_write_branch_mocked(spark, monkeypatch):
    """Execute io.py's writeTo().partitionedBy(bucket, days) branch with the
    catalog sink mocked (no jar in this sandbox): the branch must request
    EXACTLY hidden partitioning bucket(n, conv_id) + days(ts) and finish
    with createOrReplace.  The real-jar path is covered by
    test_iceberg_real_roundtrip when a runtime is present."""
    import sketchlib.io as io_mod

    monkeypatch.setattr(io_mod, "iceberg_available", lambda s: True)
    log = []

    class FakeDF:
        def writeTo(self, name):
            log.append(("writeTo", name))
            return _RecordingWriter(log)

    t = TranscriptsTable(spark, "catalog:db.transcripts", n_buckets=16)
    assert t.use_iceberg
    t.write(FakeDF())
    assert log[0] == ("writeTo", "db.transcripts")
    kinds = dict(c for c in log if c[0] == "partitionedBy")
    parts = kinds["partitionedBy"]
    assert any("bucket(16, conv_id)" in p for p in parts), parts
    assert any("days(ts)" in p for p in parts), parts
    assert ("createOrReplace",) in log


def test_iceberg_read_days_branch_mocked(spark, monkeypatch, table):
    """The Iceberg read_days branch must emit a plain ts-vs-literal range
    (pushable to the source so hidden days(ts) partitioning prunes
    manifests) — never a to_date(ts) wrapper."""
    import types

    import sketchlib.io as io_mod

    monkeypatch.setattr(io_mod, "iceberg_available", lambda s: True)
    base = table.read().drop("bucket", "day")

    fake_reader = types.SimpleNamespace(table=lambda name: base)
    fake_spark = types.SimpleNamespace(read=fake_reader)
    t = TranscriptsTable(fake_spark, "catalog:db.transcripts")
    out = t.read_days("2025-06-02", "2025-06-03")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ts" in plan and "to_date" not in plan.lower().replace("todate", "to_date")
    # equivalent rows to the parquet-path day filter
    expect = table.read_days("2025-06-02", "2025-06-03").count()
    assert out.count() == expect


def test_iceberg_real_roundtrip(spark, table):
    """Executed only with a real Iceberg runtime on the classpath.  Recipe:

        pyspark --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
          --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
          --conf spark.sql.catalog.local.type=hadoop \
          --conf spark.sql.catalog.local.warehouse=/tmp/iceberg-wh

    then TranscriptsTable(spark, "catalog:local.db.transcripts").write(df)
    round-trips through hidden bucket/days partitioning."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    df = table.read().drop("bucket", "day")
    t = TranscriptsTable(spark, "catalog:local.db.transcripts_test")
    t.write(df)
    back = t.read()
    assert back.count() == df.count()
