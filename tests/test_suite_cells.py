"""Cell-frame state algebra (spark/suite_sql.py): merge of incremental
cell frames == one build over the union (byte-identical kernels after
materialization), store round-trip, and the declarative tdbloom as-of
probe vs the kernel probe."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sketchlib.spark import build_sketch, get_spark
from sketchlib.spark.agg import SketchJob
from sketchlib.spark.bloom_sql import tdbloom_cell_rows, tdbloom_sql_members
from sketchlib.spark.suite_sql import (
    build_suite_sql,
    materialize_suite_cells,
    merge_suite_cells,
    read_suite_cells,
    suite_cell_rows,
    write_suite_cells,
)
from sketchlib.specs import BloomSpec, CmsSpec, HllSpec, TdBloomSpec

T0 = 1767225600


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-suite-cells-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def tdf(spark):
    rng = np.random.default_rng(21)
    n = 6000
    pdf = pd.DataFrame(
        {
            "conv_id": [f"conv-{i}" for i in rng.integers(0, 900, n)],
            "tool": rng.choice(["bash", "edit", "read"], n),
            "text": [f"some turn text {i}" for i in rng.integers(0, 4000, n)],
            "ts": pd.to_datetime(T0 + rng.integers(0, 6 * 86400, n), unit="s"),
            "half": rng.integers(0, 2, n),
        }
    )
    return spark.createDataFrame(pdf).cache()


def _jobs(n: int) -> list[SketchJob]:
    return [
        SketchJob("hll_conv", HllSpec(p=12), key="conv_id", prehash=True),
        SketchJob("bloom_text", BloomSpec(max(n, 1000), 0.01), key="text", prehash=True),
        SketchJob("cms_tool", CmsSpec(epsilon=0.005, delta=0.01), key="tool",
                  prehash=True, low_cardinality=True),
        SketchJob("td_conv", TdBloomSpec(2000, 0.01, timeout=7 * 86400, start_time=T0),
                  key="conv_id", ts="ts", prehash=True, low_cardinality=True),
    ]


def test_merge_of_incremental_cell_frames_equals_one_build(spark, tdf):
    n = tdf.count()
    jobs = _jobs(n)
    a = suite_cell_rows(tdf.filter("half = 0"), jobs)
    b = suite_cell_rows(tdf.filter("half = 1"), jobs)
    merged = materialize_suite_cells(merge_suite_cells(a, b), jobs)
    whole = build_suite_sql(tdf, jobs)
    for job in jobs:
        assert merged[job.name][0].serialize() == whole[job.name][0].serialize(), job.name
        assert merged[job.name][1] == whole[job.name][1], job.name


def test_cell_store_roundtrip(spark, tdf, tmp_path):
    jobs = _jobs(tdf.count())
    cells = suite_cell_rows(tdf, jobs)
    path = str(tmp_path / "cellstore")
    write_suite_cells(cells, path)
    back = materialize_suite_cells(read_suite_cells(spark, path), jobs)
    direct = build_suite_sql(tdf, jobs)
    for job in jobs:
        assert back[job.name][0].serialize() == direct[job.name][0].serialize(), job.name


def test_tdbloom_sql_members_matches_kernel_probe(spark, tdf):
    spec = TdBloomSpec(2000, 0.001, timeout=2 * 86400, start_time=T0)
    cells = tdbloom_cell_rows(tdf, spec, "conv_id", ts="ts")
    kern, _ = build_sketch(tdf, spec, key="conv_id", ts="ts", prehash=True)
    as_of = T0 + 6 * 86400  # only the last 2 days are fresh
    probes = spark.createDataFrame(
        pd.DataFrame({"conv_id": [f"conv-{i}" for i in range(0, 1200, 7)]})
    )
    got = {
        r["conv_id"]: r["member"]
        for r in tdbloom_sql_members(cells, spec, probes, "conv_id", as_of).collect()
    }
    keys = sorted(got)
    exp = kern.contains_hashes(
        *_pair(spark, keys), as_of=as_of
    )
    assert [got[k] for k in keys] == [bool(e) for e in exp]
    assert any(got.values()) and not all(got.values())


def test_tdbloom_sql_members_age_guard(spark, tdf):
    """Past the whole-filter max_time everything reads absent
    (src/tdbloom.c:342)."""
    spec = TdBloomSpec(500, 0.01, timeout=3600, start_time=T0)
    cells = tdbloom_cell_rows(tdf, spec, "conv_id", ts="ts")
    far = T0 + spec.max_time + 10_000
    probes = spark.createDataFrame(pd.DataFrame({"conv_id": ["conv-1", "conv-2"]}))
    got = tdbloom_sql_members(cells, spec, probes, "conv_id", far).collect()
    assert got and all(not r["member"] for r in got)


def _pair(spark, keys):
    pdf = spark.createDataFrame(pd.DataFrame({"k": keys})).select(
        F.xxhash64(F.col("k").cast("string")).alias("h1"),
        F.xxhash64(F.col("k").cast("string"), F.lit(-7046029254386353131)).alias("h2"),
        F.col("k"),
    ).toPandas().set_index("k").loc[keys]
    return pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64)
