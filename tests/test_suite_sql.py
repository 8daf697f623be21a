"""Single-pass pure-Catalyst suite build (spark/suite_sql.py): every
kernel byte-identical to build_many(..., prehash=True) over the same rows;
the prehash-family CMS (KM ladder) byte-identical to the kernel build; the
dispatcher and the aggregate-only endpoint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sketchlib.spark import build_sketch, get_spark
from sketchlib.spark.agg import SketchJob, build_many
from sketchlib.spark.suite_sql import (
    build_cms_sql_km,
    build_sketch_sql,
    build_suite_sql,
    run_suite_sql,
    suite_cell_rows,
)
from sketchlib.specs import (
    BloomSpec,
    CBloomSpec,
    CmsSpec,
    HllSpec,
    TdBloomSpec,
    TdCBloomSpec,
)

T0 = 1767225600


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-suite-sql-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def tdf(spark):
    rng = np.random.default_rng(5)
    n = 8000
    pdf = pd.DataFrame(
        {
            "conv_id": [f"conv-{i}" for i in rng.integers(0, 1500, n)],
            "tool": rng.choice(["bash", "edit", "read", None], n, p=[0.5, 0.3, 0.15, 0.05]),
            "text": [f"turn text {i}" for i in rng.integers(0, 5000, n)],
            "ts": pd.to_datetime(T0 + rng.integers(0, 6 * 86400, n), unit="s"),
        }
    )
    return spark.createDataFrame(pdf).cache()


def _jobs(n: int) -> list[SketchJob]:
    return [
        SketchJob("hll_conv", HllSpec(p=12), key="conv_id", prehash=True),
        SketchJob(
            "hll_conv_tool",
            HllSpec(p=12),
            key=F.concat_ws("\x00", F.col("conv_id"), F.col("tool")),
            prehash=True,
        ),
        SketchJob("bloom_text", BloomSpec(max(n, 1000), 0.01), key="text", prehash=True),
        SketchJob("cms_tool", CmsSpec(epsilon=0.005, delta=0.01), key="tool", prehash=True),
        SketchJob(
            "cb_conv", CBloomSpec(2000, 0.01, counter_bits=16), key="conv_id", prehash=True
        ),
        SketchJob(
            "td_conv",
            TdBloomSpec(2000, 0.01, timeout=7 * 86400, start_time=T0),
            key="conv_id",
            ts="ts",
            prehash=True,
        ),
        SketchJob(
            "tdc_conv",
            TdCBloomSpec(2000, 0.01, timeout=7 * 86400, start_time=T0),
            key="conv_id",
            ts="ts",
            prehash=True,
        ),
    ]


def test_suite_byte_identity_vs_build_many(spark, tdf):
    n = tdf.count()
    jobs = _jobs(n)
    sql_out = build_suite_sql(tdf, jobs)
    ker_out = build_many(tdf, jobs)
    for job in jobs:
        ks, rs = sql_out[job.name]
        kk, _ = ker_out[job.name]
        assert ks.serialize() == kk.serialize(), job.name
    # per-sketch ingested-row counts: non-null keys (ts nulls drop td rows)
    assert sql_out["hll_conv"][1] == n
    assert sql_out["cms_tool"][1] == tdf.filter("tool is not null").count()


def test_suite_low_cardinality_prereduce_byte_identity(spark, tdf):
    """low_cardinality=True (key-level pre-reduction before the explode)
    must change ONLY the plan, never the state: byte-identical kernels and
    identical ingested-row counts vs the direct branches."""
    n = tdf.count()
    jobs_lc = [
        SketchJob("cms_tool", CmsSpec(epsilon=0.005, delta=0.01), key="tool",
                  prehash=True, low_cardinality=True),
        SketchJob("cb_conv", CBloomSpec(2000, 0.01), key="conv_id",
                  prehash=True, low_cardinality=True),
        SketchJob("bloom_conv", BloomSpec(max(n, 1000), 0.01), key="conv_id",
                  prehash=True, low_cardinality=True),
        SketchJob("td_conv",
                  TdBloomSpec(2000, 0.01, timeout=7 * 86400, start_time=T0),
                  key="conv_id", ts="ts", prehash=True, low_cardinality=True),
    ]
    sql_out = build_suite_sql(tdf, jobs_lc)
    ker_out = build_many(tdf, jobs_lc)
    for job in jobs_lc:
        assert sql_out[job.name][0].serialize() == ker_out[job.name][0].serialize(), job.name
        if job.key == "conv_id":  # null-free key: row accounting must agree
            assert sql_out[job.name][1] == ker_out[job.name][1], job.name


def test_cms_km_byte_identity(spark, tdf):
    spec = CmsSpec(epsilon=0.002, delta=0.01)
    k_sql = build_cms_sql_km(tdf, spec, "tool")
    k_ker, _ = build_sketch(tdf, spec, key="tool", prehash=True)
    assert k_sql.table.tobytes() == k_ker.table.tobytes()
    assert k_sql.total == k_ker.total


def test_dispatcher_routes_all_kinds(spark, tdf):
    for spec, kw in [
        (HllSpec(p=10), {}),
        (BloomSpec(1000, 0.01), {}),
        (CBloomSpec(1000, 0.01), {}),
        (CmsSpec(epsilon=0.01, delta=0.1), {}),
        (TdBloomSpec(1000, 0.01, timeout=86400 * 7, start_time=T0), {"ts": "ts"}),
        (TdCBloomSpec(1000, 0.01, timeout=86400 * 7, start_time=T0), {"ts": "ts"}),
    ]:
        k_sql = build_sketch_sql(tdf, spec, "conv_id", **kw)
        k_ker, _ = build_sketch(tdf, spec, key="conv_id", prehash=True, **({"ts": "ts"} if kw else {}))
        assert k_sql.serialize() == k_ker.serialize(), spec.kind
    with pytest.raises(ValueError, match="no declarative build"):
        from sketchlib.specs import KllSpec

        build_sketch_sql(tdf, KllSpec(), "conv_id")


def test_run_suite_sql_counts_cells(spark, tdf):
    jobs = _jobs(tdf.count())
    ncells = run_suite_sql(tdf, jobs)
    assert ncells == suite_cell_rows(tdf, jobs).count() > 0


def test_suite_plan_is_python_free(spark, tdf):
    """The whole suite plan must contain no Python evaluation operators —
    the scaling-gate property — in both the direct and the
    low-cardinality pre-reduced shapes."""
    lc_jobs = [
        SketchJob("cms_tool", CmsSpec(epsilon=0.005, delta=0.01), key="tool",
                  prehash=True, low_cardinality=True),
        SketchJob("td_conv",
                  TdBloomSpec(2000, 0.01, timeout=7 * 86400, start_time=T0),
                  key="conv_id", ts="ts", prehash=True, low_cardinality=True),
    ]
    for jobs in (_jobs(1000), lc_jobs):
        plan = (
            suite_cell_rows(tdf, jobs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for op in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInArrow", "MapInArrow"):
            assert op not in plan, op
        assert "HashAggregate" in plan
