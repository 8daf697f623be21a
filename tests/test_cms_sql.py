"""Pure-Catalyst CMS (spark/cms_sql.py): never-undercount, εN bound,
declarative merge == one build, bounded state size, JVM-only probe plan."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.cms_sql import (
    build_cms_table,
    cms_cell_rows,
    cms_sql_estimates,
    merge_cell_rows,
)
from sketchlib.specs import CmsSpec


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-cms-sql-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def df(spark):
    """Zipfy keys: key_j appears ~60000/(j+1) times."""
    return spark.range(120_000).select(
        F.concat(
            F.lit("key_"),
            F.floor(F.sqrt(F.col("id") % 60_000)).cast("string"),
        ).alias("k"),
        (F.col("id") % 7).alias("g"),
    ).cache()


def test_cms_sql_one_sided_bounds(spark, df):
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    cells = cms_cell_rows(df, spec, "k")
    exact = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    n = df.count()
    est = {
        r["k"]: r["est"]
        for r in cms_sql_estimates(cells, df, spec, "k").collect()
    }
    eps_n = np.e / spec.width * n
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k], f"undercount on {k}"
        assert e - exact[k] <= eps_n


def test_cms_sql_state_bounded_and_total(spark, df):
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    assert cms_cell_rows(df, spec, "k").count() <= spec.depth * spec.width
    table, total = build_cms_table(df, spec, "k")
    assert total == df.count()
    assert table.shape == (spec.depth, spec.width)


def test_cms_sql_merge_equals_single_build(spark, df):
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    a = cms_cell_rows(df.filter(F.col("g") < 3), spec, "k")
    b = cms_cell_rows(df.filter(F.col("g") >= 3), spec, "k")
    merged = {
        (r["i"], r["pos"]): r["cnt"] for r in merge_cell_rows(a, b).collect()
    }
    single = {
        (r["i"], r["pos"]): r["cnt"] for r in cms_cell_rows(df, spec, "k").collect()
    }
    assert merged == single


def test_cms_sql_probe_unknown_key_is_bounded(spark, df):
    """A key never added estimates ≥ 0 and ≤ εN (collisions only)."""
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    cells = cms_cell_rows(df, spec, "k")
    ghosts = spark.range(50).select(
        F.concat(F.lit("ghost_"), F.col("id").cast("string")).alias("k")
    )
    n = df.count()
    eps_n = np.e / spec.width * n
    for r in cms_sql_estimates(cells, ghosts, spec, "k").collect():
        assert 0 <= r["est"] <= eps_n


def test_cms_sql_probe_plan_is_jvm_only(spark, df):
    """Neither build nor probe may contain a Python evaluation node."""
    spec = CmsSpec(epsilon=0.001, delta=0.01)
    cells = cms_cell_rows(df, spec, "k")
    probe = cms_sql_estimates(cells, df, spec, "k")
    for frame in (cells, probe):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow", "FlatMapGroupsInPandas"):
            assert marker not in plan
    probe_plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in probe_plan or "BroadcastNestedLoopJoin" in probe_plan
