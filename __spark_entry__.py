"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sketchlib`` (see SURVEY.md §2 for the operator
inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the sketch suite of the
    north star — approximate distinct users (HLL), heavy-hitter event types
    (CMS), membership of purchase users (Bloom), recency membership
    (TdBloom) — as one summary DataFrame."""
    import numpy as np
    from pyspark.sql import Row, functions as F

    from sketchlib.spark.agg import build_sketch
    from sketchlib.spark.queries import _ts_bounds
    from sketchlib.specs import BloomSpec, CmsSpec, HllSpec, TdBloomSpec

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    hll, n_rows = build_sketch(events, HllSpec(p=14), key="user_id")
    true_users = events.select(F.countDistinct("user_id")).first()[0]

    cms, _ = build_sketch(events, CmsSpec(epsilon=0.001, delta=0.01), key="event_type")
    top = events.groupBy("event_type").count().orderBy(F.desc("count")).first()
    top_est = int(cms.estimate_strings([str(top["event_type"])])[0])

    members = events.filter(F.col("event_type") == "purchase")
    bloom, _ = build_sketch(members, BloomSpec(100_000, 1e-6), key="user_id")

    t0, t1 = _ts_bounds(events)
    td, _ = build_sketch(
        events,
        TdBloomSpec(100_000, 0.001, timeout=max((t1 - t0) // 3, 1), start_time=t0),
        key="user_id",
        ts="ts",
    )

    rows = [
        Row(metric="rows_ingested", value=float(n_rows)),
        Row(metric="hll_distinct_users_est", value=float(hll.estimate())),
        Row(metric="hll_distinct_users_true", value=float(true_users)),
        Row(metric="cms_top_event_type_est", value=float(top_est)),
        Row(metric="cms_top_event_type_true", value=float(top["count"])),
        Row(metric="bloom_saturation_pct", value=float(bloom.saturation())),
        Row(metric="tdbloom_live_pct", value=float(td.saturation(t1))),
    ]
    return spark.createDataFrame(rows)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sketchlib.spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query."""
    from sketchlib.spark.queries import ORACLES

    return dict(ORACLES)
