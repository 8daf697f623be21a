"""Phase-isolation benchmarks for the optimization round (guide §1.4).

NOT part of the driver contract — ``bench.py`` is the frozen measurement
harness.  This file reproduces the per-phase numbers cited in
OPTIMIZATION_r06.md: per-query wall (min-of-N with the same warmups bench.py
uses), phase breakdowns for the queries the round touched, and noop-sink
timings for the library build paths so the computation is timed without the
sink.

Usage:
    python bench_extra.py queries [name ...]   # per-query min-of-2
    python bench_extra.py phases               # phase breakdowns
    python bench_extra.py builds               # build/suite/probe legs (noop-style)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from sketchlib.kernels.bloom import BloomFilter
    from sketchlib.spark import get_spark, probe
    from sketchlib.specs import BloomSpec

    spark = get_spark(
        "sketchlib-bench-extra", cpus=CPUS,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    # same untimed probe-machinery warmup bench.py applies
    k = BloomFilter(BloomSpec(100, 0.01))
    k.update_strings([b"w"])
    spark.range(32).select(
        probe.probe_column(spark, k, F.col("id").cast("string"))
    ).collect()
    return spark


def _timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"  {dt:7.3f}s  {label}", flush=True)
    return r


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    names = names or list(qs)
    res: dict[str, list[float]] = {}
    for _rep in range(2):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).collect()
            res.setdefault(n, []).append(time.perf_counter() - t0)
    for n in names:
        runs = ", ".join(f"{x:.2f}" for x in res[n])
        print(f"{min(res[n]):6.2f}  (runs: {runs})  {n}")


def cmd_phases() -> None:
    from sketchlib.spark.agg import build_sketch
    from sketchlib.spark.bloom_sql import bloom_sql_members, bloom_word_rows
    from sketchlib.specs import BloomSpec, KllSpec

    spark = _spark()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.count()

    print("== bloom_sql_membership phases ==")
    for rep in range(2):
        members = events.filter(F.col("event_type") == "purchase")
        spec = BloomSpec(200_000, 1e-6)
        words = _timed(
            spark, f"rep{rep} word-frame construction (driver-side, lazy)",
            lambda: bloom_word_rows(members, spec, "user_id", prereduce=True),
        )
        out = _timed(
            spark, f"rep{rep} probe construction (driver-side, lazy)",
            lambda: bloom_sql_members(words, events, spec, "user_id")
            .filter("member").select("user_id"),
        )
        _timed(spark, f"rep{rep} execution (collect)", lambda: out.collect())

    print("== kll_sql_quantiles UDAF pass ==")
    from sketchlib.spark.sql_udaf import register_sql_udafs

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    register_sql_udafs(spark, KllSpec(k=200), "sk_kll", quantiles=(0.5, 0.95))
    li.select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        F.col("l_extendedprice").cast("double").alias("price"),
    ).createOrReplaceTempView("kll_lineitem")
    for rep in range(2):
        _timed(
            spark, f"rep{rep} GROUPED_AGG state build",
            lambda: spark.sql(
                "SELECT month, sk_kll_p50(state) AS p50 FROM (SELECT month,"
                " sk_kll_state(price) AS state FROM kll_lineitem GROUP BY"
                " month)"
            ).collect(),
        )

    print("== tdigest kernel (no Spark) ==")
    import numpy as np

    from sketchlib.kernels.tdigest import TDigest
    from sketchlib.specs import TDigestSpec

    vals = np.random.default_rng(1).lognormal(3, 1, 600_000)
    for rep in range(2):
        td = TDigest(TDigestSpec(compression=200))
        t0 = time.perf_counter()
        for i in range(0, vals.size, 131072):
            td.update(vals[i : i + 131072])
        td.quantile(0.5)
        print(f"  {time.perf_counter() - t0:7.3f}s  rep{rep} ingest 600k values")


def cmd_builds() -> None:
    from sketchlib.spark.agg import SketchJob, build_many
    from sketchlib.spark.probe_join import build_sharded_states, probe_sharded
    from sketchlib.spark.suite_sql import build_suite_sql, run_suite_sql
    from sketchlib.specs import BloomSpec, CmsSpec, HllSpec, TdBloomSpec

    spark = _spark()
    path = os.environ.get(
        "SKETCHLIB_BENCH_CACHE", "/tmp/sketchlib_bench"
    ) + "/transcripts_100000.parquet"
    tr = spark.read.parquet(path)
    n = tr.count()
    t0e = int(tr.select(F.min(F.unix_timestamp("ts"))).first()[0])
    jobs = [
        SketchJob("hll_conv", HllSpec(p=14), key="conv_id", prehash=True),
        SketchJob(
            "hll_conv_tool", HllSpec(p=14),
            key=F.concat_ws("\x00", F.col("conv_id"), F.col("tool")),
            prehash=True,
        ),
        SketchJob("bloom_text", BloomSpec(max(n, 1000), 0.01), key="text", prehash=True),
        SketchJob(
            "cms_tool", CmsSpec(epsilon=0.0005, delta=0.01), key="tool",
            prehash=True, low_cardinality=True,
        ),
        SketchJob(
            "td_conv",
            TdBloomSpec(100_000, 0.001, timeout=7 * 86400, start_time=t0e),
            key="conv_id", ts="ts", prehash=True, low_cardinality=True,
        ),
    ]
    _timed(spark, "build_many warm", lambda: build_many(tr, jobs))
    _timed(spark, "build_many", lambda: build_many(tr, jobs))
    _timed(spark, "run_suite_sql warm", lambda: run_suite_sql(tr, jobs))
    _timed(spark, "run_suite_sql", lambda: run_suite_sql(tr, jobs))
    _timed(spark, "build_suite_sql (materialize)", lambda: build_suite_sql(tr, jobs))

    spec = BloomSpec(50_000, 1e-6)
    probes = tr.select("conv_id").distinct()

    def leg():
        states = build_sharded_states(tr, "conv_id", spec, n_shards=128)
        return probe_sharded(
            states, probes, "conv_id", spec=spec, n_shards=128
        ).filter("hit").count()

    _timed(spark, "probe_join leg warm", leg)
    _timed(spark, "probe_join leg", leg)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "phases":
        cmd_phases()
    elif cmd == "builds":
        cmd_builds()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
