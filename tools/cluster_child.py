"""spark-submit application for the multi-executor scaling evidence.

Submitted by tools/bench_cluster.py as

    spark-submit --master local-cluster[W,1,4096] \
        --py-files /tmp/sketchlib_bench/sketchlib.zip \
        tools/cluster_child.py <transcripts_parquet> <reps> <total_cores>

and runs the north-star 5-sketch suite as pure Catalyst
(sketchlib/spark/suite_sql.py — zero Python in the dataflow, kernels
byte-identical to ``build_many(prehash=True)``) on a REAL multi-executor
cluster: ``local-cluster`` launches W separate worker JVMs with their own
heaps, task threads and shuffle clients, talking to the driver over RPC —
the same executor topology as a standalone cluster, minus only the
network between hosts.  The parent varies W (1 vs 4 executors) to
evidence the north rule's two-cluster-size criterion literally: N vs 4N
executors, same input, throughput ratio / 4 = strong scaling efficiency.

Prints one ``RESULT {...}`` JSON line consumed by the parent.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    path, reps, cores = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # optional argv[4]: bloom sized for THAT many rows (constant-work
    # weak-scaling variant); defaults to the input's own count
    spec_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # master/executor topology come from spark-submit; only SQL confs here
    spark = (
        SparkSession.builder.appName(f"sketchlib-cluster-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from sketchlib.spark.agg import SketchJob
    from sketchlib.spark.suite_sql import run_suite_sql
    from sketchlib.specs import BloomSpec, CmsSpec, HllSpec, TdBloomSpec

    tr = spark.read.parquet(path)
    n = tr.count()  # warm page cache + parquet footers
    T0 = 1767225600
    # identical suite geometry to tools/bench_scaling.py::CHILD_SQL so the
    # local[k] and local-cluster[k] numbers describe the same workload
    jobs = [
        SketchJob("hll_conv", HllSpec(p=14), key="conv_id", prehash=True),
        SketchJob(
            "hll_conv_tool",
            HllSpec(p=14),
            key=F.concat_ws("\x00", F.col("conv_id"), F.col("tool")),
            prehash=True,
        ),
        SketchJob(
            "bloom_text",
            BloomSpec(max(spec_rows or n, 1000), 0.01),
            key="text",
            prehash=True,
        ),
        SketchJob(
            "cms_tool",
            CmsSpec(epsilon=0.0005, delta=0.01),
            key="tool",
            prehash=True,
            low_cardinality=True,
        ),
        SketchJob(
            "td_conv",
            TdBloomSpec(100_000, 0.001, timeout=7 * 86400, start_time=T0),
            key="conv_id",
            ts="ts",
            prehash=True,
            low_cardinality=True,
        ),
    ]
    run_suite_sql(tr, jobs)  # warm: executor launch, codegen, footers
    # count the worker JVMs actually registered (driver excluded)
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    n_exec = max(status.size() - 1, 1)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_suite_sql(tr, jobs)
        times.append(round(time.perf_counter() - t0, 3))
    best = min(times)
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cores,
                "executors": n_exec,
                "rows": n,
                "suite_sec": best,
                "turns_per_sec": round(n / best),
                "samples": times,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
