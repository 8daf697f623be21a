"""Resumable sketch-build job — the ``bloomtool create``/``add`` analog
(SURVEY.md §2.8) as a spark-submit entry point.

    spark-submit --py-files sketchlib.zip -m sketchlib.jobs.build_sketches \
        --input /data/transcripts --store /data/sketch_store \
        --name hll_conv --kind hll --key conv_id --run-id nightly-01 \
        [--p 14 | --expected N --accuracy P | --epsilon E --delta D]
        [--ts ts --timeout SEC] [--values col]

Builds with file-level lineage (skip-completed on resume), folds, and writes
the merged state + metrics into the store.  Deterministic: same inputs +
spec ⇒ byte-identical state regardless of partitioning or restarts.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet file/dir/glob")
    ap.add_argument("--store", required=True, help="sketch_store root dir")
    ap.add_argument("--name", required=True)
    ap.add_argument(
        "--kind",
        required=True,
        choices=["bloom", "cbloom", "tdbloom", "tdcbloom", "cuckoo", "hll", "cms", "kll", "tdigest"],
    )
    ap.add_argument("--key", help="key column/expression")
    ap.add_argument("--ts", help="event-time column (tdbloom/tdcbloom)")
    ap.add_argument("--values", help="numeric column (kll/tdigest)")
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--batch-files", type=int, default=64)
    # spec params
    ap.add_argument("--expected", type=int, default=1_000_000)
    ap.add_argument("--accuracy", type=float, default=0.01)
    ap.add_argument("--counter-bits", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=86_400)
    ap.add_argument("--start-time", type=int, default=0)
    ap.add_argument("--p", type=int, default=14, help="HLL register bits")
    ap.add_argument("--epsilon", type=float, default=0.0001)
    ap.add_argument("--delta", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=200, help="KLL k")
    ap.add_argument("--compression", type=float, default=200.0)
    ap.add_argument("--num-buckets", type=int, default=1 << 20)
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args(argv)


def make_spec(a):
    from sketchlib import specs as S

    if a.kind == "bloom":
        return S.BloomSpec(a.expected, a.accuracy, seed=a.seed)
    if a.kind == "cbloom":
        return S.CBloomSpec(a.expected, a.accuracy, a.counter_bits, seed=a.seed)
    if a.kind == "tdbloom":
        return S.TdBloomSpec(a.expected, a.accuracy, a.timeout, a.start_time, seed=a.seed)
    if a.kind == "tdcbloom":
        return S.TdCBloomSpec(
            a.expected, a.accuracy, a.timeout, a.counter_bits, a.start_time, seed=a.seed
        )
    if a.kind == "cuckoo":
        return S.CuckooSpec(a.num_buckets, seed=a.seed)
    if a.kind == "hll":
        return S.HllSpec(a.p, seed=a.seed)
    if a.kind == "cms":
        return S.CmsSpec(a.epsilon, a.delta, seed=a.seed)
    if a.kind == "kll":
        return S.KllSpec(a.k, seed=a.seed)
    if a.kind == "tdigest":
        return S.TDigestSpec(a.compression, seed=a.seed)
    raise ValueError(a.kind)


def resolve_inputs(pattern: str) -> list[str]:
    if os.path.isdir(pattern):
        return sorted(glob.glob(os.path.join(pattern, "*.parquet")))
    return sorted(glob.glob(pattern))


def main(argv=None) -> int:
    a = parse_args(argv)
    from sketchlib.spark import get_spark
    from sketchlib.spark.agg import SketchJob
    from sketchlib.store import SketchStore

    spark = get_spark(f"build-{a.name}")
    files = resolve_inputs(a.input)
    if not files:
        print(f"no input files match {a.input}", file=sys.stderr)
        return 2
    store = SketchStore(a.store)
    job = SketchJob(a.name, make_spec(a), key=a.key, ts=a.ts, values=a.values)
    t0 = time.perf_counter()
    kernel, rows, built, skipped = store.build_resumable(
        spark, files, job, run_id=a.run_id, batch_files=a.batch_files
    )
    dt = time.perf_counter() - t0
    metrics = {
        "rows": rows,
        "files_built": built,
        "files_skipped": skipped,
        "build_sec": round(dt, 3),
        "rows_per_sec": round(rows / dt) if dt > 0 else 0,
        "state_bytes": len(kernel.serialize()),
        "run_id": a.run_id,
    }
    store.save_kernel(a.name, kernel, metrics)
    print(json.dumps({"sketch": a.name, **metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
