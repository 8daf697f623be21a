"""Declarative cell-store build job — the pure-Catalyst counterpart of
``build_sketches`` as a spark-submit entry point (zero Python in the
dataflow; spark/suite_sql.py).

    spark-submit --py-files sketchlib.zip -m sketchlib.jobs.build_cells \
        --input /data/transcripts --root /data/cell_store --name nightly \
        --job hll:hll_conv:conv_id --job bloom:bloom_text:text:expected=1000000,accuracy=0.01 \
        [--job cms:cms_tool:tool:epsilon=0.0005,delta=0.01,low_cardinality=1] \
        [--job tdbloom:td_conv:conv_id:expected=100000,accuracy=0.001,timeout=604800,start_time=0,ts=ts]

Each run computes the input's suite cell frame and MERGES it into the
store snapshot (suite_sql.merge_suite_cells — associative, so nightly
increments materialize byte-identically to one build over the union),
then swings the pointer atomically: crash-safe, re-runnable, and the
state never touches the driver.  Same snapshot/pointer layout as the
streaming ``cells_sink``, so batch and streaming maintenance can hand a
store to each other.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_job(text: str):
    """``kind:name:key[:k=v,k=v...]`` → SketchJob (prehash, declarative)."""
    from sketchlib import specs as S
    from sketchlib.spark.agg import SketchJob

    parts = text.split(":")
    if len(parts) < 3:
        raise SystemExit(f"--job needs kind:name:key[:params] (got {text!r})")
    kind, name, key = parts[0], parts[1], parts[2]
    params: dict[str, str] = {}
    if len(parts) > 3 and parts[3]:
        for kv in parts[3].split(","):
            k, _, v = kv.partition("=")
            params[k] = v
    ts = params.pop("ts", "ts")
    lowcard = params.pop("low_cardinality", "0") not in ("0", "", "false")
    spec_cls = {
        "hll": S.HllSpec,
        "bloom": S.BloomSpec,
        "cbloom": S.CBloomSpec,
        "cms": S.CmsSpec,
        "tdbloom": S.TdBloomSpec,
        "tdcbloom": S.TdCBloomSpec,
    }.get(kind)
    if spec_cls is None:
        raise SystemExit(f"unsupported declarative kind {kind!r}")
    typed = {}
    for k, v in params.items():
        typed[k] = float(v) if "." in v or "e" in v.lower() else int(v)
    spec = spec_cls(**typed)
    return SketchJob(
        name, spec, key=key,
        ts=ts if kind in ("tdbloom", "tdcbloom") else None,
        prehash=True, low_cardinality=lowcard,
    )


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet file/dir")
    ap.add_argument("--root", required=True, help="cell-store root dir")
    ap.add_argument("--name", default="cells", help="store entry name")
    ap.add_argument("--job", action="append", required=True,
                    help="kind:name:key[:k=v,...] (repeatable)")
    ap.add_argument("--cpus", type=int, default=None)
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from sketchlib.spark import get_spark
    from sketchlib.spark.suite_sql import (
        merge_suite_cells,
        read_suite_cells,
        suite_cell_rows,
        write_suite_cells,
    )

    jobs = [_parse_job(j) for j in args.job]
    spark = get_spark("sketchlib-build-cells", cpus=args.cpus)
    os.makedirs(args.root, exist_ok=True)
    pointer = os.path.join(args.root, f"{args.name}.cells.json")
    t0 = time.time()
    df = spark.read.parquet(args.input)
    cells = suite_cell_rows(df, jobs)
    prev = None
    if os.path.exists(pointer):
        with open(pointer) as f:
            prev = json.load(f)
        cells = merge_suite_cells(read_suite_cells(spark, prev["path"]), cells)
    gen = (prev["gen"] + 1) if prev else 0
    out = os.path.join(args.root, f"{args.name}.cells.gen={gen}")
    write_suite_cells(cells, out)
    n_cells = spark.read.parquet(out).count()
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"gen": gen, "path": out, "epoch": gen}, f)
    os.replace(tmp, pointer)
    print(json.dumps({
        "store": out, "generation": gen, "cells": n_cells,
        "jobs": [j.name for j in jobs], "sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
