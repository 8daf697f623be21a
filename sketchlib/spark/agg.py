"""Distributed sketch aggregation: partial build per partition + associative
merge — the Spark mapping of the reference's build/merge dataflow
(bloomtool create → bloom_merge, SURVEY.md §3).

Key properties at scale:

- **Column pruning**: the build stage selects only the key/ts/value
  expressions, so the Parquet/Iceberg scan reads just those columns.
- **No shuffle of raw rows**: partial states are built map-side; only one
  small row per partition crosses the exchange (the map-side-combine shape of
  a hash aggregate, expressed at the sketch level).
- **Skew-immune**: sketch merges are order-invariant, so hot conversations
  scattering across input partitions is free — no salting needed for the
  build itself (associativity IS the skew remedy; SURVEY.md §4).
- **Tree merge**: with many partitions, partials are combined Spark-side in
  groups of ``fanin`` before the driver fold, bounding driver memory to
  O(fanin · state_size).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.kernels import KERNEL_BY_KIND
from sketchlib.specs import BaseSpec

_PARTIAL_SCHEMA = "state binary, rows bigint"


def _as_key_col(key) -> Column:
    col = F.col(key) if isinstance(key, str) else key
    return col.cast("string").alias("__key")


def _new_kernel(spec_json: str):
    spec = BaseSpec.from_json(spec_json)
    return KERNEL_BY_KIND[spec.kind](spec)


def _ts_seconds(arr: pa.Array) -> np.ndarray:
    """Arrow timestamp/int column → int64 epoch seconds."""
    t = arr.type
    if pa.types.is_timestamp(t):
        unit = t.unit
        div = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
        return (arr.cast(pa.int64()).to_numpy(zero_copy_only=False) // div).astype(np.int64)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)


def sketch_partials(
    df: DataFrame,
    spec: BaseSpec,
    key=None,
    ts=None,
    values=None,
) -> DataFrame:
    """Build-stage: one serialized partial sketch row per input partition.

    ``key``: column/expression to sketch (bloom family, HLL, CMS, cuckoo).
    ``ts``: event-time column (time-decaying kinds; epoch-second resolution).
    ``values``: numeric column (KLL / t-digest).
    """
    cols: list[Column] = []
    wants_key = key is not None
    wants_ts = ts is not None
    wants_vals = values is not None
    if wants_key:
        cols.append(_as_key_col(key))
    if wants_ts:
        tcol = F.col(ts) if isinstance(ts, str) else ts
        cols.append(tcol.alias("__ts"))
    if wants_vals:
        vcol = F.col(values) if isinstance(values, str) else values
        cols.append(vcol.cast("double").alias("__val"))
    proj = df.select(*cols)
    if wants_key:
        proj = proj.filter(F.col("__key").isNotNull())

    spec_json = spec.to_json()

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kernel = _new_kernel(spec_json)
        rows = 0
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            rows += n
            if wants_key:
                karr = batch.column("__key")
                if wants_ts:
                    tsec = _ts_seconds(batch.column("__ts"))
                    if karr.null_count:
                        raise AssertionError("nulls should be filtered upstream")
                    data, off = mmh3.arrow_string_buffers(karr)
                    kernel.update(data, off, tsec)
                else:
                    data, off = mmh3.arrow_string_buffers(karr)
                    kernel.update(data, off)
            elif wants_vals:
                vals = batch.column("__val").to_numpy(zero_copy_only=False)
                kernel.update(vals)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([kernel.serialize()], type=pa.binary()),
                pa.array([rows], type=pa.int64()),
            ],
            names=["state", "rows"],
        )

    return proj.mapInArrow(build, _PARTIAL_SCHEMA)


def _merge_blobs(spec_json: str, blobs: list[bytes]):
    spec = BaseSpec.from_json(spec_json)
    cls = KERNEL_BY_KIND[spec.kind]
    acc = None
    for blob in blobs:
        k = cls.deserialize(spec, blob)
        acc = k if acc is None else acc.merge(k)
    return acc if acc is not None else cls(spec)


def tree_merge(partials: DataFrame, spec: BaseSpec, n_buckets: int) -> DataFrame:
    """One Spark-side combine level: hash the partial rows into ``n_buckets``
    groups and merge each group to a single row.  Repeatable; used when the
    partial count would blow the driver fold."""
    spec_json = spec.to_json()
    bucketed = partials.withColumn(
        "__b", (F.monotonically_increasing_id() % n_buckets).cast("long")
    ).repartition(n_buckets, "__b")

    def combine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        blobs: list[bytes] = []
        rows = 0
        for batch in batches:
            st = batch.column("state")
            rs = batch.column("rows")
            for i in range(batch.num_rows):
                blobs.append(st[i].as_py())
                rows += rs[i].as_py()
        if not blobs:
            return
        merged = _merge_blobs(spec_json, blobs)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([merged.serialize()], type=pa.binary()),
                pa.array([rows], type=pa.int64()),
            ],
            names=["state", "rows"],
        )

    return bucketed.select("state", "rows").mapInArrow(combine, _PARTIAL_SCHEMA)


def build_sketch(
    df: DataFrame,
    spec: BaseSpec,
    key=None,
    ts=None,
    values=None,
    fanin: int = 64,
):
    """End-to-end: build partials, merge (tree level(s) Spark-side if needed,
    final fold on the driver), return ``(kernel, total_rows)``."""
    partials = sketch_partials(df, spec, key=key, ts=ts, values=values)
    # Spark-side combine level(s) while too many partials for the driver —
    # planned up front from the partition count so nothing recomputes.
    nparts = df.rdd.getNumPartitions()
    while nparts > fanin:
        n_buckets = -(-nparts // fanin)  # each bucket folds ≤ fanin states
        partials = tree_merge(partials, spec, n_buckets)
        nparts = n_buckets
    rows = partials.select("state", "rows").collect()
    spec_json = spec.to_json()
    kernel = _merge_blobs(spec_json, [r["state"] for r in rows])
    total = sum(r["rows"] for r in rows)
    return kernel, total
