"""Time-bucketed sketch rollups: one merged sketch state per calendar
bucket (day by default), stored as a partitioned table; a time-range query
then merges only the selected buckets' states — O(buckets), never a rescan
of the raw rows.

This is the hypertable-rollup pattern every sketch deployment at 10^12 turns
needs: the raw table is written once, per-day sketch states (KBs each) are
maintained incrementally, and "distinct conv_id in [d1, d2]" is a merge of
|d2-d1| tiny states.  Works for ANY kernel whose merge is associative —
bloom (OR), HLL (max), CMS/cbloom (sat-add), tdbloom (freshest-tick), KLL /
t-digest (fold) — i.e. everything in this library except cuckoo (which
shards instead of merging, see cuckoo_dist.py).

Layout: parquet partitioned by the bucket column, so a range read prunes to
the requested buckets (PartitionFilters, plan-asserted in tests).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.spark.agg import _merge_blobs, _new_kernel, _pack_state, _ts_seconds
from sketchlib.specs import BaseSpec

_ROLLUP_SCHEMA = "bucket date, state binary, rows bigint"


def sketch_rollup(
    df: DataFrame,
    spec: BaseSpec,
    key,
    bucket: Column | str = None,
    ts: str = "ts",
) -> DataFrame:
    """(bucket, state, rows): one merged kernel per time bucket.

    ``bucket`` defaults to ``to_date(ts)`` (daily rollup).  Two-level build:
    partial kernels map-side per (task, bucket), then one shuffle of the tiny
    states groups each bucket's partials for the final per-bucket fold —
    raw rows shuffle nowhere."""
    bcol = F.to_date(ts) if bucket is None else (
        F.col(bucket) if isinstance(bucket, str) else bucket
    )
    kcol = (F.col(key) if isinstance(key, str) else key).cast("string")
    needs_ts = spec.kind in ("tdbloom", "tdcbloom")
    cols = [bcol.alias("__b"), kcol.alias("__key")]
    if needs_ts:
        cols.append(F.col(ts).alias("__ts"))
    # null bucket (null ts) rows have no home and would crash the
    # per-bucket grouping below — drop them like null keys
    proj = df.select(*cols).filter(
        F.col("__key").isNotNull() & F.col("__b").isNotNull()
    )

    spec_json = spec.to_json()

    def partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kernels: dict = {}
        counts: dict = {}
        for batch in batches:
            if not batch.num_rows:
                continue
            buckets = batch.column("__b")
            # group rows of this Arrow batch by bucket value
            tbl = pa.table(
                {n: batch.column(n) for n in batch.schema.names}
            )
            for b in buckets.unique().to_pylist():
                sub = tbl.filter(pc.equal(tbl.column("__b"), b))
                k = kernels.get(b)
                if k is None:
                    k = kernels[b] = _new_kernel(spec_json)
                    counts[b] = 0
                counts[b] += sub.num_rows
                karr = sub.column("__key")
                if isinstance(karr, pa.ChunkedArray):
                    karr = karr.combine_chunks()
                data, off = mmh3.arrow_string_buffers(karr)
                if needs_ts:
                    tarr = sub.column("__ts")
                    if isinstance(tarr, pa.ChunkedArray):
                        tarr = tarr.combine_chunks()
                    k.update(data, off, _ts_seconds(tarr))
                else:
                    k.update(data, off)
        if kernels:
            bs = sorted(kernels)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(bs, type=pa.date32()),
                    pa.array([_pack_state(kernels[b].serialize()) for b in bs], type=pa.binary()),
                    pa.array([counts[b] for b in bs], type=pa.int64()),
                ],
                names=["bucket", "state", "rows"],
            )

    part = proj.mapInArrow(partials, _ROLLUP_SCHEMA)

    def combine(tbl: pa.Table) -> pa.Table:
        blobs = tbl.column("state").to_pylist()
        merged = _merge_blobs(spec_json, blobs)
        return pa.table(
            {
                "bucket": pa.array([tbl.column("bucket")[0].as_py()], type=pa.date32()),
                "state": pa.array([_pack_state(merged.serialize())], type=pa.binary()),
                "rows": pa.array([sum(tbl.column("rows").to_pylist())], type=pa.int64()),
            }
        )

    return part.groupBy("bucket").applyInArrow(combine, _ROLLUP_SCHEMA)


def write_rollup(rollup: DataFrame, path: str) -> None:
    """Persist partitioned by bucket: range reads prune to the buckets."""
    rollup.write.mode("overwrite").partitionBy("bucket").parquet(path)


def read_rollup(spark, path: str, start=None, end=None) -> DataFrame:
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("bucket") >= F.lit(start).cast("date"))
    if end is not None:
        df = df.filter(F.col("bucket") <= F.lit(end).cast("date"))
    return df


def merge_range(rollup: DataFrame, spec: BaseSpec, start=None, end=None):
    """Merge the selected buckets' states into one kernel + total rows.
    O(selected buckets) driver work on KB-sized states — the raw table is
    never touched."""
    df = rollup
    if start is not None:
        df = df.filter(F.col("bucket") >= F.lit(start).cast("date"))
    if end is not None:
        df = df.filter(F.col("bucket") <= F.lit(end).cast("date"))
    tbl = df.select("state", "rows").toArrow()
    kernel = _merge_blobs(spec.to_json(), tbl.column("state").to_pylist())
    return kernel, sum(tbl.column("rows").to_pylist())
