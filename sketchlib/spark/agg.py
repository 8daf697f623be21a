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

import zlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.kernels import KERNEL_BY_KIND
from sketchlib.specs import BaseSpec

_PARTIAL_SCHEMA = "state binary, rows bigint"


def _pack_state(blob: bytes) -> bytes:
    """Partial states cross the Python↔JVM boundary twice; Spark moves huge
    binary cells at ~10-35 MB/s, and sketch arrays are mostly zeros — zlib-1
    shrinks them ~20x for ~90ms/state (measured), turning a 100s transfer
    into a few seconds."""
    return b"Z1" + zlib.compress(blob, 1)


def _unpack_state(blob: bytes) -> bytes:
    if blob[:2] == b"Z1":
        return zlib.decompress(blob[2:])
    return blob


@dataclass
class SketchJob:
    """One sketch to build in a (possibly multi-sketch) pass.

    ``key``: column name / Column for element sketches; ``ts``: event-time
    column for time-decaying kinds; ``values``: numeric column for
    quantile sketches.  ``name`` labels the output.

    ``prehash=True`` switches the job to the JVM-prehash fast path
    (``spark/prehash.py``): the key is hashed to an xxhash64 pair inside
    whole-stage codegen and only two int64 columns cross to Python —
    2.2x cheaper Python kernel loop and ~24x smaller crossing (measured;
    end-to-end parity on one box, where per-stream Arrow machinery floors
    both modes — see prehash.py), the recommended mode at cluster scale.
    The resulting sketch is NOT bit-compatible with
    mmh3-built states or archbloom native files; probe it with
    ``probe.probe_column(..., prehash=True)``.  Supported kinds: any kernel
    exposing ``update_hashes`` (hll, bloom, cms, tdbloom, cbloom, tdcbloom,
    sbf)."""

    name: str
    spec: BaseSpec
    key: object | None = None
    ts: object | None = None
    values: object | None = None
    prehash: bool = False
    # Hint for the declarative suite builder (spark/suite_sql.py): the key
    # has far fewer distinct values than rows (conversation ids, tool
    # names), so a key-level pre-reduction before the explode×k pays.
    # Ignored by the kernel build paths.
    low_cardinality: bool = False



def _input_bytes(df: DataFrame) -> int:
    """Best-effort size of the files behind a DataFrame (0 when unknown —
    in-memory relations, streams)."""
    import os

    try:
        total = 0
        for f in df.inputFiles():
            p = f
            if p.startswith("file:"):
                p = p[5:].lstrip("/")
                p = "/" + p
            if os.path.exists(p):
                total += os.path.getsize(p)
        return total
    except Exception:  # noqa: BLE001
        return 0


def _target_partials(df: DataFrame, state_bytes: int, parallelism: int | None) -> int:
    """How many partial states to build.

    More partials = more scan parallelism but also more state to serialize,
    compress, transfer, and fold — per-task overhead ∝ state_bytes.  When the
    input is small relative to the sketch state (bench scale: ~150 MB scan vs
    ~10 MB/task of state), full fan-out LOSES: the 5-sketch 3M-row build
    measured 2.06s at 8 partials, 3.2s at 16, 17.9s at 32 on an IDLE box
    (r3).  Profiling shows serde is NOT the cost (serialize+zlib ≈ 25 ms and
    the threaded driver fold ≈ 0.3 s for all 32 blobs); the blowup is memory
    contention — 32 concurrent ~10 MB scatter/update working sets thrash the
    shared LLC where 8 fit (the same shared-DRAM ceiling the BENCH/BASELINE
    controls isolate).  At 100 TB the same rule yields full parallelism
    (input_bytes/(8*state_bytes) ≫ cores), and real executors run 4-8 cores
    each, so per-node contention matches the 8-partial regime, not the
    32-partial one.  Rule: each partial task should scan at least 8x its own
    state size; floor 8 (or the session parallelism if smaller), cap at
    session parallelism and the input's own split count.  An explicit
    ``parallelism`` overrides."""
    par = df.sparkSession.sparkContext.defaultParallelism
    nparts = df.rdd.getNumPartitions()
    cap = min(par, nparts)
    if parallelism is not None:
        return max(1, min(int(parallelism), nparts))
    ib = _input_bytes(df)
    if not ib or not state_bytes:
        return cap
    floor = min(8, cap)
    budget = ib // (8 * state_bytes)
    return int(max(floor, min(cap, budget)))


def _coalesce_to_parallelism(
    df: DataFrame, state_bytes: int = 0, parallelism: int | None = None
) -> DataFrame:
    """Cap partial count per _target_partials via coalesce (no shuffle)."""
    target = _target_partials(df, state_bytes, parallelism)
    if df.rdd.getNumPartitions() > target:
        return df.coalesce(target)
    return df


def _fresh_state_bytes(specs_json: list[str]) -> int:
    """Serialized size of one empty kernel per spec — the per-task state
    cost driving _target_partials (allocation of zeros; cheap)."""
    total = 0
    for sj in specs_json:
        spec = BaseSpec.from_json(sj)
        total += len(KERNEL_BY_KIND[spec.kind](spec).serialize())
    return total


def _as_key_col(key) -> Column:
    col = F.col(key) if isinstance(key, str) else key
    return col.cast("string").alias("__key")


def _require_prehashable(spec: BaseSpec) -> None:
    if not hasattr(KERNEL_BY_KIND[spec.kind], "update_hashes"):
        raise ValueError(
            f"kind {spec.kind!r} has no prehashed ingest (update_hashes) — "
            "build it with prehash=False"
        )


def _u64_pair(a1: pa.Array, a2: pa.Array, tsec: np.ndarray | None):
    """Arrow int64 hash columns → aligned uint64 numpy arrays, nulls (null
    keys) dropped from both lanes and from ``tsec`` consistently."""
    import pyarrow.compute as pc

    if a1.null_count:
        valid = pc.is_valid(a1)
        a1 = a1.filter(valid)
        a2 = a2.filter(valid)
        if tsec is not None:
            tsec = tsec[valid.to_numpy(zero_copy_only=False)]
    h1 = mmh3.as_u64(a1.to_numpy(zero_copy_only=False))
    h2 = mmh3.as_u64(a2.to_numpy(zero_copy_only=False))
    return h1, h2, tsec


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
    parallelism: int | None = None,
    prehash: bool = False,
) -> DataFrame:
    """Build-stage: one serialized partial sketch row per input partition.

    ``key``: column/expression to sketch (bloom family, HLL, CMS, cuckoo).
    ``ts``: event-time column (time-decaying kinds; epoch-second resolution).
    ``values``: numeric column (KLL / t-digest).
    ``parallelism``: explicit partial count (default: state-size-aware auto).
    ``prehash``: JVM-side xxhash64 fast path (see :class:`SketchJob`).
    """
    cols: list[Column] = []
    wants_key = key is not None
    wants_ts = ts is not None
    wants_vals = values is not None
    one_lane = spec.kind in ("hll",)
    if wants_key:
        if prehash:
            _require_prehashable(spec)
            from sketchlib.spark.prehash import prehash_pair

            h1c, h2c = prehash_pair(key)
            cols.append(h1c.alias("__h1"))
            if not one_lane:
                cols.append(h2c.alias("__h2"))
        else:
            cols.append(_as_key_col(key))
    if wants_ts:
        tcol = F.col(ts) if isinstance(ts, str) else ts
        cols.append(tcol.alias("__ts"))
    if wants_vals:
        vcol = F.col(values) if isinstance(values, str) else values
        cols.append(vcol.cast("double").alias("__val"))
    proj = df.select(*cols)
    if wants_key:
        proj = proj.filter(
            F.col("__h1" if prehash else "__key").isNotNull()
        )
    spec_json = spec.to_json()
    proj = _coalesce_to_parallelism(
        proj,
        0 if parallelism is not None else _fresh_state_bytes([spec_json]),
        parallelism,
    )

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kernel = _new_kernel(spec_json)
        rows = 0
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            rows += n
            if wants_key and prehash:
                tsec = _ts_seconds(batch.column("__ts")) if wants_ts else None
                a1 = batch.column("__h1")
                a2 = batch.column("__h2") if not one_lane else a1
                h1, h2, tsec = _u64_pair(a1, a2, tsec)
                if wants_ts:
                    kernel.update_hashes(h1, h2, tsec)
                elif one_lane:
                    kernel.update_hashes(h1)
                else:
                    kernel.update_hashes(h1, h2)
            elif wants_key:
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
                pa.array([_pack_state(kernel.serialize())], type=pa.binary()),
                pa.array([rows], type=pa.int64()),
            ],
            names=["state", "rows"],
        )

    return proj.mapInArrow(build, _PARTIAL_SCHEMA)


def build_many(
    df: DataFrame,
    jobs: list[SketchJob],
    fanin: int = 64,
    parallelism: int | None = None,
) -> dict[str, object]:
    """Build N sketches in ONE pass over the data: one column-pruned scan,
    one Arrow crossing, N kernels updated per batch — the shape that matters
    at 100 TB, where the scan dominates and per-sketch passes would multiply
    it.  Returns {job.name: (kernel, rows)}."""
    cols: list[Column] = []
    aliases: dict[int, dict[str, str]] = {}
    seen: dict[str, str] = {}

    def _register(expr, role: str, ji: int, pre_built: Column | None = None):
        if pre_built is not None:
            col = pre_built
        else:
            col = F.col(expr) if isinstance(expr, str) else expr
            if role == "ts":
                col = col
            elif role == "values":
                col = col.cast("double")
            else:
                col = col.cast("string")
        sql = col._jc.toString() if hasattr(col, "_jc") else str(col)
        tag = f"{role}:{sql}"
        if tag not in seen:
            alias = f"__c{len(seen)}"
            seen[tag] = alias
            cols.append(col.alias(alias))
        aliases.setdefault(ji, {})[role] = seen[tag]

    for ji, job in enumerate(jobs):
        if job.key is not None:
            if job.prehash:
                _require_prehashable(job.spec)
                from sketchlib.spark.prehash import prehash_pair

                h1, h2 = prehash_pair(job.key)
                _register(None, "h1", ji, pre_built=h1)
                # one-lane kinds (HLL) never read h2 — don't make the JVM
                # compute a second xxhash64 per row for nothing
                if job.spec.kind not in ("hll",):
                    _register(None, "h2", ji, pre_built=h2)
            else:
                _register(job.key, "key", ji)
        if job.ts is not None:
            _register(job.ts, "ts", ji)
        if job.values is not None:
            _register(job.values, "values", ji)

    specs_json = [j.spec.to_json() for j in jobs]
    proj = df.select(*cols)
    # resolve the partial count once — it also plans the tree-combine levels
    target = _target_partials(
        proj,
        0 if parallelism is not None else _fresh_state_bytes(specs_json),
        parallelism,
    )
    if proj.rdd.getNumPartitions() > target:
        proj = proj.coalesce(target)
    roles = [aliases[i] for i in range(len(jobs))]

    out_fields = ", ".join(f"state_{i} binary" for i in range(len(jobs))) + ", rows bigint"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        kernels = [_new_kernel(sj) for sj in specs_json]
        rows = 0
        for batch in batches:
            if not batch.num_rows:
                continue
            rows += batch.num_rows
            buf_cache: dict[str, tuple] = {}
            for kern, role in zip(kernels, roles):
                if "h1" in role:
                    a1 = batch.column(role["h1"])
                    a2 = batch.column(role["h2"]) if "h2" in role else a1
                    tsec = (
                        _ts_seconds(batch.column(role["ts"]))
                        if "ts" in role
                        else None
                    )
                    h1, h2, tsec = _u64_pair(a1, a2, tsec)
                    if "ts" in role:
                        kern.update_hashes(h1, h2, tsec)
                    elif "h2" in role:
                        kern.update_hashes(h1, h2)
                    else:
                        kern.update_hashes(h1)  # one-lane kind (HLL)
                elif "key" in role:
                    a = role["key"]
                    arr = batch.column(a)
                    if "ts" in role:
                        # keep key/ts row alignment under nulls
                        tsec = _ts_seconds(batch.column(role["ts"]))
                        if arr.null_count:
                            import pyarrow.compute as pc

                            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                            arr = arr.drop_null()
                            tsec = tsec[valid]
                        data, off = mmh3.arrow_string_buffers(arr)
                        kern.update(data, off, tsec)
                    else:
                        if a not in buf_cache:
                            buf_cache[a] = mmh3.arrow_string_buffers(arr)
                        data, off = buf_cache[a]
                        kern.update(data, off)
                elif "values" in role:
                    vals = batch.column(role["values"]).to_numpy(zero_copy_only=False)
                    kern.update(vals)
        arrays = [pa.array([_pack_state(k.serialize())], type=pa.binary()) for k in kernels]
        arrays.append(pa.array([rows], type=pa.int64()))
        yield pa.RecordBatch.from_arrays(
            arrays, names=[f"state_{i}" for i in range(len(kernels))] + ["rows"]
        )

    partials = proj.mapInArrow(build, out_fields)
    # Spark-side combine level(s) while too many partials for the driver —
    # same fan-in plan as build_sketch, applied to all N states per row, so
    # a 10k-partial cluster build lands ≤ fanin blobs on the driver.
    nparts = target
    while nparts > fanin:
        n_buckets = -(-nparts // fanin)
        partials = _tree_merge_many(partials, specs_json, n_buckets)
        nparts = n_buckets
    # toArrow(), NOT collect(): binary sketch states are MBs each and py4j
    # row collection moves them at single-digit MB/s; Arrow moves them at
    # memory-bandwidth speed.
    tbl = partials.toArrow()
    out: dict[str, object] = {}
    total = sum(tbl.column("rows").to_pylist())
    for i, job in enumerate(jobs):
        blobs = tbl.column(f"state_{i}").to_pylist()
        kernel = _merge_blobs(specs_json[i], blobs)
        out[job.name] = (kernel, total)
    return out


def _merge_blobs(spec_json: str, blobs: list[bytes]):
    """Driver-side fold of partial states.  Threaded: zlib decompression and
    large-array numpy merges both release the GIL, so this scales across
    driver cores instead of being the serial Amdahl floor of every build."""
    from concurrent.futures import ThreadPoolExecutor

    spec = BaseSpec.from_json(spec_json)
    cls = KERNEL_BY_KIND[spec.kind]
    if not blobs:
        return cls(spec)
    nthreads = min(8, max(1, len(blobs) // 2))
    with ThreadPoolExecutor(nthreads) as pool:
        kernels = list(
            pool.map(lambda b: cls.deserialize(spec, _unpack_state(b)), blobs)
        )
        # pairwise tree fold: log2(n) levels, merges within a level in parallel
        while len(kernels) > 1:
            pairs = [
                (kernels[i], kernels[i + 1])
                for i in range(0, len(kernels) - 1, 2)
            ]
            tail = [kernels[-1]] if len(kernels) % 2 else []
            kernels = list(pool.map(lambda ab: ab[0].merge(ab[1]), pairs)) + tail
    return kernels[0]


def _tree_merge_many(
    partials: DataFrame, specs_json: list[str], n_buckets: int
) -> DataFrame:
    """One Spark-side combine level for build_many's multi-state partial rows
    (``state_0..state_{n-1}, rows``) — the N-sketch analog of
    :func:`tree_merge`, same spark_partition_id bucketing rationale."""
    n = len(specs_json)
    out_fields = ", ".join(f"state_{i} binary" for i in range(n)) + ", rows bigint"
    bucketed = partials.withColumn(
        "__b", (F.spark_partition_id() % n_buckets).cast("long")
    ).repartition(n_buckets, "__b")

    def combine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        blobs: list[list[bytes]] = [[] for _ in range(n)]
        rows = 0
        for batch in batches:
            cols = [batch.column(f"state_{i}") for i in range(n)]
            rs = batch.column("rows")
            for r in range(batch.num_rows):
                for i in range(n):
                    blobs[i].append(cols[i][r].as_py())
                rows += rs[r].as_py()
        if not any(blobs):
            return
        arrays = [
            pa.array(
                [_pack_state(_merge_blobs(specs_json[i], blobs[i]).serialize())],
                type=pa.binary(),
            )
            for i in range(n)
        ]
        arrays.append(pa.array([rows], type=pa.int64()))
        yield pa.RecordBatch.from_arrays(
            arrays, names=[f"state_{i}" for i in range(n)] + ["rows"]
        )

    return bucketed.select(
        *[f"state_{i}" for i in range(n)], "rows"
    ).mapInArrow(combine, out_fields)


def tree_merge(partials: DataFrame, spec: BaseSpec, n_buckets: int) -> DataFrame:
    """One Spark-side combine level: hash the partial rows into ``n_buckets``
    groups and merge each group to a single row.  Repeatable; used when the
    partial count would blow the driver fold."""
    spec_json = spec.to_json()
    # bucket by the (sequential) partition id, NOT monotonically_increasing_id:
    # partials carry one row per partition, so the monotonic id is
    # partitionId<<33 and any even n_buckets would collapse every row into
    # bucket 0, defeating the combine this exists for.  spark_partition_id
    # % n gives perfectly even buckets.
    bucketed = partials.withColumn(
        "__b", (F.spark_partition_id() % n_buckets).cast("long")
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
                pa.array([_pack_state(merged.serialize())], type=pa.binary()),
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
    parallelism: int | None = None,
    prehash: bool = False,
):
    """End-to-end: build partials, merge (tree level(s) Spark-side if needed,
    final fold on the driver), return ``(kernel, total_rows)``."""
    # resolve the partial count ONCE (file stats + kernel allocation are not
    # free) and hand the explicit value to the build stage
    target = _target_partials(df, _fresh_state_bytes([spec.to_json()]), parallelism)
    partials = sketch_partials(
        df, spec, key=key, ts=ts, values=values, parallelism=target,
        prehash=prehash,
    )
    # Spark-side combine level(s) while too many partials for the driver —
    # planned up front from the partial count so nothing recomputes.
    nparts = target
    while nparts > fanin:
        n_buckets = -(-nparts // fanin)  # each bucket folds ≤ fanin states
        partials = tree_merge(partials, spec, n_buckets)
        nparts = n_buckets
    tbl = partials.select("state", "rows").toArrow()  # Arrow, not py4j collect
    spec_json = spec.to_json()
    kernel = _merge_blobs(spec_json, tbl.column("state").to_pylist())
    total = sum(tbl.column("rows").to_pylist())
    return kernel, total
