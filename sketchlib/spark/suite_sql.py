"""Single-pass pure-Catalyst build of a multi-sketch suite — the
north-star workload (HLL / Bloom / CMS / TdBloom / counting-Bloom over one
scan) with ZERO Python anywhere in the dataflow, and every materialized
kernel **byte-identical** to ``build_many(df, jobs, prehash=True)`` over
the same rows (property-tested).

This is the scaling-gate configuration: the mapInArrow kernel path pays a
per-stream Python/Arrow conversion cost that floors single-box N→4N
scaling at ~0.5 (measured; the JVM-only control reaches ~0.9 — see
BENCH/BASELINE.md).  Here the entire suite is whole-stage codegen + one
hash-aggregate, so it scales like the JVM control.

Dataflow: every sketch's update is an associative per-cell aggregate over
positions derivable in codegen, so the suite is ONE tagged union

    (sk, cell, v)  →  groupBy(sk, cell).agg(max(v), bit_or(v), count(*))

with map-side partial aggregation; the shuffle carries at most
state-sized cell rows (Σ sketch cells), never data-sized rows:

- HLL:     cell = register idx,        max(rho)        (spark/hll_sql.py)
- Bloom:   cell = word idx,            bit_or(mask)    (spark/bloom_sql.py)
- cbloom:  cell = counter pos,         count, capped at materialization
- CMS:     cell = row·w + pos,         count — the prehash kernel's own
           KM scheme (kernels/cms.py::update_hashes), NOT the independent
           per-row family of spark/cms_sql.py, so the result byte-matches
           the prehash kernel build
- TdBloom: cell = pos,                 max(event-time tick)

Hash family: the prehash xxhash64 pair throughout (``spark/prehash.py``)
— states merge freely with prehash kernel builds and probe with
``probe_column(..., prehash=True)``; NOT compatible with mmh3-built
states or archbloom native files.

Endpoints:
- :func:`build_suite_sql` — materialize driver-side kernels, the
  ``build_many`` parity endpoint ({name: (kernel, rows)});
- :func:`run_suite_sql` — aggregate-only action (cell count): the state
  stays distributed, the honest cluster endpoint for benchmarks (a real
  100-TB job would write the cell frames to a store or probe them with
  broadcast joins, never funnel them through one driver);
- :func:`build_sketch_sql` — single-sketch convenience dispatcher.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.kernels import CountMinSketch, HyperLogLog
from sketchlib.spark.agg import SketchJob
from sketchlib.spark.bloom_sql import (
    _lane_positions,
    _tick_col,
    _words_to_bits,
    build_bloom_sql,
    build_cbloom_sql,
    build_tdbloom_sql,
)
from sketchlib.spark.hll_sql import build_hll_sql, idx_rho_from_hash
from sketchlib.spark.prehash import prehash_pair
from sketchlib.specs import CmsSpec

_SUPPORTED = ("hll", "bloom", "cbloom", "cms", "tdbloom", "tdcbloom")


# ---------------------------------------------------------------------------
# prehash-family CMS (KM ladder — byte-identical to the prehash kernel)
# ---------------------------------------------------------------------------

def cms_km_cell_rows(df: DataFrame, spec: CmsSpec, key) -> DataFrame:
    """CMS cell frame ``(i, pos, cnt)`` in the PREHASH family — row i's
    position is the KM ladder ``(h1 + i·h2) mod w`` (kernels/cms.py:42-55),
    so ``build_cms_sql_km`` byte-matches the prehash kernel build.  For the
    independent-per-row xxhash64 family (mergeable only with itself) use
    ``spark/cms_sql.py``."""
    h1, h2 = prehash_pair(key)
    lanes = df.select(h1.alias("__h1"), h2.alias("__h2")).filter(
        F.col("__h1").isNotNull()
    )
    return (
        _lane_positions(lanes, spec.depth, spec.width)
        .select(F.col("__i").cast("int").alias("i"), "pos")
        .groupBy("i", "pos")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def build_cms_sql_km(df: DataFrame, spec: CmsSpec, key) -> CountMinSketch:
    """Prehash-family CMS with zero Python in the build dataflow —
    byte-identical to ``build_sketch(df, spec, key=key, prehash=True)``."""
    rows = cms_km_cell_rows(df, spec, key).collect()
    table = np.zeros((spec.depth, spec.width), dtype=np.uint64)
    for r in rows:
        table[r["i"], r["pos"]] = r["cnt"]
    return CountMinSketch(spec, table)


def build_sketch_sql(df: DataFrame, spec, key, ts: str = "ts", prereduce: bool = False):
    """Declarative single-sketch build, dispatched by spec kind — the
    zero-Python counterpart of ``build_sketch(..., prehash=True)`` (same
    hash family, byte-identical result).  ``prereduce=True`` turns on the
    bloom-family key-level pre-reduction before the explode×k (the
    low_cardinality trick of :func:`_job_cells`) — a win when the key has
    far fewer distinct values than rows; hll and cms ignore it (hll's
    register agg is already key-shaped; cms has its own cell path)."""
    kind = spec.kind
    if kind == "hll":
        return build_hll_sql(df, spec, key)
    if kind == "bloom":
        return build_bloom_sql(df, spec, key, prereduce=prereduce)
    if kind == "cbloom":
        return build_cbloom_sql(df, spec, key, prereduce=prereduce)
    if kind == "cms":
        return build_cms_sql_km(df, spec, key)
    if kind == "tdbloom":
        return build_tdbloom_sql(df, spec, key, ts=ts, prereduce=prereduce)
    if kind == "tdcbloom":
        from sketchlib.spark.bloom_sql import build_tdcbloom_sql

        return build_tdcbloom_sql(df, spec, key, ts=ts, prereduce=prereduce)
    raise ValueError(
        f"no declarative build for kind {kind!r}; supported: {_SUPPORTED}"
    )


# ---------------------------------------------------------------------------
# the single-pass suite
# ---------------------------------------------------------------------------

def _job_cells(df: DataFrame, j: int, job: SketchJob) -> DataFrame:
    """One job's aggregated cell frame, normalized to the suite schema
    ``(sk int, cell bigint, vmax bigint, vor bigint, cnt bigint)`` — only
    the aggregate the kind needs is computed (vmax for hll/tdbloom, vor
    for bloom, cnt everywhere for counters and ingested-row accounting).
    All explodes are over PRIMITIVE long arrays (see bloom_word_rows).

    ``job.low_cardinality`` turns on a key-level pre-reduction BEFORE the
    explode×k: the per-key sufficient statistic (count for cms/cbloom,
    max tick for tdbloom, presence for bloom) is aggregated by the hash
    pair first, so the explode runs over #distinct-keys rows instead of
    #rows — for a 9M-turn / 300k-conversation suite that cuts the
    tdbloom explode volume 30× and the cms one ~10⁶× (4 tools).  Same
    final state (the statistics are associative through the key level);
    wrong choice for near-unique keys, where the pre-reduction map would
    be data-sized — hence opt-in per job."""
    kind = job.spec.kind
    nul = F.lit(None).cast("bigint")
    sk = F.lit(j).alias("sk")
    lowcard = getattr(job, "low_cardinality", False)

    if kind == "hll":
        h1, _ = prehash_pair(job.key)
        idx, rho = idx_rho_from_hash(F.col("__h1"), job.spec.p)
        reg = (
            df.select(h1.alias("__h1"))
            .select(idx.alias("cell"), rho.alias("v"))
            .filter(F.col("cell").isNotNull())
            .groupBy("cell")
            .agg(F.max("v").alias("vmax"), F.count(F.lit(1)).alias("cnt"))
        )
        return reg.select(sk, "cell", "vmax", nul.alias("vor"), "cnt")

    h1, h2 = prehash_pair(job.key)
    k = job.spec.depth if kind == "cms" else job.spec.k
    m = job.spec.width if kind == "cms" else job.spec.m

    timed = kind in ("tdbloom", "tdcbloom")
    lanes = df.select(
        h1.alias("__h1"),
        h2.alias("__h2"),
        *([_tick_col(job.spec, job.ts).alias("__tick")] if timed else []),
    ).filter(F.col("__h1").isNotNull())
    if timed:
        lanes = lanes.filter(F.col("__tick").isNotNull())

    # key-level pre-reduction: tiny hash map over (h1, h2), then the
    # explode×k runs over distinct keys with a per-key weight/stat
    if lowcard:
        if timed:
            lanes = lanes.groupBy("__h1", "__h2").agg(
                F.max("__tick").alias("__tick"),
                F.count(F.lit(1)).alias("__w"),
            )
        else:
            lanes = lanes.groupBy("__h1", "__h2").agg(
                F.count(F.lit(1)).alias("__w")
            )
    else:
        lanes = lanes.withColumn("__w", F.lit(1).cast("bigint"))

    carry = tuple(["__w"] + (["__tick"] if timed else []))
    pos = _lane_positions(lanes, k, m, carry=carry)

    if kind == "bloom":
        words = (
            pos.select(
                F.shiftrightunsigned("pos", 6).alias("cell"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("bigint"),
                    F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
                ).alias("mask"),
                F.col("__w"),
            )
            .groupBy("cell")
            .agg(F.bit_or("mask").alias("vor"), F.sum("__w").alias("cnt"))
        )
        return words.select(sk, "cell", nul.alias("vmax"), "vor", "cnt")

    if kind in ("cbloom", "cms"):
        if kind == "cms":
            cellcol = pos.select(
                (F.col("__i") * m + F.col("pos")).alias("cell"), F.col("__w")
            )
        else:
            cellcol = pos.select(F.col("pos").alias("cell"), F.col("__w"))
        cells = cellcol.groupBy("cell").agg(F.sum("__w").alias("cnt"))
        return cells.select(sk, "cell", nul.alias("vmax"), nul.alias("vor"), "cnt")

    # tdbloom / tdcbloom (SoA: counter rides in cnt, tick in vmax)
    cells = (
        pos.select(
            F.col("pos").alias("cell"), F.col("__tick").alias("v"), F.col("__w")
        )
        .groupBy("cell")
        .agg(F.max("v").alias("vmax"), F.sum("__w").alias("cnt"))
    )
    return cells.select(sk, "cell", "vmax", nul.alias("vor"), "cnt")


def suite_cell_rows(df: DataFrame, jobs: list[SketchJob]) -> DataFrame:
    """The whole suite's merged state as one tagged frame
    ``(sk int, cell bigint, vmax bigint, vor bigint, cnt bigint)`` — a
    union of per-job aggregations evaluated in a single action.

    Deliberately NOT one giant shared groupBy over a concatenated entry
    array: that shape (measured) runs ~8x slower — the 20+-element
    array<struct> per row allocates generic rows at explode time and the
    single mixed-cardinality hash aggregate computes three aggregate
    buffers for every entry.  Per-kind branches keep each explode
    primitive, each aggregate minimal, and each hash table
    single-cardinality; the scan repeats per branch but is the cheap part
    (the JVM control prices scan+hash at ~5% of suite time)."""
    branches = []
    for j, job in enumerate(jobs):
        if job.spec.kind not in _SUPPORTED:
            raise ValueError(
                f"job {job.name!r}: no declarative build for kind "
                f"{job.spec.kind!r}; supported: {_SUPPORTED}"
            )
        branches.append(_job_cells(df, j, job))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def merge_suite_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two suite cell frames — the distributed-state merge algebra:
    ``groupBy(sk, cell).agg(max(vmax), bit_or(vor), sum(cnt))``.  Exactly
    the kernels' merge semantics per kind (HLL/tick max, bitmap OR,
    counter add), so merging incremental cell frames then materializing
    equals one build over the union (associative/commutative;
    property-tested).  This is how a 100-TB deployment runs incremental
    builds: append a day's cell frame, re-aggregate, never touch kernels
    or the driver."""
    u = a.unionByName(b)
    return u.groupBy("sk", "cell").agg(
        F.max("vmax").alias("vmax"),
        F.bit_or("vor").alias("vor"),
        F.sum("cnt").alias("cnt"),
    )


def write_suite_cells(cells: DataFrame, path: str) -> None:
    """Persist a cell frame as parquet partitioned by sketch — the
    distributed sketch store for the declarative path (cell frames ARE
    the state; no driver materialization)."""
    cells.write.mode("overwrite").partitionBy("sk").parquet(path)


def read_suite_cells(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).select("sk", "cell", "vmax", "vor", "cnt")


def materialize_suite_cells(
    cells: DataFrame, jobs: list[SketchJob]
) -> dict[str, tuple[object, int]]:
    """Driver-side kernels from an (already aggregated) cell frame — the
    read-side counterpart of :func:`build_suite_sql` for stored/merged
    frames."""
    return _materialize(cells.toArrow(), jobs)


# Plan cache for repeated suite runs over the same (df, jobs): building
# the cell-frame DataFrame costs ~1.6 s of driver-side py4j traffic (the
# KM ladder is thousands of Column calls) — a pure fixed cost that a
# production job pays once per batch loop, not once per action.  Keyed by
# the jobs' semantic signature and validated against the exact DataFrame
# object (weakly referenced, so cached plans die with their input).
_PLAN_CACHE: dict[tuple, tuple[object, DataFrame]] = {}


def _jobs_sig(jobs: list[SketchJob]) -> tuple:
    return tuple(
        (j.name, repr(j.spec), str(j.key), str(j.ts), j.prehash, j.low_cardinality)
        for j in jobs
    )


def _cached_cells(df: DataFrame, jobs: list[SketchJob]) -> DataFrame:
    import weakref

    # id(df) in the key lets alternating inputs coexist; the weakref
    # identity check guards against id reuse after garbage collection
    sig = (_jobs_sig(jobs), id(df))
    ent = _PLAN_CACHE.get(sig)
    if ent is not None and ent[0]() is df:
        return ent[1]
    cells = suite_cell_rows(df, jobs)
    _PLAN_CACHE[sig] = (weakref.ref(df), cells)
    if len(_PLAN_CACHE) > 32:  # bound: drop entries whose input was gc'd
        for k in [k for k, v in _PLAN_CACHE.items() if v[0]() is None]:
            del _PLAN_CACHE[k]
    return cells


def run_suite_sql(df: DataFrame, jobs: list[SketchJob]) -> int:
    """Aggregate-only suite action: computes the fully-merged distributed
    cell state and returns its row count.  No driver materialization —
    the benchmark endpoint (and the realistic cluster one: cell frames
    are written to a store or probed via broadcast joins in place).
    Repeated calls over the same ``df``/``jobs`` reuse the cached plan."""
    return _cached_cells(df, jobs).count()


def build_suite_sql(
    df: DataFrame, jobs: list[SketchJob]
) -> dict[str, tuple[object, int]]:
    """Materialize every suite kernel on the driver — the ``build_many``
    parity endpoint: returns {job.name: (kernel, rows_ingested)} with each
    kernel byte-identical to ``build_many(df, jobs, prehash=True)``.  The
    collect is state-sized (Σ sketch cells), never data-sized."""
    return _materialize(_cached_cells(df, jobs).toArrow(), jobs)


def _materialize(tbl, jobs: list[SketchJob]) -> dict[str, tuple[object, int]]:
    import pyarrow.compute as pc

    sk = tbl.column("sk").to_numpy(zero_copy_only=False)
    cell = tbl.column("cell").to_numpy(zero_copy_only=False)
    # fill_null BEFORE to_numpy: the union leaves each kind's unused
    # aggregate columns null, and a nullable int64 column converts to
    # float64 — which silently corrupts 64-bit bitmap words
    vmax = pc.fill_null(tbl.column("vmax"), 0).to_numpy(zero_copy_only=False)
    vor = pc.fill_null(tbl.column("vor"), 0).to_numpy(zero_copy_only=False)
    cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)

    out: dict[str, tuple[object, int]] = {}
    for j, job in enumerate(jobs):
        sel = sk == j
        c, mx, orr, n = cell[sel], vmax[sel], vor[sel], cnt[sel]
        kind = job.spec.kind
        if kind == "hll":
            regs = np.zeros(job.spec.m, dtype=np.uint8)
            regs[c] = np.minimum(mx, 64 - job.spec.p + 1).astype(np.uint8)
            out[job.name] = (HyperLogLog(job.spec, regs), int(n.sum()))
        elif kind == "bloom":
            from sketchlib.kernels import BloomFilter

            bits = _words_to_bits(list(zip(c, orr)), job.spec.nbytes)
            out[job.name] = (
                BloomFilter(job.spec, bits),
                int(n.sum()) // job.spec.k,
            )
        elif kind == "cbloom":
            from sketchlib.kernels import CountingBloomFilter

            counters = np.zeros(job.spec.m, dtype=job.spec.dtype)
            counters[c] = np.minimum(n, job.spec.cap).astype(job.spec.dtype)
            out[job.name] = (
                CountingBloomFilter(job.spec, counters),
                int(n.sum()) // job.spec.k,
            )
        elif kind == "cms":
            w = job.spec.width
            table = np.zeros((job.spec.depth, w), dtype=np.uint64)
            table[c // w, c % w] = n.astype(np.uint64)
            out[job.name] = (
                CountMinSketch(job.spec, table),
                int(n.sum()) // job.spec.depth,
            )
        elif kind == "tdbloom":
            from sketchlib.kernels import TdBloomFilter

            if c.size:
                if mx.min() < 1:
                    raise ValueError("ts earlier than spec.start_time")
                if mx.max() >= 2**31:
                    raise ValueError("ts span exceeds int32 ticks (>68 years)")
            ticks = np.zeros(job.spec.m, dtype=np.int32)
            ticks[c] = mx.astype(np.int32)
            out[job.name] = (
                TdBloomFilter(job.spec, ticks),
                int(n.sum()) // job.spec.k,
            )
        elif kind == "tdcbloom":
            from sketchlib.kernels import TdCBloomFilter

            if c.size:
                if mx.min() < 1:
                    raise ValueError("ts earlier than spec.start_time")
                if mx.max() >= 2**31:
                    raise ValueError("ts span exceeds int32 ticks (>68 years)")
            counters = np.zeros(job.spec.m, dtype=job.spec.counter_np_dtype)
            counters[c] = np.minimum(n, job.spec.cap).astype(
                job.spec.counter_np_dtype
            )
            ticks = np.zeros(job.spec.m, dtype=np.int32)
            ticks[c] = mx.astype(np.int32)
            out[job.name] = (
                TdCBloomFilter(job.spec, counters, ticks),
                int(n.sum()) // job.spec.k,
            )
    return out
