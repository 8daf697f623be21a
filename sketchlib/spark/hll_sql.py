"""Pure-Catalyst HyperLogLog build: the sketch update expressed as a
declarative aggregation — zero Python anywhere in the build.

HLL's update is `registers[idx] = max(registers[idx], rho)`, which IS a
``groupBy(idx).agg(max(rho))`` — so the whole build can stay inside
whole-stage codegen with map-side partial aggregation: the shuffle moves at
most ``2^p`` rows per partition, and the only driver work is scattering
≤ 2^p (idx, rho) pairs into a register array.  Measured: **10M rows/s** on
the 9M-turn bench table at local[32] vs ~1.5M rows/s for the Arrow-crossing
kernel path — the per-stream Python machinery is gone entirely.

Integer-exact rho (no float clz): ``length(bin(w))`` is 64−clz(w) for
``w > 0`` (bin() renders without leading zeros), w < 0 means the top bit is
set (clz 0), w == 0 means all 64 shifted bits were zero.  This reproduces
``kernels/hll.py::update_hashes`` bit-for-bit — the returned kernel's
registers are byte-identical to a Python-side build over the same xxhash64
lane (tested), so SQL-built and kernel-built states merge freely.

Family note: the hash lane is JVM ``xxhash64`` — the prehash family
(``spark/prehash.py``), NOT mmh3.  Merge only with ``prehash=True`` HLLs.

The same pattern extends to any sketch whose update is an associative
per-cell aggregate over derivable positions (tdbloom: ``max(tick)`` per
cell; CMS: ``count`` per (row, cell)) at the cost of an explode×k — worth
it when k·n shuffle-after-combine stays small; HLL is the clear win (k=1,
2^p cells) and is what this module ships.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib.kernels import HyperLogLog
from sketchlib.specs import HllSpec


def idx_rho_from_hash(h: Column, p: int) -> tuple[Column, Column]:
    """(register index, rho) columns from an already-computed xxhash64 lane
    — the exact integer formulas of kernels/hll.py::update_hashes.  Shared
    with the single-pass suite builder (spark/suite_sql.py), which aliases
    the hash column first to keep generated code small."""
    idx = F.shiftrightunsigned(h, 64 - p)
    w = F.shiftleft(h, p)
    clz = (
        F.when(w < 0, F.lit(0))
        .when(w == 0, F.lit(64))
        .otherwise(F.lit(64) - F.length(F.bin(w)))
    )
    rho = F.least(clz + 1, F.lit(64 - p + 1))
    return idx, rho


def _idx_rho(key, p: int) -> tuple[Column, Column]:
    """(register index, rho) columns for the xxhash64 lane of ``key``."""
    c = (F.col(key) if isinstance(key, str) else key).cast("string")
    h = F.when(c.isNotNull(), F.xxhash64(c))
    return idx_rho_from_hash(h, p)


def hll_register_rows(df: DataFrame, spec: HllSpec, key) -> DataFrame:
    """The aggregated (idx, rho) frame — ≤ 2^p rows, never more.  Exposed
    separately so callers can roll up by extra grouping columns or persist
    register rows instead of materializing a kernel."""
    idx, rho = _idx_rho(key, spec.p)
    return (
        df.select(idx.alias("idx"), rho.alias("rho"))
        .filter(F.col("idx").isNotNull())
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_sql_rollup(
    df: DataFrame, spec: HllSpec, key, bucket=None, ts: str = "ts"
) -> DataFrame:
    """Day-bucketed HLL rollup with the register aggregation in Catalyst:
    ``groupBy(bucket, idx).agg(max(rho), count)`` — the shuffle carries at
    most ``buckets × 2^p`` integer rows and NO raw keys; Python appears
    only to pack each bucket's ≤ 2^p register rows into a state blob.

    Output schema matches ``spark/rollup.py`` (``bucket date, state binary,
    rows bigint``), so ``write_rollup`` / ``read_rollup`` / ``merge_range``
    work unchanged — but the states are xxhash64-family (prehash): do not
    mix them in one store with mmh3-family rollups."""
    import pandas as pd

    from sketchlib.spark.agg import _pack_state

    bcol = F.to_date(ts) if bucket is None else (
        F.col(bucket) if isinstance(bucket, str) else bucket
    )
    idx, rho = _idx_rho(key, spec.p)
    reg = (
        df.select(bcol.alias("bucket"), idx.alias("idx"), rho.alias("rho"))
        .filter(F.col("idx").isNotNull() & F.col("bucket").isNotNull())
        .groupBy("bucket", "idx")
        .agg(F.max("rho").alias("rho"), F.count(F.lit(1)).alias("c"))
    )
    m, p = spec.m, spec.p

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        regs = np.zeros(m, dtype=np.uint8)
        regs[pdf["idx"].to_numpy(dtype=np.int64)] = np.minimum(
            pdf["rho"].to_numpy(dtype=np.int64), 64 - p + 1
        ).astype(np.uint8)
        return pd.DataFrame(
            {
                "bucket": [pdf["bucket"].iloc[0]],
                "state": [_pack_state(regs.tobytes())],
                "rows": [int(pdf["c"].sum())],
            }
        )

    return reg.groupBy("bucket").applyInPandas(
        pack, "bucket date, state binary, rows bigint"
    )


def build_hll_sql(df: DataFrame, spec: HllSpec, key) -> HyperLogLog:
    """Build an xxhash64-family HLL with zero Python in the build path.

    Returns a kernel byte-identical to ``build_sketch(df, spec, key=key,
    prehash=True)`` over the same rows (merge-compatible with prehash
    kernels; NOT with mmh3-built ones)."""
    rows = hll_register_rows(df, spec, key).collect()
    regs = np.zeros(spec.m, dtype=np.uint8)
    if rows:
        ii = np.array([r["idx"] for r in rows], dtype=np.int64)
        rr = np.minimum(
            np.array([r["rho"] for r in rows], dtype=np.int64), 64 - spec.p + 1
        ).astype(np.uint8)
        regs[ii] = rr
    return HyperLogLog(spec, regs)
