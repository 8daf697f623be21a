"""Pure-Catalyst Count-Min sketch: build AND probe as declarative
aggregations — zero Python anywhere in the dataflow.

CMS's update adds 1 to cell ``(i, pos_i(key))`` for each of the d rows, so
the whole state is ``groupBy(i, pos).count()`` over an explode×d — at most
``d·w`` result rows (27k at ε=5e-4, d=5), reached through map-side partial
aggregation inside whole-stage codegen.  The state IS a small DataFrame:

- **build**: ``cms_cell_rows(df, spec, key)`` → ``(i, pos, cnt)``;
- **probe**: ``cms_sql_estimates(cells, df, spec, key)`` re-derives each
  probe key's d cells with the same expressions and broadcast-joins them
  against the cell frame — min over the d matches is the point estimate,
  computed entirely JVM-side (missing cells count 0, as an untouched
  counter should);
- **merge**: union two cell frames and re-aggregate (``sum(cnt)``) — the
  table add, still declarative;
- ``build_cms_table`` materializes the d×w numpy table for driver-side
  workflows (error_bound etc.).

Hash family: row ``i`` uses ``pmod(xxhash64(key, i), w)`` — d independent
JVM lanes.  This is deliberately NOT the kernel's Kirsch–Mitzenmacher
``h1 + i·h2`` ladder: reproducing the KM wrap-around add under Spark's
ANSI mode would need overflow-tolerant 64-bit arithmetic the SQL layer
does not expose, and any uniform per-row family satisfies the
Cormode–Muthukrishnan proof (overcount ≤ εN with P ≥ 1−δ; never
undercounts).  Consequently a SQL-CMS state must not be merged with a
kernel-built CMS — both the build and every probe live in this module's
family, and the two families never mix (mirrors the prehash-vs-mmh3 split
documented in spark/prehash.py).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.specs import CmsSpec


def _pos_array(key, spec: CmsSpec):
    """Array of the d cell positions for ``key`` (null key → null)."""
    c = (F.col(key) if isinstance(key, str) else key).cast("string")
    return F.when(
        c.isNotNull(),
        F.array(
            *[
                F.pmod(F.xxhash64(c, F.lit(i)), F.lit(spec.width))
                for i in range(spec.depth)
            ]
        ),
    )


def cms_cell_rows(df: DataFrame, spec: CmsSpec, key) -> DataFrame:
    """The aggregated cell frame ``(i int, pos long, cnt long)`` — at most
    d·w rows regardless of input size (map-side combine does the heavy
    lifting).  Null keys are dropped, matching the kernel build."""
    return (
        df.select(F.posexplode(_pos_array(key, spec)).alias("i", "pos"))
        .groupBy("i", "pos")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def merge_cell_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """CMS merge = table add: union and re-sum (associative/commutative)."""
    return (
        a.unionByName(b).groupBy("i", "pos").agg(F.sum("cnt").alias("cnt"))
    )


def cms_sql_estimates(
    cells: DataFrame, df: DataFrame, spec: CmsSpec, key, result_col: str = "est"
) -> DataFrame:
    """Point estimates for the distinct keys of ``df[key]`` — min over the
    d broadcast-joined cells, entirely JVM-side.  Returns ``(key_col,
    result_col)`` with the key column in the caller's ORIGINAL type (the
    hash lane string-casts internally, but the returned values are the
    uncast originals — an int probe key joins back without coercion); keys
    absent from every cell estimate 0 (they were never added)."""
    orig = F.col(key) if isinstance(key, str) else key
    probes = (
        df.select(orig.alias("__orig"))
        .filter(F.col("__orig").isNotNull())
        .distinct()
        .select(
            "__orig",
            F.posexplode(_pos_array(F.col("__orig"), spec)).alias("i", "pos"),
        )
    )
    return (
        probes.join(F.broadcast(cells), ["i", "pos"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("__orig")
        .agg(F.min("cnt").alias(result_col))
        .withColumnRenamed("__orig", key if isinstance(key, str) else "key")
    )


def build_cms_table(df: DataFrame, spec: CmsSpec, key) -> tuple[np.ndarray, int]:
    """Materialize the d×w table (uint64) + total stream length on the
    driver — ≤ d·w rows collected, never the data."""
    rows = cms_cell_rows(df, spec, key).collect()
    table = np.zeros((spec.depth, spec.width), dtype=np.uint64)
    for r in rows:
        table[r["i"], r["pos"]] = r["cnt"]
    total = int(table.sum()) // spec.depth if rows else 0
    return table, total
