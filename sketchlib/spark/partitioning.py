"""Quantile-driven range partitioning — KLL sketches serving the engine.

``df.repartitionByRange`` samples the input afresh every run, so partition
boundaries drift batch to batch — hostile to incremental sorted layouts
(bucketed parquet, Iceberg sort orders, day-over-day compaction).  A KLL
sketch gives the same boundaries as a small mergeable state: build it once
(or keep it in the rollup store and fold daily states), cut at n-1
quantiles, and every subsequent job buckets identically.

The bucket assignment is pure Catalyst: a fold over the cut-point array
literal counting cuts ≤ value — O(n_buckets) comparisons per row inside
whole-stage codegen, no sampling job, no shuffle until the caller's own
``repartition``/``partitionBy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib.specs import KllSpec


def quantile_cuts(kernel, n_buckets: int) -> list[float]:
    """n_buckets-1 interior quantile cut points from a KLL (or t-digest)
    kernel — the stable range boundaries."""
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return [float(c) for c in kernel.quantiles(qs)]


def range_bucket(col, cuts: list[float]) -> Column:
    """Bucket index (0-based) of ``col`` under the cut points: number of
    cuts ≤ value.  Nulls → bucket 0 (sorts first, like ascending
    nulls-first).  One array-literal fold, codegen-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.lit([float(x) for x in cuts]),
        F.lit(0),
        lambda acc, cut: acc + F.when(c >= cut, 1).otherwise(0),
    ).alias("bucket")


def repartition_by_quantiles(
    df: DataFrame,
    col: str,
    n_buckets: int,
    kernel=None,
    spec: KllSpec | None = None,
    bucket_col: str = "__bucket",
) -> DataFrame:
    """Add ``bucket_col`` and repartition so each quantile bucket lands
    wholly in one partition (hash on the bucket id) — each bucket holds
    ≈ rows/n_buckets by the KLL rank guarantee, stable across runs when
    ``kernel`` is reused.  Note hash(bucket_id) can stack two buckets in
    one partition (leaving another empty); for strict one-bucket-per-file
    layouts write with ``partitionBy(bucket_col)`` instead, where the
    directory IS the bucket.

    ``kernel`` defaults to a fresh KLL build over ``df[col]`` (one extra
    pass); pass a stored/merged kernel for stable incremental boundaries.
    """
    if kernel is None:
        from sketchlib.spark.agg import build_sketch

        kernel, _ = build_sketch(df, spec or KllSpec(k=200), values=col)
    cuts = quantile_cuts(kernel, n_buckets)
    bucketed = df.withColumn(bucket_col, range_bucket(col, cuts))
    return bucketed.repartition(n_buckets, bucket_col)
