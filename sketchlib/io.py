"""Table layer: Iceberg when a runtime jar is on the classpath, Parquet
otherwise — identical schema and partitioning either way (SURVEY.md §7 M3).

The 10^12-turn deployment target is an Iceberg table with hidden
partitioning ``bucket(N, conv_id), days(ts)``; this sandbox has no Iceberg
runtime jar and no network, so the Parquet path mirrors that layout with
explicit ``bucket``/``day`` partition columns (same pruning behavior for the
query patterns we use: day-range predicates prune day directories, bucket
routing prunes bucket directories).

Writes apply the north rule's explicit skew handling: rows are repartitioned
by a salted conversation hash before write, so a single hot conversation
spreads across tasks — safe because every downstream sketch is
merge-order-invariant (associativity is the skew remedy, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class TranscriptsTable:
    """The conversation-transcripts table (BASELINE.json input_hint schema:
    conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp)."""

    def __init__(self, spark: SparkSession, location: str, n_buckets: int = 16):
        self.spark = spark
        self.location = location
        self.n_buckets = n_buckets
        self.use_iceberg = iceberg_available(spark) and location.startswith("catalog:")

    # -- write -------------------------------------------------------------
    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        if self.use_iceberg:
            name = self.location.removeprefix("catalog:")
            (
                df.writeTo(name)
                .partitionedBy(
                    F.bucket(self.n_buckets, F.col("conv_id")), F.days(F.col("ts"))
                )
                .createOrReplace()
            )
            return
        out = (
            df.withColumn(
                "bucket",
                F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast("int"),
            )
            .withColumn("day", F.to_date("ts"))
            # salted repartition: hot conversations spread across write tasks
            .repartition(
                self.spark.sparkContext.defaultParallelism,
                F.xxhash64("conv_id", F.lit(17)),
            )
        )
        out.write.mode(mode).partitionBy("bucket", "day").parquet(self.location)

    # -- read ---------------------------------------------------------------
    def read(self) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self.location.removeprefix("catalog:"))
        return self.spark.read.parquet(self.location)

    def read_days(self, start_day: str, end_day: str) -> DataFrame:
        """Day-range read — prunes day partitions in both backends.

        On the Parquet path the filter MUST hit the ``day`` partition column:
        filtering ``to_date(ts)`` pushes a ts *data* filter but an empty
        ``PartitionFilters: []`` (verified round 1), i.e. every day directory
        is still scanned.  ``day == to_date(ts)`` by construction (write()),
        so the day-range predicate is exactly equivalent."""
        if self.use_iceberg:
            # plain column-vs-literal ts range: pushable to Iceberg, whose
            # hidden days(ts) partitioning then prunes manifests (a
            # to_date(ts) wrapper would NOT convert to a source predicate)
            return self.read().filter(
                (F.col("ts") >= F.lit(start_day).cast("timestamp"))
                & (F.col("ts") < F.date_add(F.lit(end_day).cast("date"), 1).cast("timestamp"))
            )
        return self.read().filter(
            (F.col("day") >= F.lit(start_day).cast("date"))
            & (F.col("day") <= F.lit(end_day).cast("date"))
        )

    def read_bucket_of(self, conv_id: str) -> DataFrame:
        """Bucket-routed read for point lookups of one conversation — prunes
        to 1/n_buckets of the table before the conv_id filter."""
        df = self.read()
        if self.use_iceberg:
            return df.filter(F.col("conv_id") == conv_id)
        bucket = self.spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(self.n_buckets)).cast("int")
        ).first()[0]
        return df.filter((F.col("bucket") == int(bucket)) & (F.col("conv_id") == conv_id))
