"""Bucketed & partitioned table layout (SURVEY §7 M6 100 TB notes).

Two storage-layout levers a 100 TB deployment uses that plain parquet
directories cannot express:

- **Hash bucketing** (``bucketBy``): both sides of a recurring equi-join
  written with the same bucket count/key join with NO exchange — the
  shuffle is paid once at write time, then every downstream join/agg on
  the bucket key is narrow. This is the durable form of the broadcast/
  repartition tradeoff: right for fact-fact joins where neither side
  broadcasts.
- **Directory partitioning** (``partitionBy``): low-cardinality columns
  (date, lang, category) become directories; a filter on them prunes
  whole files at planning time (PartitionFilters in the scan node).

Both verified by plan-shape tests (no Exchange on bucketed joins;
PartitionFilters present on partitioned scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "read_table", "write_partitioned"]


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets additionally removes the Sort from downstream
    sort-merge joins on the bucket key."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet for planning-time partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
