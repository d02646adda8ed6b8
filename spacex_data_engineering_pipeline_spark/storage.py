"""Storage layout utilities — where the 100 TB battle is actually won.

Three layout levers, each mapping to a plan-level guarantee the test
suite asserts (tests/test_storage.py):

- ``write_partitioned``: hive-style directory partitioning → partition
  PRUNING: a filter on the partition column skips whole directories at
  file-listing time (plan shows ``PartitionFilters``), before any I/O.
- ``write_bucketed``: ``bucketBy`` on the join/agg key → co-located
  joins: two tables bucketed on the same key by the same bucket count
  join WITHOUT a shuffle (no Exchange under the SortMergeJoin).
- ``compact``: coalesce small files to a target partition count —
  100 TB tables die by a thousand 1 MB files (driver-side listing, task
  overhead), so sinks should compact on write.

The reference's analogue is Postgres B-tree indexes (sql/init.sql:45-48);
in a Spark lakehouse the index IS the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: queries filtering on
    ``partition_cols`` prune at file-listing time.

    Choose LOW-cardinality columns (date, region, event_type): every
    distinct value is a directory, and >~10k directories hurts listing
    more than pruning helps.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows are hash-distributed into
    ``num_buckets`` files by ``bucket_cols`` AT WRITE TIME, so every
    later join/aggregation on those keys starts pre-shuffled.

    Pick ``num_buckets`` ≈ cluster cores (or a multiple); both sides of
    a co-located join must agree on keys AND bucket count.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def compact(df: DataFrame, target_partitions: int) -> DataFrame:
    """Coalesce to ``target_partitions`` before a write — no shuffle,
    just fewer, larger output files."""
    return df.coalesce(target_partitions)


def table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
