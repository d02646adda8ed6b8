"""Bucketed table layout: pre-shuffled storage for co-located joins.

A join between two large fact tables shuffles BOTH sides on the key —
at 100 TB that shuffle dominates the job. Bucketing pays that shuffle
once at write time: ``bucketBy(n, key)`` hash-partitions rows into a
fixed number of buckets per table, recorded in the catalog, and any
later equi-join (or aggregation) on the bucket key between tables with
compatible bucket counts reads bucket-aligned splits — Catalyst drops
the Exchange on both sides entirely (asserted in
tests/test_operators.py::test_bucketed_join_has_no_shuffle).

``sortBy`` inside buckets additionally lets the sort-merge join skip
its per-task sort. This is Spark's native answer to the reference's
"co-located lookup" patterns — the layout is declared once, every
downstream query benefits, nothing is hand-scheduled.

Bucketed tables must go through the session catalog (``saveAsTable`` —
bucket metadata lives there, plain ``.parquet(path)`` writes lose it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table in the session catalog. ``path`` makes it an external table
    (data at ``path``, metadata in the catalog).

    Pick ``n_buckets`` so one bucket ≈ one healthy task input
    (128-512 MB); both sides of a co-located join need equal bucket
    counts on the join key.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join two cataloged tables on their shared bucket key. When
    both were written with ``write_bucketed`` on ``on`` with equal
    bucket counts, the plan contains NO Exchange — each task joins
    bucket i against bucket i straight off storage.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
