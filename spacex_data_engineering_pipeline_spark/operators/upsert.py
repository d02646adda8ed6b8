"""Primary-key upsert over parquet (SURVEY S7).

The reference upserts with one multi-row ``INSERT ... ON CONFLICT
(launch_id) DO UPDATE`` transaction (src/database.py:133-202). Spark's
equivalent on plain parquet is read → unionByName → per-key top-1 window
dedup → atomic swap. With a transactional table format (Delta/Iceberg)
this whole module collapses to ``MERGE INTO``; the interface here is
format-agnostic so swapping the implementation doesn't touch callers.

Scale notes:
- the window partitions by the PK: one hash shuffle, AQE-skew-safe;
- the rewrite is full-table — correct-but-heavy, exactly why real
  deployments use MERGE-capable formats; for append-mostly workloads
  partition the table (e.g. by month(date_utc)) and rewrite only
  partitions containing upserted keys (dynamic partition overwrite).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_dedup(
    existing: DataFrame | None, incoming: DataFrame, key: str, order_by: list[Column]
) -> DataFrame:
    """union + per-key top-1: the relational core of the upsert.

    ``order_by`` decides the survivor (typically freshest ingested_at
    first → incoming rows replace matched existing rows, reference
    ON CONFLICT DO UPDATE semantics).
    """
    unioned = incoming if existing is None else existing.unionByName(incoming)
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str,
    order_by: list[Column],
) -> int:
    """Upsert ``incoming`` into the parquet table at ``table_path``;
    returns the number of NEW keys inserted (the reference reports this
    via count-before/after around the transaction, database.py:164-190).
    """
    exists = os.path.exists(table_path)
    existing = spark.read.parquet(table_path) if exists else None
    count_before = existing.count() if exists else 0

    merged = merge_dedup(existing, incoming, key, order_by)

    # Break lineage from the path we're about to replace: write to a
    # sibling tmp dir, then swap crash-safely — rename old ASIDE before
    # renaming new IN, so no instant exists where the table is gone and
    # a crash leaves either the old or the new table in place, never
    # neither. (On a real deployment: Delta MERGE, or saveAsTable +
    # dynamic partition overwrite.)
    tmp_path = table_path.rstrip("/") + "__tmp_upsert"
    old_path = table_path.rstrip("/") + "__old_upsert"
    merged.write.mode("overwrite").parquet(tmp_path)
    if exists:
        if os.path.exists(old_path):
            shutil.rmtree(old_path)
        os.replace(table_path, old_path)
    os.replace(tmp_path, table_path)
    if exists:
        shutil.rmtree(old_path)

    count_after = spark.read.parquet(table_path).count()
    return count_after - count_before
