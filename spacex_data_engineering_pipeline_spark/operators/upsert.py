"""Primary-key upsert over parquet (SURVEY S7).

The reference upserts with one multi-row ``INSERT ... ON CONFLICT
(launch_id) DO UPDATE`` transaction (src/database.py:133-202). Spark's
equivalent on plain parquet is read → unionByName → per-key top-1 window
dedup → atomic swap. With a transactional table format (Delta/Iceberg)
this whole module collapses to ``MERGE INTO``; the interface here is
format-agnostic so swapping the implementation doesn't touch callers.

Scale notes:
- the window partitions by the PK: one hash shuffle, AQE-skew-safe;
- ``upsert_parquet`` rewrites the full table — correct-but-heavy; it
  exists as the layout-agnostic fallback and the tiny-table path;
- ``upsert_parquet_partitioned`` is the scale path: the table is
  partitioned on a time-derived column and an incremental batch
  rewrites ONLY the partitions it touches (dynamic partition
  overwrite). A 100 TB table with year partitions and a one-month
  incremental batch rewrites ~1 partition, not the table.
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
    tmp_path = table_path.rstrip("/") + "__tmp_upsert"
    old_path = table_path.rstrip("/") + "__old_upsert"
    # Crash recovery: a previous run that died inside the two-rename
    # window below leaves the table parked at __old_upsert with nothing
    # at table_path. Restore it FIRST — otherwise this run would treat
    # the upsert as an initial load and silently orphan every prior row.
    if not os.path.exists(table_path) and os.path.exists(old_path):
        os.replace(old_path, table_path)

    exists = os.path.exists(table_path)
    existing = spark.read.parquet(table_path) if exists else None
    if exists:
        # new-key count via anti-join probe, NOT count-before/count-after
        # full-table scans: one batch-sized job instead of two table-sized
        # ones (the table invariant — one row per key — makes them equal)
        inserted = (
            incoming.select(key).distinct().join(existing, key, "left_anti").count()
        )
    else:
        inserted = incoming.select(key).distinct().count()

    merged = merge_dedup(existing, incoming, key, order_by)

    # Break lineage from the path we're about to replace: write to a
    # sibling tmp dir, then swap — rename old ASIDE, rename new IN.
    # Between those two renames there IS an instant with no table at
    # table_path; a crash there is repaired by the recovery above, so
    # some complete table (old or new) is always reachable. (On a real
    # deployment: Delta MERGE, or saveAsTable + dynamic partition
    # overwrite.)
    merged.write.mode("overwrite").parquet(tmp_path)
    if exists:
        if os.path.exists(old_path):
            shutil.rmtree(old_path)
        os.replace(table_path, old_path)
    os.replace(tmp_path, table_path)
    if exists:
        shutil.rmtree(old_path)
    return inserted


def upsert_parquet_partitioned(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str,
    order_by: list[Column],
    partition_col: str,
) -> int:
    """Upsert into a parquet table partitioned on ``partition_col``
    (a NON-NULL column of ``incoming``, e.g. ``year(date_utc)``),
    rewriting only affected partitions; returns new keys inserted.

    Affected = partitions receiving incoming rows ∪ partitions whose
    existing rows match an incoming key. The second set catches a key
    whose partition value CHANGED in the update (reference ON CONFLICT
    DO UPDATE replaces in place; here the old partition must also be
    rewritten or the stale row would survive as a duplicate).

    Scale: the affected-partition list is collected to the driver — by
    construction it is small (time-partitioned tables, incremental
    batches span few periods) and the ``isin`` filter partition-prunes
    the existing-side scan, so the merge reads only what it rewrites.

    Crash-safety: dynamic partition overwrite commits per partition —
    a crash mid-write can leave a subset of affected partitions updated
    (each partition is itself replaced atomically). Cross-partition
    atomicity needs a transactional format (Delta/Iceberg MERGE);
    callers for whom that matters use ``upsert_parquet``'s whole-table
    swap instead.
    """
    exists = os.path.exists(table_path)
    if not exists:
        # cluster rows by partition value before the write so each
        # partition directory gets ONE file per holding task, not one
        # per shuffle partition (32 tasks × P years = P·32 tiny files —
        # every later read pays the listing + footer cost). At cluster
        # scale add a second spread key (e.g. bucket(pk)) to keep write
        # parallelism within a huge partition.
        merge_dedup(None, incoming, key, order_by).repartition(
            F.col(partition_col)
        ).write.partitionBy(partition_col).mode("overwrite").parquet(table_path)
        return spark.read.parquet(table_path).count()

    existing = spark.read.parquet(table_path)

    # Two batch-bounded probe jobs replace the old four (count-before,
    # affected-partition collect, count-after ×2 table scans):
    # one over incoming (cached upstream) for its partitions + distinct
    # keys, one semi-join over existing for matched partitions + matched
    # keys. inserted = incoming keys − matched keys (table invariant:
    # one row per key), so no post-write table count is ever needed.
    inc_keys = incoming.select(key).distinct()
    inc_row = incoming.agg(
        F.collect_set(partition_col).alias("parts"),
        F.countDistinct(key).alias("n_keys"),
    ).first()
    ex_row = (
        existing.join(inc_keys, key, "left_semi")
        .agg(
            F.collect_set(partition_col).alias("parts"),
            F.countDistinct(key).alias("n_matched"),
        )
        .first()
    )
    inserted = int(inc_row["n_keys"]) - int(ex_row["n_matched"] or 0)
    affected = sorted(set(inc_row["parts"]) | set(ex_row["parts"] or []))

    existing_affected = existing.filter(F.col(partition_col).isin(affected))
    # eager checkpoint: breaks lineage from table_path so the dynamic
    # overwrite below isn't a read-from/write-to-same-path plan (which
    # Spark rejects), and pins the merge result before any file moves.
    merged = merge_dedup(existing_affected, incoming, key, order_by).localCheckpoint()
    survivors = {r[0] for r in merged.select(partition_col).distinct().collect()}

    merged.repartition(F.col(partition_col)).write.partitionBy(partition_col).option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").parquet(table_path)

    # A partition whose every row moved away ends with zero surviving
    # rows; dynamic overwrite never touches it (nothing was written
    # there), so drop its directory or the stale rows survive.
    for part in set(affected) - survivors:
        shutil.rmtree(os.path.join(table_path, f"{partition_col}={part}"), ignore_errors=True)
    return inserted
