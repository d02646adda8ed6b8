"""Streaming SCD Type-2 dimension sync: a CDC update stream folded
into a versioned parquet dimension, one ``scd2_merge`` per micro-batch
(the foreachBatch MERGE pattern of incremental.py, applied to the
dimension-history operator instead of the PK upsert).

Semantics per batch: collapse to latest-per-key (two versions of a key
inside ONE batch are order-undefined otherwise), take the batch's max
event time as the effective timestamp, merge, atomically swap the
table (same two-rename crash protocol as operators/upsert.py — repair
on entry, tmp → aside → in).

Replay safety: a late-update guard drops any update not STRICTLY newer
(event time) than its key's current version before the merge — without
it, replaying historical batches against an already-advanced dimension
would re-apply old attribute values as fresh changes and resurrect old
versions (caught by the replay test). With it, checkpoint replays and
even full from-scratch re-drains are fixed points; and since effective
timestamps come from the surviving DATA (max event time), not the wall
clock, a replay can't move ``eff_from`` either.

Scale: per batch, cost is |current slice| + |batch| through one hash
join (broadcast when the batch is small) plus the table rewrite; a
partitioned variant would rewrite only current-partition files — at
100 TB keep the current slice in its own partition (``is_current``)
so history bytes are never rewritten, which is exactly how the merge
already treats them logically.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.scd import (
    latest_update_per_key,
    scd2_merge,
)


def run_scd2_sync(
    spark: SparkSession,
    updates_stream: DataFrame,
    dim_path: str,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available update batches into the versioned dimension
    at ``dim_path`` (AvailableNow), then stop.

    ``updates_stream`` columns: key_cols + tracked_cols + ``ts_col``
    (event time of each update).
    """
    tmp_path = dim_path.rstrip("/") + "__tmp_scd"
    old_path = dim_path.rstrip("/") + "__old_scd"
    ts_type = updates_stream.schema[ts_col].dataType

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        collapsed = latest_update_per_key(batch_df, key_cols, ts_col)

        # crash inside a previous swap parked the table aside: restore
        if not os.path.exists(dim_path) and os.path.exists(old_path):
            os.replace(old_path, dim_path)
        exists = os.path.exists(dim_path)
        if exists:
            dim = spark.read.parquet(dim_path)
            # LATE-UPDATE GUARD — and what makes full replays fixed
            # points: only updates strictly newer than the key's current
            # version apply. A replayed (or out-of-order) batch whose
            # event times don't advance past eff_from is ignored, so
            # re-draining history against an already-advanced dimension
            # can't resurrect old versions. A change at the same instant
            # as the current version is rejected too (two versions with
            # eff_from == eff_to would be an empty validity interval).
            cur = dim.filter(F.col("is_current")).select(
                *key_cols, F.col("eff_from").alias("__cur_from")
            )
            collapsed = (
                collapsed.join(cur, key_cols, "left")
                .filter(
                    F.col("__cur_from").isNull()
                    | (F.col(ts_col) > F.col("__cur_from"))
                )
                .drop("__cur_from")
            )
            if collapsed.isEmpty():
                return
        collapsed = collapsed.persist()
        try:
            # effective timestamp from the SURVIVING updates' event time
            batch_ts = collapsed.agg(F.max(ts_col)).first()[0]
            upd = collapsed.select(*key_cols, *tracked_cols)
            if not exists:
                dim = (
                    upd.withColumn("eff_from", F.lit(None).cast(ts_type))
                    .withColumn("eff_to", F.lit(None).cast(ts_type))
                    .withColumn("is_current", F.lit(True))
                    .limit(0)
                )
            merged = scd2_merge(
                dim,
                upd,
                key_cols=key_cols,
                tracked_cols=tracked_cols,
                batch_ts=F.lit(batch_ts).cast(ts_type),
            )
            merged.write.mode("overwrite").parquet(tmp_path)
        finally:
            collapsed.unpersist()
        if exists:
            os.replace(dim_path, old_path)
        os.replace(tmp_path, dim_path)
        shutil.rmtree(old_path, ignore_errors=True)

    q = (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
