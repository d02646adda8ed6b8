"""Exactly-once MULTI-TABLE streaming sink: each micro-batch appends
to a fact table AND refreshes its companion summary table in ONE
atomic commit (operators/txn.py shared pointer + epoch ledger).

This is the streaming form of the reference's one-transaction
contract (raw rows + state row committed together, reference
src/database.py:133-223): a reader at ANY instant sees a fact table
and a summary that agree — never a fact batch whose aggregate hasn't
landed, never an aggregate counting unpublished rows. foreachBatch is
at-least-once per epoch; the txn pointer's ``last_batch_id`` ledger
makes replayed epochs no-ops, so a checkpoint-wiped full re-drain is
a fixed point (same contract as streaming/matview_sync.py, extended
from one table to a consistent table GROUP).

Scale: the fact append hardlinks the previous generation forward
(O(batch) bytes + O(#files) metadata); the summary builder receives
the post-append fact DataFrame — pass an incremental builder (e.g. a
matview fold) when the summary itself is too big to recompute; the
atomic-visibility contract is unchanged either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spacex_data_engineering_pipeline_spark.operators import txn


def sync_tables_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    fact_name: str,
    summaries: dict[str, Callable[[DataFrame], DataFrame]],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``source_path`` (parquet file stream) with AvailableNow:
    per micro-batch, append the batch to ``fact_name`` and rebuild
    every summary in ``summaries`` (name → builder over the
    post-append fact), all published by one pointer flip keyed on the
    epoch id. Blocks until the drain completes."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        ptr = txn.read_pointer(root)
        last = ptr.get("last_batch_id")
        if last is not None and epoch_id <= last:
            return  # replayed epoch: already committed atomically
        if fact_name in ptr["tables"]:
            prev_fact = txn.read_table(spark, root, fact_name, pointer=ptr)
            new_fact = prev_fact.unionByName(batch_df)
        else:
            new_fact = batch_df
        replaces = {
            name: build(new_fact) for name, build in summaries.items()
        }
        txn.commit_tables(
            root,
            tables=replaces,
            appends={fact_name: batch_df},
            batch_id=epoch_id,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
