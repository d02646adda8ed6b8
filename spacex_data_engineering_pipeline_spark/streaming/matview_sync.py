"""Streaming materialized-view maintenance: fold a CDC / append file
stream into a generational aggregate view (operators/matview.py), one
``apply_delta`` per micro-batch via ``foreachBatch``.

Exactly-once math on an at-least-once substrate: Spark's foreachBatch
contract is at-least-once per epoch (a crash after the side effect but
before the checkpoint commit replays the epoch). ``apply_delta``
records the epoch id inside the view's atomically-committed pointer,
so a replayed epoch is detected and skipped — the view never
double-counts, without any idempotent-overwrite requirement on the
aggregation itself (signed deltas are NOT idempotent, unlike the
append sinks in streaming/late_data.py).

Scale: per micro-batch cost is the matview contract —
O(|batch| + touched buckets), with untouched buckets hardlinked
forward. State lives entirely in the view files; the streaming query
itself is stateless (no watermark, no state store), so this composes
with any upstream shaping (sessionize, dedup, router) that already
handled event-time concerns.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spacex_data_engineering_pipeline_spark.operators.matview import apply_delta


def sync_matview_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    view_path: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
    checkpoint_dir: str,
    sign_col: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``source_path`` (parquet file stream) into the view at
    ``view_path`` with AvailableNow, one delta fold per micro-batch.
    The view must already exist (``create_matview`` — possibly from an
    empty base). Blocks until the drain completes."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def fold(batch_df, epoch_id: int) -> None:
        apply_delta(
            spark,
            view_path,
            batch_df,
            group_cols,
            measures,
            sign_col=sign_col,
            n_buckets=n_buckets,
            batch_id=int(epoch_id),
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
