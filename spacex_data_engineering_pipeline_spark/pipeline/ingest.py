"""Incremental ingestion pipeline (SURVEY §3.1): the reference's
template-method loop (src/ingest.py:32-128) with every data step a
DataFrame job and every sink an idempotent parquet write.

Steps (reference line refs in parens):
1. initial-vs-incremental branch (ingest.py:130-146)
2. change detection via latest-probe compare (ingest.py:211-233,
   database.py:225-271) → early exit
3. watermark read + incremental fetch (ingest.py:235-264), full-fetch
   fallback on source error (ingest.py:266-312)
4. validate + conform (ingest.py:314-357) + payload enrichment
   (api.py:253-283)
5. PK upsert (database.py:133-202)
6. watermark append (database.py:204-223)
7. aggregation snapshot append (aggregations.py:24-94)

Idempotency: re-running with already-seen data upserts the same keys
(no duplicates) and records a 0-insert snapshot — the reference's
replay-safety contract (README.md:216-219).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.upsert import (
    upsert_parquet,
    upsert_parquet_partitioned,
)
from spacex_data_engineering_pipeline_spark.plans.aggregations import (
    AggregationService,
    new_run_id,
)
from spacex_data_engineering_pipeline_spark.schemas import INGESTION_STATE_SCHEMA
from spacex_data_engineering_pipeline_spark.sources.launches import (
    LaunchSource,
    enrich_with_payload_mass,
    validate_and_conform,
)

EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)  # reference database.py:84


class IncrementalIngestionPipeline:
    def __init__(
        self,
        spark: SparkSession,
        source: LaunchSource,
        payloads: DataFrame,
        launches_path: str,
        state_path: str,
        snapshots_path: str,
        partition_by_year: bool = True,
    ):
        """``partition_by_year=True`` (the default — it is the scale
        layout): the launches table is partitioned on ``launch_year =
        year(date_utc)`` and an incremental batch rewrites only the
        years it touches instead of the whole table (see
        ``upsert_parquet_partitioned``). Readers are unaffected — the
        partition column surfaces as one extra table column and time
        filters partition-prune the scan. ``False`` falls back to the
        layout-agnostic whole-table swap (tiny tables, or when
        cross-partition write atomicity matters more than write cost).
        """
        self.spark = spark
        self.source = source
        self.payloads = payloads
        self.launches_path = launches_path
        self.state_path = state_path
        self.partition_by_year = partition_by_year
        self.aggregations = AggregationService(spark, snapshots_path)

    # -- state -------------------------------------------------------------

    def _table_exists(self) -> bool:
        return os.path.exists(self.launches_path)

    def launches(self) -> DataFrame:
        return self.spark.read.parquet(self.launches_path)

    def _read_state(self) -> tuple[datetime, int]:
        """One scan of the insert-only state log yields BOTH the current
        watermark (max-by-updated_at row) and the max id the next append
        will increment — run() needs both, so reading them separately
        would double the state jobs per run (reference database.py:64-87).
        """
        if not os.path.exists(self.state_path):
            return EPOCH, 0
        row = (
            self.spark.read.parquet(self.state_path)
            .agg(
                # struct max = lexicographic (updated_at, id) → the
                # freshest row's watermark; max(id) stays independent in
                # case appends ever raced a skewed clock
                F.max(
                    F.struct("updated_at", "id", "last_fetched_date")
                ).alias("top"),
                F.max("id").alias("max_id"),
            )
            .first()
        )
        if row is None or row["top"] is None:
            return EPOCH, 0
        return row["top"]["last_fetched_date"], int(row["max_id"])

    def last_fetched_date(self) -> datetime:
        """Current watermark; epoch default when empty."""
        return self._read_state()[0]

    def _append_watermark(self, wm: datetime, prev_id: int | None = None) -> None:
        if prev_id is None:
            prev_id = self._read_state()[1]
        df = self.spark.createDataFrame(
            [
                {
                    "id": prev_id + 1,
                    "last_fetched_date": wm,
                    "updated_at": datetime.now(timezone.utc),
                }
            ],
            INGESTION_STATE_SCHEMA,
        )
        df.write.mode("append").parquet(self.state_path)

    # -- change detection ----------------------------------------------------

    def _is_new_data_available(self) -> bool:
        """Latest-probe compare (reference database.py:225-271): new iff
        source latest is strictly later, or same timestamp with a
        different id. On any detection error, assume new data
        (reference ingest.py:228-233 fail-open).
        """
        try:
            api_row = self.source.fetch_latest().collect()
            if not api_row:
                return False
            api_latest = api_row[0]
            db_row = (
                self.launches()
                .orderBy(F.col("date_utc").desc(), F.col("launch_id").desc())
                .limit(1)
                .collect()
            )
            if not db_row:
                return True
            db_latest = db_row[0]
            api_date = _as_utc(api_latest["date_utc"])
            db_date = _as_utc(db_latest["date_utc"])
            if api_date > db_date:
                return True
            return api_date == db_date and api_latest["launch_id"] != db_latest["launch_id"]
        except Exception:
            return True

    # -- run -----------------------------------------------------------------

    def run(self) -> dict:
        t0 = time.perf_counter()
        run_id = new_run_id()
        initial = not self._table_exists()

        if not initial and not self._is_new_data_available():
            return {
                "status": "success",
                "early_exit": True,
                "snapshot_type": None,
                "new_launches": 0,
                "rejected_rows": 0,
                "inserted": 0,
                "pipeline_run_id": run_id,
                "duration_s": round(time.perf_counter() - t0, 3),
            }

        # one state scan per run: watermark for the fetch window + the
        # id the watermark append will increment
        wm, state_max_id = self._read_state()
        if initial:
            raw = self.source.fetch_all()
            snapshot_type = "initial"
        else:
            try:
                # materialize inside the try: a lazy source defers read
                # failures to action time, which would otherwise bypass
                # this fallback entirely
                raw = self.source.fetch_after(wm)
                raw = raw.localCheckpoint()
            except Exception:
                # fallback: full fetch + client-side filter (ST5,
                # reference ingest.py:266-312)
                raw = self.source.fetch_all().filter(
                    F.try_to_timestamp("date_utc") > F.lit(wm)
                )
            snapshot_type = "incremental"

        valid, stats = validate_and_conform(raw)
        # persist + count VALID itself, NOT localCheckpoint and NOT the
        # enriched join: the count is a SQL action with the observe node
        # directly beneath it, so ONE job scans raw once, fills the
        # validation observation (reject count + batch-max watermark are
        # accumulators riding it), and pins the batch — with its single
        # frozen ingested_at — in cache for every later consumer. The
        # enrichment join executes only inside the upsert's write, from
        # the cached blocks. (localCheckpoint materializes at the RDD
        # layer, which bypasses SQL observations; counting above the
        # join lets AQE's empty-relation propagation prune the metrics
        # node when the batch is all-rejects.)
        valid = valid.persist()
        try:
            # enrichment is row-preserving (left join on launch_id), so
            # the valid count IS the new-launches count
            n_new = valid.count()
            rejected = stats.rejected

            # Watermark candidate from the FETCHED batch (valid or not):
            # a batch that is 100% rejects must still advance the
            # watermark, else the same poisoned rows are refetched on
            # every run.
            batch_max = stats.batch_max_date

            if n_new == 0 and not initial:
                if rejected > 0 and batch_max is not None:
                    self._append_watermark(_as_utc(batch_max), state_max_id)
                return {
                    "status": "success",
                    "early_exit": True,
                    "snapshot_type": None,
                    "new_launches": 0,
                    "rejected_rows": rejected,
                    "inserted": 0,
                    "pipeline_run_id": run_id,
                    "duration_s": round(time.perf_counter() - t0, 3),
                }

            enriched = enrich_with_payload_mass(valid, self.payloads)
            if self.partition_by_year:
                inserted = upsert_parquet_partitioned(
                    self.spark,
                    self.launches_path,
                    enriched.withColumn("launch_year", F.year("date_utc")),
                    key="launch_id",
                    order_by=[F.col("ingested_at").desc()],
                    partition_col="launch_year",
                )
            else:
                inserted = upsert_parquet(
                    self.spark,
                    self.launches_path,
                    enriched,
                    key="launch_id",
                    order_by=[F.col("ingested_at").desc()],
                )
            if batch_max is not None:
                self._append_watermark(_as_utc(batch_max), state_max_id)
            self.aggregations.append_snapshot(
                self.launches(),
                snapshot_type=snapshot_type,
                launches_added_in_batch=inserted,
                run_id=run_id,
            )
            return {
                "status": "success",
                "early_exit": False,
                "snapshot_type": snapshot_type,
                "new_launches": n_new,
                "rejected_rows": rejected,
                "inserted": inserted,
                "pipeline_run_id": run_id,
                "duration_s": round(time.perf_counter() - t0, 3),
            }
        finally:
            valid.unpersist(blocking=False)


def _as_utc(dt) -> datetime:
    if isinstance(dt, str):
        return datetime.fromisoformat(dt.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt
