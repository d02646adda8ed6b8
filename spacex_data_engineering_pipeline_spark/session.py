"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and broadcast demotion replace hand-tuned partition counts.
- Arrow on: any unavoidable Python boundary (pandas UDFs for MinHash /
  embeddings) moves columnar batches, not pickled rows.
- Session timezone pinned to UTC: the reference normalizes every timestamp
  to UTC (reference src/models.py:35-66); we do it once at the session level.
- shuffle.partitions defaults to cores locally; on a real cluster AQE
  coalesces from a high initial count, so this is a floor not a ceiling.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spacex-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-coalesce shuffles even under .persist(): cached
        # plans otherwise pin their partitioning at the session
        # default, which costs hundreds of near-empty reduce tasks in
        # iterative operators (see operators/dedup.py::connected_components)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # runtime bloom-filter join pruning: a selective filter on one
        # join side injects a bloom filter into the other side's scan
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Parquet scans: 128 MiB splits keep partitions memory-safe at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Timestamps in the test parquet are ns-precision; read as micros.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        # managed-table warehouse (bucketed tables) outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spacex_spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
