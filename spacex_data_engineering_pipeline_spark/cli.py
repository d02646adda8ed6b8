"""CLI entry points mirroring the reference's executables
(SURVEY §3.1 ``python src/ingest.py`` and §3.3
``python src/test_aggregations.py``):

    python -m spacex_data_engineering_pipeline_spark.cli ingest \
        --source-parquet raw_launches.parquet \
        --payloads-parquet payloads.parquet \
        --warehouse ./warehouse

    python -m spacex_data_engineering_pipeline_spark.cli aggregations \
        --warehouse ./warehouse [--limit 10]

The ingest command prints the same observability dict the reference's
pipeline returns (status, counts, early_exit, duration); aggregations
prints the latest snapshot, history, and trend deltas.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from spacex_data_engineering_pipeline_spark.session import get_spark


def _warehouse_paths(warehouse: str) -> dict[str, str]:
    return {
        "launches_path": os.path.join(warehouse, "raw_launches"),
        "state_path": os.path.join(warehouse, "ingestion_state"),
        "snapshots_path": os.path.join(warehouse, "launch_aggregations"),
    }


def cmd_ingest(args: argparse.Namespace) -> int:
    from spacex_data_engineering_pipeline_spark.pipeline.ingest import (
        IncrementalIngestionPipeline,
    )
    from spacex_data_engineering_pipeline_spark.sources.launches import LocalLaunchSource

    spark = get_spark(app_name="ingest-cli")
    spark.sparkContext.setLogLevel("ERROR")
    source = LocalLaunchSource.from_parquet(spark, args.source_parquet)
    payloads = spark.read.parquet(args.payloads_parquet)
    pipeline = IncrementalIngestionPipeline(
        spark, source, payloads,
        partition_by_year=args.partition_by_year,
        **_warehouse_paths(args.warehouse),
    )
    result = pipeline.run()
    print(json.dumps(result, default=str))
    return 0 if result["status"] == "success" else 1


def cmd_aggregations(args: argparse.Namespace) -> int:
    from spacex_data_engineering_pipeline_spark.plans.aggregations import (
        AggregationService,
    )

    spark = get_spark(app_name="aggregations-cli")
    spark.sparkContext.setLogLevel("ERROR")
    svc = AggregationService(spark, _warehouse_paths(args.warehouse)["snapshots_path"])
    latest = svc.latest()
    if latest is None:
        print(json.dumps({"error": "no snapshots yet"}))
        return 1
    print("latest:", json.dumps(latest, default=str))
    print("history:")
    for row in svc.history(args.limit).collect():
        print("  ", json.dumps(row.asDict(), default=str))
    print("trends:")
    for row in svc.trends().orderBy("id", ascending=False).limit(args.limit).collect():
        print("  ", json.dumps(row.asDict(), default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="spacex_data_engineering_pipeline_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_ing = sub.add_parser("ingest", help="run the incremental ingestion pipeline")
    p_ing.add_argument("--source-parquet", required=True,
                       help="parquet of raw launches (API-shaped, ISO date strings)")
    p_ing.add_argument("--payloads-parquet", required=True)
    p_ing.add_argument("--warehouse", required=True,
                       help="directory holding raw_launches / ingestion_state / launch_aggregations")
    p_ing.add_argument("--partition-by-year", action="store_true",
                       help="year-partitioned launches table: incremental runs "
                            "rewrite only the years the batch touches (scale layout)")
    p_ing.set_defaults(fn=cmd_ingest)

    p_agg = sub.add_parser("aggregations", help="inspect snapshots, history, trends")
    p_agg.add_argument("--warehouse", required=True)
    p_agg.add_argument("--limit", type=int, default=10)
    p_agg.set_defaults(fn=cmd_aggregations)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
