"""Single-source-of-truth StructTypes for the launch domain.

The reference declares its schema twice — DDL (sql/init.sql:2-42) and
Pydantic models (src/models.py:13-26, 83-116) — and projects the API's
~30 fields down to 8 core fields at ingest (README.md:211-214). Here one
StructType per table drives readers, validation, and sinks.

Types follow SURVEY §1.3: UTC timestamps, 3-state nullable boolean for
``success``, a native ``array<string>`` for payload ids (the reference
round-trips JSON text through a JSONB column — unnecessary in Spark).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# mirrors raw_launches (reference sql/init.sql:2-13) + Launch model
# (src/models.py:6-80)
LAUNCHES_SCHEMA = StructType(
    [
        StructField("launch_id", StringType(), False),
        StructField("mission_name", StringType(), True),
        StructField("date_utc", TimestampType(), False),
        StructField("success", BooleanType(), True),  # true/false/NULL(unknown)
        StructField("payload_ids", ArrayType(StringType()), True),
        StructField("total_payload_mass_kg", DoubleType(), True),
        StructField("launchpad_id", StringType(), True),
        StructField("static_fire_date_utc", TimestampType(), True),
        StructField("ingested_at", TimestampType(), False),
    ]
)

# payload shape consumed by the enrichment join (reference src/api.py:198-201)
PAYLOADS_SCHEMA = StructType(
    [
        StructField("payload_id", StringType(), False),
        StructField("name", StringType(), True),
        StructField("mass_kg", DoubleType(), True),  # NULL/0/negative must be excluded
    ]
)

# insert-only watermark log (reference sql/init.sql:16-21)
INGESTION_STATE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("last_fetched_date", TimestampType(), True),
        StructField("updated_at", TimestampType(), False),
    ]
)

# snapshot-per-run aggregate time series (reference sql/init.sql:24-42,
# src/models.py:83-116)
LAUNCH_AGGREGATIONS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("total_launches", LongType(), False),
        StructField("total_successful_launches", LongType(), False),
        StructField("total_failed_launches", LongType(), False),
        StructField("success_rate", DoubleType(), True),  # NULL iff total==0
        StructField("earliest_launch_date", TimestampType(), True),
        StructField("latest_launch_date", TimestampType(), True),
        StructField("total_launch_sites", LongType(), True),
        StructField("average_payload_mass_kg", DoubleType(), True),
        StructField("average_delay_hours", DoubleType(), True),
        StructField("updated_at", TimestampType(), False),
        StructField("last_processed_launch_date", TimestampType(), True),
        StructField("snapshot_type", StringType(), True),  # initial|incremental|manual
        StructField("launches_added_in_batch", LongType(), True),
        StructField("pipeline_run_id", StringType(), True),
    ]
)
