"""The reference's four analytics queries (sql/analytics/*.sql),
dual-surface: each exists as a DataFrame builder AND as a Spark SQL
string over registered views — same results, two API styles, both
optimized by Catalyst into the same plan.

Hour-interval semantics: the reference itself disagrees — Trino
``date_diff('hour', ...)`` truncates to whole hours (analytics surface)
while Postgres ``EXTRACT(EPOCH ...)/3600`` keeps fractions (aggregation
service, src/aggregations.py:333) — SURVEY §2.8 F2/F3. We pin: analytics
queries truncate (F2), the aggregation service keeps fractions (F3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.functions.datetime import (
    whole_hours_between,
)

WHOLE_HOURS = "CAST(FLOOR((unix_timestamp(date_utc) - unix_timestamp(static_fire_date_utc)) / 3600) AS BIGINT)"


def top_payload_masses(launches: DataFrame, k: int = 5) -> DataFrame:
    """Top-k heaviest launches (reference top_payload_masses.sql:3-17).

    A launch_id tiebreak is added: the reference's own golden output has
    a 3-way mass tie (top_payload_masses.sql:23-25), so without it the
    result set is nondeterministic.
    """
    return (
        launches.filter(F.col("total_payload_mass_kg").isNotNull())
        .select(
            "launch_id",
            "mission_name",
            "date_utc",
            "total_payload_mass_kg",
            "success",
            "launchpad_id",
        )
        .orderBy(F.col("total_payload_mass_kg").desc(), F.col("launch_id").asc())
        .limit(k)
    )


def launch_site_utilization(launches: DataFrame) -> DataFrame:
    """Per-site launch count + avg payload (launch_site_utilization.sql:3-14)."""
    return (
        launches.filter(F.col("launchpad_id").isNotNull())
        .groupBy(F.col("launchpad_id").alias("launch_site"))
        .agg(
            F.count(F.lit(1)).alias("total_launches"),
            F.round(F.avg("total_payload_mass_kg"), 2).alias("average_payload_mass_kg"),
        )
        .orderBy(F.col("total_launches").desc(), F.col("launch_site").asc())
    )


def launch_performance_over_time(aggregations: DataFrame) -> DataFrame:
    """Per-year avg success_rate over SNAPSHOT rows
    (launch_performance_over_time.sql:3-21).

    Deliberately averages the snapshot time series, not raw launches —
    the "avg of avgs" is the reference's actual semantics (SURVEY §7
    risk register).
    """
    return (
        aggregations.filter(F.col("success_rate").isNotNull())
        .groupBy(F.year("updated_at").cast("long").alias("year"))
        .agg(F.round(F.avg("success_rate"), 2).alias("avg_success_rate"))
        .orderBy("year")
    )


def time_between_static_fire_and_launch(launches: DataFrame) -> DataFrame:
    """Per-launch-year count/avg/max of the static-fire→launch delay in
    truncated whole hours (time_between_engine_test_and_actual_launch.sql:3-35),
    theta-filtered to sane rows (static fire before launch).
    """
    delay = whole_hours_between(F.col("static_fire_date_utc"), F.col("date_utc"))
    return (
        launches.filter(
            F.col("static_fire_date_utc").isNotNull()
            & F.col("date_utc").isNotNull()
            & (F.col("static_fire_date_utc") <= F.col("date_utc"))
        )
        .groupBy(F.year("date_utc").cast("long").alias("launch_year"))
        .agg(
            F.count(F.lit(1)).alias("launches_with_static_fire"),
            F.round(F.avg(delay), 2).alias("avg_delay_hours"),
            F.max(delay).alias("max_delay_hours"),
        )
        .orderBy("launch_year")
    )


# --- SQL surface: same queries as text, run with spark.sql() against
# views named `launches` / `launch_aggregations` -------------------------

SQL_QUERIES: dict[str, str] = {
    "top_payload_masses": """
        SELECT launch_id, mission_name, date_utc, total_payload_mass_kg,
               success, launchpad_id
        FROM launches
        WHERE total_payload_mass_kg IS NOT NULL
        ORDER BY total_payload_mass_kg DESC, launch_id ASC
        LIMIT 5
    """,
    "launch_site_utilization": """
        SELECT launchpad_id AS launch_site,
               COUNT(*) AS total_launches,
               ROUND(AVG(total_payload_mass_kg), 2) AS average_payload_mass_kg
        FROM launches
        WHERE launchpad_id IS NOT NULL
        GROUP BY launchpad_id
        ORDER BY total_launches DESC, launch_site ASC
    """,
    "launch_performance_over_time": """
        SELECT CAST(YEAR(updated_at) AS BIGINT) AS year,
               ROUND(AVG(success_rate), 2) AS avg_success_rate
        FROM launch_aggregations
        WHERE success_rate IS NOT NULL
        GROUP BY YEAR(updated_at)
        ORDER BY year
    """,
    "time_between_engine_test_and_actual_launch": f"""
        SELECT CAST(YEAR(date_utc) AS BIGINT) AS launch_year,
               COUNT(*) AS launches_with_static_fire,
               ROUND(AVG({WHOLE_HOURS}), 2) AS avg_delay_hours,
               MAX({WHOLE_HOURS}) AS max_delay_hours
        FROM launches
        WHERE static_fire_date_utc IS NOT NULL
          AND date_utc IS NOT NULL
          AND static_fire_date_utc <= date_utc
        GROUP BY YEAR(date_utc)
        ORDER BY launch_year
    """,
}
