"""Driver-checked query catalog: every SURVEY §2 operator re-expressed
over the synthetic test tables, each paired with a DuckDB oracle SQL.

Conventions (hash-parity with the oracle):
- Every computed/aggregate column is aliased identically in the
  DataFrame builder and in the oracle SQL.
- Floating aggregates are ``round(x, 2)`` on both sides so summation
  order can't flip the hash.
- Whole-hour intervals are ``floor(epoch_delta / 3600)`` cast to BIGINT
  on both sides (the reference's Trino ``date_diff('hour', ...)``
  truncates — reference sql/analytics/time_between_engine_test_and_actual_launch.sql:12).
- ``year(ts)`` is cast to BIGINT (DuckDB EXTRACT returns BIGINT).
- Top-k queries carry a unique-key tiebreak so ties are deterministic
  (the reference's golden top-5 has a 3-way tie — top_payload_masses.sql:23-25).

Scale notes are per-query docstrings; the common rules:
- single-pass global aggregates (one job, map-side partial agg);
- joins on big tables go through AQE (skew split, broadcast demotion);
- small dims are explicitly ``broadcast()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _hours_between(start_col: str, end_col: str):
    """Whole elapsed hours between two timestamps, truncated toward zero.

    Parity with Trino's date_diff('hour', a, b) used by the reference
    (time_between_engine_test_and_actual_launch.sql:12,18) — truncation,
    not boundary counting, hence floor(epoch/3600) on both engines.
    """
    return F.floor(
        (F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))) / 3600
    )


# ---------------------------------------------------------------------------
# §2.6 T1 — top-k by measure  (reference sql/analytics/top_payload_masses.sql:3-17)
# ---------------------------------------------------------------------------


@_register(
    "top_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice IS NOT NULL
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 5
    """,
)
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 rows by measure with a unique-key tiebreak.

    Scale: Spark plans TakeOrderedAndProject — per-partition top-5 heaps,
    then a 5-row driver merge. No global sort, no shuffle of the table.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# §2.6 T2 / §2.1 S2 — top-1 by timestamp (latest-row probe)
# (reference src/database.py:99-104, src/api.py:17-46)
# ---------------------------------------------------------------------------


@_register(
    "latest_event",
    oracle="""
    SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
    FROM events
    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
    LIMIT 1
    """,
)
def latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-detection probe: single most-recent row, id tiebreak.

    Scale: TakeOrderedAndProject with k=1; at 100 TB this is a metadata-
    cheap scan (with min/max file stats it prunes to recent files).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "event_type", "ts")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
    )


# ---------------------------------------------------------------------------
# §2.4 A8 — group-by key: count + rounded avg
# (reference sql/analytics/launch_site_utilization.sql:3-14)
# ---------------------------------------------------------------------------


@_register(
    "site_utilization",
    oracle="""
    SELECT o_orderpriority AS site,
           COUNT(*) AS total_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_order_price
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY o_orderpriority
    """,
)
def site_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key utilization: COUNT(*) + ROUND(AVG(x),2) per group.

    Scale: hash aggregation with map-side partial agg; low-cardinality
    keys mean the shuffle moves only |groups|×|partitions| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isNotNull())
        .groupBy(F.col("o_orderpriority").alias("site"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_order_price"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 A6 — group-by year + rounded avg
# (reference sql/analytics/launch_performance_over_time.sql:3-21)
# ---------------------------------------------------------------------------


@_register(
    "perf_over_time",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
           ROUND(AVG(o_totalprice), 2) AS avg_total_price
    FROM orders
    WHERE o_totalprice IS NOT NULL
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def perf_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year trend: EXTRACT(YEAR) + ROUND(AVG,2)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice").isNotNull())
        .groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(F.round(F.avg("o_totalprice"), 2).alias("avg_total_price"))
    )


# ---------------------------------------------------------------------------
# §2.4 A7 + §2.8 F2 + §2.2 P4 — per-year count/avg/max of a derived
# whole-hour interval, theta-filtered
# (reference sql/analytics/time_between_engine_test_and_actual_launch.sql:3-35)
# ---------------------------------------------------------------------------


@_register(
    "ship_delay_by_year",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           COUNT(*) AS lines_shipped,
           ROUND(AVG(CAST(FLOOR((EPOCH(l_shipdate) - EPOCH(o_orderdate)) / 3600) AS BIGINT)), 2)
               AS avg_delay_hours,
           MAX(CAST(FLOOR((EPOCH(l_shipdate) - EPOCH(o_orderdate)) / 3600) AS BIGINT))
               AS max_delay_hours
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate IS NOT NULL
      AND o_orderdate IS NOT NULL
      AND o_orderdate <= l_shipdate
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def ship_delay_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delay-by-year over a fact-fact equi-join with a theta sanity filter.

    The interval uses truncated whole hours (Trino date_diff semantics,
    reference F2) — floor(epoch_delta/3600) as BIGINT on both engines.

    Scale: both sides shuffle on the join key (sort-merge at 100 TB);
    AQE handles skewed order keys. The theta predicate is applied
    post-join (it references both sides); null filters push to scans.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    delay = _hours_between("o_orderdate", "l_shipdate").cast("long")
    return (
        lineitem.filter(F.col("l_shipdate").isNotNull())
        .join(
            orders.filter(F.col("o_orderdate").isNotNull()),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("o_orderdate") <= F.col("l_shipdate"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("lines_shipped"),
            F.round(F.avg(delay), 2).alias("avg_delay_hours"),
            F.max(delay).alias("max_delay_hours"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 A1/A3/A4 + §2.2 P6 — global multi-metric single-pass aggregate
# (reference src/aggregations.py:310-366)
# ---------------------------------------------------------------------------


@_register(
    "global_metrics",
    oracle="""
    SELECT COUNT(*) AS total_orders,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled_orders,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
           CAST(MIN(o_orderdate) AS DATE) AS earliest_order_date,
           CAST(MAX(o_orderdate) AS DATE) AS latest_order_date,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           ROUND(AVG(CASE WHEN o_totalprice > 0 THEN o_totalprice END), 2) AS avg_order_price,
           ROUND(AVG(CASE WHEN o_totalprice > 200000 THEN o_totalprice END), 2) AS avg_large_order_price
    FROM orders
    """,
)
def global_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 8-metric one-pass snapshot aggregate (A1):
    COUNT(*), two conditional counts (3-valued bucketing — NULL/other
    status lands in neither, reference aggregations.py:324-325), MIN/MAX,
    COUNT(DISTINCT), and two conditional averages.

    Scale: one hash-agg pass; COUNT(DISTINCT) expands to a two-stage
    plan automatically. ``count(when(...))`` keeps NULLs out of both
    buckets (never ``sum(cast)``).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("fulfilled_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("open_orders"),
        F.min("o_orderdate").cast("date").alias("earliest_order_date"),
        F.max("o_orderdate").cast("date").alias("latest_order_date"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.round(F.avg(F.when(F.col("o_totalprice") > 0, F.col("o_totalprice"))), 2).alias(
            "avg_order_price"
        ),
        F.round(
            F.avg(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice"))), 2
        ).alias("avg_large_order_price"),
    )


# ---------------------------------------------------------------------------
# §2.4 A5 — derived ratio metric (success rate)
# (reference src/models.py:112-116, src/aggregations.py:345-350)
# ---------------------------------------------------------------------------


@_register(
    "fulfillment_rate",
    oracle="""
    SELECT ROUND(100.0 * COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                 / NULLIF(COUNT(*), 0), 2) AS fulfilled_rate
    FROM orders
    """,
)
def fulfillment_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round(100*successful/total, 2), NULL when total is 0."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.round(
            100.0
            * F.count(F.when(F.col("o_orderstatus") == "F", 1))
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            2,
        ).alias("fulfilled_rate")
    )


# ---------------------------------------------------------------------------
# §2.3 J1 — enrichment join: parent → children → guarded aggregate total
# (reference src/api.py:253-283, src/ingest.py:335-346)
# ---------------------------------------------------------------------------


@_register(
    "order_discount_enrichment",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           CAST(CASE WHEN t > 0 THEN ROUND(t, 2) END AS DOUBLE) AS total_discount_value
    FROM (
        SELECT o_orderkey, o_totalprice,
               SUM(CASE WHEN l_discount > 0
                        THEN CAST(l_extendedprice * l_discount AS DECIMAL(18,6)) END) AS t
        FROM orders
        LEFT JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_totalprice
    )
    """,
)
def order_discount_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment-join with the reference's exact NULL chain (J1):
    per-child values <= 0 are excluded (api.py:273-275), parents with no
    qualifying children get NULL not 0, and a computed total <= 0 is
    also NULL (ingest.py:341-346).

    Scale: aggregate the child side FIRST (one row per key), then join —
    the join input shrinks from |lineitem| to |orders| rows, and the
    partial agg happens map-side before the shuffle.

    Hash-parity: the summand has exactly 4 decimal digits, so per-key
    sums frequently land exactly on a .005 rounding boundary — double
    summation order then flips the cent between engines. Accumulate in
    DECIMAL(18,6) (exact, order-independent) and cast the rounded
    result to DOUBLE on both sides.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = (
        lineitem.filter(F.col("l_discount") > 0)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
            ).alias("t")
        )
    )
    return (
        orders.join(per_order, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("t") > 0, F.round(F.col("t"), 2))
            .cast("double")
            .alias("total_discount_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 A3 — distinct count  (reference src/aggregations.py:368-381)
# ---------------------------------------------------------------------------


@_register(
    "distinct_suppliers",
    oracle="""
    SELECT COUNT(DISTINCT l_suppkey) AS distinct_suppliers
    FROM lineitem
    WHERE l_suppkey IS NOT NULL
    """,
)
def distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) with the reference's NOT NULL guard.

    Scale: exact distinct shuffles the key set; the engine also exposes
    ``approx_count_distinct`` (see operators.aggregates) for the 100 TB
    path where a 1-2% HLL error is acceptable.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_suppkey").isNotNull()).agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers")
    )


# ---------------------------------------------------------------------------
# §2.4 A4 + §2.2 P5 — filtered average  (reference src/aggregations.py:383-397)
# ---------------------------------------------------------------------------


@_register(
    "filtered_avg_quantity",
    oracle="""
    SELECT ROUND(AVG(CASE WHEN l_quantity > 0 THEN l_quantity END), 2) AS avg_quantity
    FROM lineitem
    """,
)
def filtered_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG over a conditional gate (NULL and <=0 excluded)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.round(F.avg(F.when(F.col("l_quantity") > 0, F.col("l_quantity"))), 2).alias(
            "avg_quantity"
        )
    )


# ---------------------------------------------------------------------------
# §2.5 — window: top-1-per-key (latest row per key)
# (reference upsert-dedup shape, src/database.py:133-202; SURVEY §2.5)
# ---------------------------------------------------------------------------


@_register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key latest row via row_number window — the engine's dedup/
    upsert primitive (reference resolves this with ON CONFLICT DO UPDATE).

    Scale: one shuffle on the partition key; AQE splits skewed users.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# §2.11 north-star — exact dedup over documents
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact_documents",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
        FROM documents
    )
    WHERE rn = 1
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup keeping the lowest doc_id per identical text.

    Scale: at 100 TB, partition by a 64/128-bit text hash instead of the
    raw text so the shuffle moves fixed-width keys (see operators.dedup
    ``exact_dedup`` which hashes first); semantics identical because
    collisions are re-checked within groups.
    """
    documents = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy(F.col("doc_id").asc())
    return (
        documents.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
