"""Storage-layout tests: each layout lever must deliver its plan-level
guarantee — pruning in PartitionFilters, bucketed joins without
exchanges, compaction to the target file count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark import storage
from spacex_data_engineering_pipeline_spark.catalog import load_table


def test_partition_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    storage.write_partitioned(events, path, ["event_date"])

    pruned = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "filter on the partition column must prune directories"

    expected = events.filter(F.col("event_date") == "2024-01-05").count()
    assert pruned.count() == expected > 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    storage.write_bucketed(orders, "orders_bkt", ["o_orderkey"], num_buckets=8)
    storage.write_bucketed(lineitem, "lineitem_bkt", ["l_orderkey"], num_buckets=8)

    joined = storage.table(spark, "orders_bkt").join(
        storage.table(spark, "lineitem_bkt"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located join: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed-by-key tables must join without a shuffle"
    )
    assert joined.count() == lineitem.count()

    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_compact_controls_file_count(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").repartition(16)
    path = str(tmp_path / "orders_compact")
    storage.compact(orders, 2).write.parquet(path)
    files = [
        f
        for f in __import__("os").listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) == 2
