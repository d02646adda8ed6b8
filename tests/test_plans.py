"""Physical-plan regression tests: the 100 TB posture, asserted.

Correctness tests prove the right ANSWER; these prove the right PLAN —
filters reach the parquet scan, projections prune columns, small dims
broadcast, top-k never global-sorts, narrow map queries never shuffle,
and hot expressions stay inside whole-stage codegen. A regression here
is a silent 10-100× cost at scale long before it's a wrong answer.
"""

from __future__ import annotations

import re

import pytest

from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"  # plan shape is SF-independent


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_topk_plans_as_take_ordered(spark):
    plan = _plan(spark, "top_orders_by_price")
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"
    assert plan.count("Exchange") == 0, "top-k needs no shuffle"


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "top_orders_by_price")
    assert re.search(r"PushedFilters: \[.*IsNotNull\(o_totalprice\).*\]", plan), (
        "isNotNull filter must push to the parquet scan"
    )


def test_filtered_vector_search_prefilters_at_scan(spark):
    """Filtered vector search must PRE-filter: the label predicate
    reaches the parquet scan as a PushedFilter, so the cosine map only
    ever sees surviving rows — the composition argument for in-engine
    vector search (no post-filter backfill)."""
    plan = _plan(spark, "embedding_filtered_topk")
    assert re.search(r"PushedFilters: \[.*EqualTo\(label,", plan), (
        "label equality must push to the embeddings scan"
    )


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "perf_over_time")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"o_totalprice", "o_orderdate"}, (
        f"scan must read exactly the 2 needed columns, got {cols}"
    )


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "revenue_by_region")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "region and nation joins must broadcast, not shuffle"
    )
    assert "SortMergeJoin" not in plan


def test_narrow_map_query_has_no_shuffle(spark):
    plan = _plan(spark, "embedding_cosine_scores")
    assert plan.count("Exchange") == 0, "brute-force scoring is a map-only stage"


def test_no_quadratic_shingling_regression(spark):
    """Guard for the optimizer-inlining trap (functions/text.py): the
    fingerprint plan must evaluate split() exactly once per branch —
    re-inlining into per-element lambdas is the O(words²) regression.
    """
    plan = QUERIES["doc_fingerprints"](spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    n = plan.count("split(")
    assert n <= 1, (
        f"split() appears {n}x — optimizer re-inlined tokenization "
        "(per-element inlining is the O(words²) regression; per-copy "
        "inlining is an n× constant-factor one)"
    )


def test_aggregations_use_wholestage_codegen(spark):
    # AQE finalizes the plan only at execution; codegen'd operators then
    # carry the *(n) stage prefix in the plan string
    df = QUERIES["global_metrics"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan, "aggregate pipeline fell out of whole-stage codegen"


def test_enrichment_aggregates_before_join(spark):
    """J1 discipline: the child side must aggregate to one row per key
    BEFORE joining (shrinks join input from |lineitem| to |orders|)."""
    df = QUERIES["order_discount_enrichment"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = optimized.find("Join")
    agg_pos = optimized.find("Aggregate", join_pos)
    assert agg_pos > join_pos >= 0, (
        "partial aggregate must sit under the join, not above it"
    )


def test_q13_aggregates_fact_before_dim_join(spark):
    """Round-6 Q13 discipline: the per-customer order counts must be
    aggregated on the FACT side before the customer join (the shuffle
    then moves |custkeys| (key, count) pairs, not |orders| rows), and
    at test SF the narrow count table must broadcast."""
    df = QUERIES["customer_order_distribution"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = optimized.find("Join")
    agg_pos = optimized.find("Aggregate", join_pos)
    assert agg_pos > join_pos >= 0, (
        "orders must pre-aggregate on o_custkey under the join"
    )
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, (
        "narrow per-key count table should broadcast at test SF"
    )


def test_no_cartesian_or_nested_loop_anywhere(spark, sf_dir):
    """Catalog-wide hygiene sweep: NO query may plan a CartesianProduct
    or a (non-broadcast) NestedLoopJoin — the two shapes that silently
    turn into O(n²) at scale. Plans are built, not executed, so the
    sweep stays cheap and every future query is covered automatically."""
    from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = [m for m in ("CartesianProduct", "NestedLoopJoin") if m in plan]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_no_single_partition_exchange_over_data_anywhere(spark, sf_dir):
    """Catalog-wide version of the guard that caught round-2's NTILE
    class: every ``Exchange SinglePartition`` in every query's plan
    must sit above an aggregate (metadata-sized inputs — bucket totals,
    global metrics, count probes), never above raw data-bearing rows.
    A single-partition exchange over data rows is the one-reducer
    bottleneck that silently serializes at 100 TB. Covers every future
    query automatically."""
    from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES

    aggs = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
    offenders = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for chunk in plan.split("Exchange SinglePartition")[1:]:
            # the segment between the exchange and the next scan must
            # contain an aggregate — i.e. the exchange moves aggregate
            # rows, not table rows
            head = chunk.split("Scan parquet")[0]
            if not any(a in head for a in aggs):
                offenders.setdefault(name, []).append(head[:200])
    assert not offenders, offenders


def test_quartiles_have_no_single_reducer_data_window(spark):
    """order_price_quartiles must compute the global rank via the
    distributed prefix-sum primitive, not a global NTILE window: no
    ntile in the plan, the row_number window partitioned by the range
    bucket, and every SinglePartition exchange sitting above an
    aggregate (the O(buckets) totals), never above the raw orders scan."""
    plan = _plan(spark, "order_price_quartiles")
    assert "ntile" not in plan, "global NTILE window is a single-reducer sort"
    m = re.search(r"Window \[row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert m and "__b" in m.group(1), (
        f"row_number window must partition by the range bucket: {m and m.group(1)}"
    )
    for chunk in plan.split("Exchange SinglePartition")[1:]:
        assert "HashAggregate" in chunk.split("Scan parquet")[0], (
            "a SinglePartition exchange feeds raw data rows, not bucket totals"
        )


def test_stratified_sample_has_no_per_stratum_reducer(spark):
    """stratified_sample_documents must sub-bucket each language stratum:
    the row_number window partitions by (lang, __b), so one giant
    stratum spreads over all reducers instead of one."""
    plan = _plan(spark, "stratified_sample_documents")
    m = re.search(r"Window \[row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert m and "__b" in m.group(1) and "lang" in m.group(1), (
        f"per-stratum window must include the range sub-bucket: {m and m.group(1)}"
    )
    assert "Exchange SinglePartition" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning (enabled in get_spark): when a
    selectively-filtered dimension is TOO BIG to broadcast — the 100 TB
    regime — Catalyst injects a bloom filter built from the dim keys
    into the fact side, semi-reducing the big scan before the shuffle.
    Locally the dim always broadcasts (where the rule correctly skips
    the bloom), so the test recreates the at-scale regime by disabling
    broadcast and lowering the application-side size gate.
    """
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.catalog import load_table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), f"no runtime bloom filter injected:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
