"""Bloom-filter join pruning (operators/bloomjoin.py): zero false
negatives, real pruning, and exactness even when the filter is
undersized enough to produce false positives."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.bloomjoin import (
    bloom_contains,
    bloom_semi_join,
    build_bloom,
)


def _tables(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 1000).filter(F.col("id") % 17 == 0).select(
        F.col("id").alias("dk")
    )
    return fact, dim


def test_bloom_no_false_negatives_and_prunes(spark):
    fact, dim = _tables(spark)
    m, k = 1 << 14, 5
    bloom = build_bloom(dim, "dk", m, k)
    passed = fact.filter(bloom_contains(bloom, F.col("fk"), m, k))
    exact = fact.join(
        dim.withColumnRenamed("dk", "fk"), "fk", "left_semi"
    )
    n_pass, n_exact, n_total = passed.count(), exact.count(), fact.count()
    assert n_exact <= n_pass  # superset: no false negatives
    assert n_pass < n_total / 2  # actually prunes
    # every exact match passes the bloom
    missed = exact.join(passed.select("fk", "payload"), ["fk", "payload"], "left_anti")
    assert missed.count() == 0


def test_bloom_semi_join_exact_even_with_false_positives(spark):
    """An undersized filter (m=256 bits for ~59 keys × 2 hashes) HAS
    false positives — the verify join must still give the exact
    semi-join result."""
    fact, dim = _tables(spark)
    m, k = 256, 2
    bloom = build_bloom(dim, "dk", m, k)
    n_pass = fact.filter(bloom_contains(bloom, F.col("fk"), m, k)).count()
    exact = fact.join(dim.withColumnRenamed("dk", "fk"), "fk", "left_semi")
    assert n_pass > exact.count()  # FPs present at this sizing
    got = sorted(
        (r["fk"], r["payload"])
        for r in bloom_semi_join(fact, dim, "fk", "dk", m, k).collect()
    )
    want = sorted((r["fk"], r["payload"]) for r in exact.collect())
    assert got == want


def test_bloom_empty_word_array_fails_fast(spark):
    """An empty word list would render as split('', ',') = [NULL] and
    silently drop every row — the predicate must refuse it instead."""
    import pytest

    with pytest.raises(AssertionError, match="empty"):
        bloom_contains([], F.col("fk"), 1 << 10, 3)


def test_bloom_null_fact_keys_never_match(spark):
    fact = spark.createDataFrame(
        [(None, 1), (3, 2)], "fk long, payload long"
    )
    dim = spark.createDataFrame([(3,)], "dk long")
    out = bloom_semi_join(fact, dim, "fk", "dk", 1 << 10, 3).collect()
    assert [(r["fk"], r["payload"]) for r in out] == [(3, 2)]
