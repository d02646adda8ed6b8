"""Salting operators: results must equal the unsalted equivalents, and
the salt must actually spread a hot key across groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators import skew


def _skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    hot = [(i, "hot", float(i % 7)) for i in range(9000)]
    tail = [(10_000 + i, f"k{i % 50}", float(i % 11)) for i in range(1000)]
    return spark.createDataFrame(hot + tail, ["row_id", "key", "value"])


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r.key: (r.total, r.n, r.mx)
        for r in df.groupBy("key")
        .agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.key: (r.total, r.n, r.mx)
        for r in skew.salted_aggregate(
            df,
            ["key"],
            "row_id",
            {"total": ("value", "sum"), "n": ("value", "count"), "mx": ("value", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = skew.with_salt(_skewed_df(spark), "row_id", 8)
    per_salt = (
        df.filter(F.col("key") == "hot").groupBy("__salt").count().collect()
    )
    assert len(per_salt) == 8, "hot key must spread across all salts"
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 9000 * 0.25, f"salting too uneven: {counts}"


def test_salted_join_matches_plain(spark):
    facts = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT DIM")] + [(f"k{i}", f"D{i}") for i in range(50)],
        ["dkey", "label"],
    )
    plain = sorted(
        map(
            tuple,
            facts.join(dim, facts.key == dim.dkey)
            .select("row_id", "label")
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            skew.salted_join(facts, dim, "key", "dkey", "row_id", n_salts=8)
            .select("row_id", "label")
            .collect(),
        )
    )
    assert salted == plain


def test_hot_key_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.operators.skew import (
        hot_key_salted_join,
    )

    # one hot key (0: 5000 rows), many cold keys, and NULL join keys —
    # which must survive a 'left' join (cold path) exactly like the
    # plain join keeps them with NULL dim columns
    facts = spark.range(6000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 5000, 0)
        .when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 37) + 1)
        .alias("k"),
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(40)], ["dk", "attr"]
    )
    for how in ("inner", "left"):
        got = hot_key_salted_join(
            facts, dim, "k", "dk", "row_id", n_salts=8,
            hot_threshold=1000, how=how,
        )
        want = facts.join(dim, facts["k"] == dim["dk"], how)
        g = {tuple(r) for r in got.select("row_id", "k", "attr").collect()}
        w = {tuple(r) for r in want.select("row_id", "k", "attr").collect()}
        assert g == w
        if how == "left":
            assert len(g) == 6000  # NULL-key rows kept with NULL attr


def test_hot_key_salted_join_no_hot_keys_degenerates_to_plain(spark):
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.operators.skew import (
        hot_key_salted_join,
    )

    facts = spark.range(100).select(
        F.col("id").alias("row_id"), (F.col("id") % 10).alias("k")
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], ["dk", "attr"])
    got = hot_key_salted_join(
        facts, dim, "k", "dk", "row_id", hot_threshold=1000
    )
    assert got.count() == 100


def test_hot_key_salted_join_adaptive_threshold(spark):
    """hot_threshold=None derives the cutoff from the MEAN per-key
    count (× hot_factor): on a uniform corpus with one whale key, the
    detector must pick exactly the whale (salted route) while the
    uniform majority takes the plain join — and the union must equal
    the plain join row-for-row. A fixed absolute cutoff can't do this
    at every scale: 10× the uniform data crossed it for EVERY key."""
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.operators.skew import (
        hot_key_salted_join,
    )

    uniform = spark.range(200).select(
        F.col("id").alias("row_id"), (F.col("id") % 20).alias("k")
    )
    whale = spark.range(200, 500).select(
        F.col("id").alias("row_id"), F.lit(7).alias("k")
    )
    facts = uniform.unionByName(whale)
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(20)], ["dk", "attr"])
    got = hot_key_salted_join(
        facts, dim, "k", "dk", "row_id",
        n_salts=4, hot_threshold=None, hot_factor=2.0,
    )
    want = facts.join(dim, facts["k"] == dim["dk"], "inner")
    g = {tuple(r) for r in got.select("row_id", "k", "attr").collect()}
    w = {tuple(r) for r in want.select("row_id", "k", "attr").collect()}
    assert g == w and len(g) == 500
